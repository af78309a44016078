"""Pipeline option coverage: negative prompts, guidance, output types, sizes."""

import numpy as np
import pytest

from daam_tpu import set_seed
from daam_tpu.pipeline.sd import StableDiffusionPipeline


@pytest.fixture(scope='module')
def pipe():
    return StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')


def test_negative_prompt_changes_output(pipe):
    a = pipe('a dog', num_inference_steps=2, generator=set_seed(0))
    b = pipe('a dog', negative_prompt='blurry, low quality',
             num_inference_steps=2, generator=set_seed(0))
    assert not np.array_equal(np.array(a.images[0]), np.array(b.images[0]))


def test_guidance_scale_changes_output(pipe):
    a = pipe('a dog', num_inference_steps=2, generator=set_seed(0),
             guidance_scale=1.0)
    b = pipe('a dog', num_inference_steps=2, generator=set_seed(0),
             guidance_scale=12.0)
    assert not np.array_equal(np.array(a.images[0]), np.array(b.images[0]))


def test_output_type_np(pipe):
    out = pipe('a dog', num_inference_steps=1, generator=set_seed(0),
               output_type='np')
    arr = out.images[0]
    assert isinstance(arr, np.ndarray)
    assert arr.shape == (16, 16, 3)
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_custom_height_width(pipe):
    out = pipe('a dog', num_inference_steps=1, generator=set_seed(0),
               height=32, width=32)
    assert out.images[0].size == (32, 32)


def test_same_seed_reproducible(pipe):
    a = pipe('a dog', num_inference_steps=2, generator=set_seed(5))
    b = pipe('a dog', num_inference_steps=2, generator=set_seed(5))
    np.testing.assert_array_equal(np.array(a.images[0]), np.array(b.images[0]))


def test_different_seed_differs(pipe):
    a = pipe('a dog', num_inference_steps=2, generator=set_seed(1))
    b = pipe('a dog', num_inference_steps=2, generator=set_seed(2))
    assert not np.array_equal(np.array(a.images[0]), np.array(b.images[0]))


def test_safety_checker_slot_blacks_out_and_flags():
    """Reference pipelines run a safety checker and DAAM records the checked
    image (daam/trace.py:156-169); ours is a pluggable slot with the same
    blackout semantics."""
    import numpy as np
    from daam_tpu import trace
    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.experiment import GenerationExperiment

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    calls = {}

    def checker(images_u8, prompts):
        calls['n'] = len(images_u8)
        calls['prompts'] = prompts
        assert all(im.dtype == np.uint8 for im in images_u8)
        return [True] * len(images_u8)

    pipe.safety_checker = checker
    with trace(pipe) as tc:
        out = pipe('a dog', num_inference_steps=1)
        exp = tc.to_experiment('.', seed=0)
    assert out.nsfw_content_detected == [True]
    assert np.asarray(out.images[0]).sum() == 0  # blacked out
    assert exp.nsfw()  # trace saw the post-checker image
    assert calls['n'] == 1 and calls['prompts'] == ['a dog']

    pipe.safety_checker = None
    out = pipe('a dog', num_inference_steps=1)
    assert out.nsfw_content_detected is None


def test_callback_steps_live_per_step_callback():
    """callback_steps opts into live per-step callbacks during sampling with
    the real intermediate latents (reference contract daam/trace.py:61-62)."""
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    seen = []

    def cb(i, t, latents):
        assert latents is not None
        seen.append(i)

    pipe(['a dog'], num_inference_steps=5, callback=cb, callback_steps=2)
    assert seen == [0, 1, 2, 3, 4]


def test_callback_without_steps_still_counts():
    from daam_tpu import trace
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    with trace(pipe) as tc:
        pipe('a dog', num_inference_steps=3, callback=tc.time_callback)
    assert tc.time_idx == 3
