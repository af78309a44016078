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
