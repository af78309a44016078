"""End-to-end pipeline + trace tests on the tiny fixture (CPU, random weights).

The analog of the reference's missing integration tests (SURVEY.md §4): a tiny
randomly-initialized model exercises capture/aggregation shapes and factor
arithmetic without any weights.
"""

import numpy as np
import pytest

import daam_tpu
from daam_tpu import set_seed, trace
from daam_tpu.pipeline.sd import StableDiffusionPipeline
from daam_tpu.pipeline.sdxl import StableDiffusionXLPipeline


@pytest.fixture(scope='module')
def pipe():
    return StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')


@pytest.fixture(scope='module')
def traced_result(pipe):
    """One traced generation shared by the read-only assertions below."""
    with trace(pipe) as tc:
        out = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0),
                   callback=tc.time_callback)
        hm = tc.compute_global_heat_map()
    return pipe, tc, out, hm


def test_untraced_generation(pipe):
    out = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
    assert len(out.images) == 1
    assert out.images[0].size == (16, 16)


def test_traced_generation_basics(traced_result):
    pipe, tc, out, hm = traced_result
    assert tc.time_idx == 2
    assert tc.last_prompt == 'a dog runs'
    assert tc.last_image is out.images[0]
    assert len(tc.layer_names) == 3  # tiny: 2 up + 1 down


def test_global_heat_map_shape_and_truncation(traced_result):
    pipe, tc, out, hm = traced_result
    # 3 tokens + SOS + 1 pad = 5; grid 96 (image 16 not in {512,1024})
    assert np.asarray(hm.heat_maps).shape == (5, 96, 96)


def test_word_heat_map_query(traced_result):
    _, tc, out, hm = traced_result
    whm = hm.compute_word_heat_map('dog')
    assert np.asarray(whm.value).shape == (96, 96)
    assert np.isfinite(np.asarray(whm.value)).all()
    with pytest.raises(ValueError):
        hm.compute_word_heat_map('cat')


def test_normalized_heat_map_sums_to_one(traced_result):
    _, tc, _, _ = traced_result
    hm = tc.compute_global_heat_map(normalize=True)
    sums = np.asarray(hm.heat_maps)[1:-1].sum(0)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)


def test_heat_maps_cleared_between_generations(pipe):
    with trace(pipe) as tc:
        pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
        first = np.asarray(tc.compute_global_heat_map().heat_maps).copy()
        pipe('a cat sits', num_inference_steps=2, generator=set_seed(1))
        assert tc.last_prompt == 'a cat sits'
        hm2 = tc.compute_global_heat_map()
        whm = hm2.compute_word_heat_map('cat')
        assert np.isfinite(np.asarray(whm.value)).all()


def test_trace_unhook_restores_untraced(pipe):
    with trace(pipe) as tc:
        assert pipe._active_trace is tc
    assert pipe._active_trace is None
    out = pipe('a dog runs', num_inference_steps=1, generator=set_seed(0))
    assert len(out.images) == 1


def test_double_hook_raises(pipe):
    with trace(pipe):
        with pytest.raises(RuntimeError):
            trace(pipe).hook()


def test_compute_without_trace_raises(pipe):
    tc = trace(pipe)  # not hooked, no generation
    with pytest.raises(RuntimeError, match='No heat maps'):
        tc.compute_global_heat_map()


def test_layer_and_head_filters(traced_result):
    _, tc, _, _ = traced_result
    hm_l0 = tc.compute_global_heat_map(layer_idx=0)
    hm_h1 = tc.compute_global_heat_map(head_idx=1)
    full = tc.compute_global_heat_map()
    assert not np.allclose(np.asarray(hm_l0.heat_maps), np.asarray(full.heat_maps))
    assert not np.allclose(np.asarray(hm_h1.heat_maps), np.asarray(full.heat_maps))
    with pytest.raises(RuntimeError):
        tc.compute_global_heat_map(layer_idx=99)


def test_batched_prompts_per_sample_maps(pipe):
    """Batching is supported (deliberate lift of the reference's restriction,
    reference daam/trace.py:172-173)."""
    with trace(pipe) as tc:
        out = pipe(['a dog runs', 'a cat sits'], num_inference_steps=2,
                   generator=set_seed(0))
        assert len(out.images) == 2
        hm0 = tc.compute_global_heat_map(batch_idx=0)
        hm1 = tc.compute_global_heat_map(batch_idx=1)
        assert hm0.prompt == 'a dog runs'
        assert hm1.prompt == 'a cat sits'
        assert not np.allclose(np.asarray(hm0.heat_maps)[:4],
                               np.asarray(hm1.heat_maps)[:4])


def test_save_load_heads_transplant(pipe):
    """The attention-transplant counterfactual (demo mechanism,
    reference daam/run/demo.py:102-114)."""
    with trace(pipe, save_heads=True) as tc:
        out1 = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
    with trace(pipe, load_heads=True) as tc2:
        out2 = pipe('a cat runs', num_inference_steps=2, generator=set_seed(0))
    img1 = np.array(out1.images[0]).astype(np.float32)
    img2 = np.array(out2.images[0]).astype(np.float32)
    # Generate 'a cat runs' fresh (same seed, no replay): should differ from
    # the transplanted version.
    out3 = pipe('a cat runs', num_inference_steps=2, generator=set_seed(0))
    img3 = np.array(out3.images[0]).astype(np.float32)
    assert not np.allclose(img2, img3)


def test_replay_reproduces_same_prompt(pipe):
    """Replaying a prompt's own attention must reproduce its image exactly."""
    with trace(pipe, save_heads=True) as tc:
        out1 = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
    with trace(pipe, load_heads=True) as tc2:
        out2 = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
    np.testing.assert_allclose(np.array(out1.images[0]).astype(np.float32),
                               np.array(out2.images[0]).astype(np.float32),
                               atol=2.0)


def test_to_experiment_roundtrip(pipe, tmp_path):
    with trace(pipe) as tc:
        pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
        exp = tc.to_experiment(tmp_path, seed=0, id='t')
        exp.save()
    assert (tmp_path / 't' / 'generation.pt').exists()
    assert (tmp_path / 't' / 'output.png').exists()
    loaded = daam_tpu.GenerationExperiment.load(tmp_path / 't')
    assert loaded.prompt == 'a dog runs'


def test_low_memory_restricts_layers(pipe):
    with trace(pipe, low_memory=True) as tc:
        pipe('a dog runs', num_inference_steps=1, generator=set_seed(0))
        # restrict={0}: one layer per cross-attn block group (tiny: up + down)
        assert len(tc._located) == 2
        hm = tc.compute_global_heat_map()
        assert np.asarray(hm.heat_maps).shape == (5, 96, 96)


def test_sdxl_tiny_pipeline_traced():
    pipe = StableDiffusionXLPipeline.from_pretrained('tiny-xl', scheduler='ddim')
    with trace(pipe) as tc:
        out = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
        hm = tc.compute_global_heat_map()
        assert np.asarray(hm.heat_maps).shape == (5, 96, 96)
    assert out.images[0].size == (16, 16)


def test_v1_tiny_pipeline_traced():
    """SD 1.x geometry (conv proj_in/out, per-level head dims) traced
    end-to-end — covers the use_linear_projection=False UNet path."""
    pipe = StableDiffusionPipeline.from_pretrained('tiny-v1', scheduler='ddim')
    with trace(pipe) as tc:
        out = pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
        hm = tc.compute_global_heat_map()
        maps = np.asarray(hm.heat_maps)
        assert maps.shape == (5, 96, 96)
        assert np.isfinite(maps).all()
    assert np.isfinite(np.array(out.images[0], dtype=np.float32)).all()


def test_scheduler_variants_run(pipe):
    from daam_tpu.pipeline.schedulers import get_scheduler
    for name in ('pndm', 'euler', 'dpm++'):
        p = StableDiffusionPipeline(pipe.config, pipe.params,
                                    tokenizer=pipe.tokenizer, scheduler=name)
        out = p('a dog runs', num_inference_steps=3, generator=set_seed(0))
        assert np.isfinite(np.array(out.images[0], dtype=np.float32)).all()


def test_traced_generation_odd_heads_packed_matches_jnp():
    """SD2.1's odd head count at real attention geometry (5 heads × 64 dim):
    the packed ghost-head path must produce the same heat maps as the
    head-major jnp path through the full traced pipeline — exercises the
    padded accumulator allocation (pipeline _acc_heads) and the ghost-row
    slice in finalize_acc."""
    from dataclasses import replace
    from daam_tpu.models import weights as W
    from daam_tpu.models.configs import UNetConfig, get_pipeline_config
    from daam_tpu.ops import attention as A

    base = get_pipeline_config('tiny')
    cfg = replace(base, name='tiny-odd', unet=UNetConfig(
        sample_size=8, block_out_channels=(320, 320),
        down_block_types=('cross', 'plain'),
        up_block_types=('cross', 'plain'),
        layers_per_block=1, attention_head_dim=(5, 5),
        transformer_layers_per_block=(1, 1),
        cross_attention_dim=32, norm_num_groups=32))
    params = W.init_random_params(cfg, seed=3)

    def run():
        pipe = StableDiffusionPipeline(cfg, params, scheduler='ddim')
        with trace(pipe) as tc:
            pipe('a dog chases a ball', num_inference_steps=2,
                 generator=set_seed(12))
            return np.asarray(tc.compute_global_heat_map().heat_maps)

    mode = A.get_kernel_mode()
    odd = A.get_odd_packed()
    A.set_odd_packed(True)  # opt-in since the negative probe (ROADMAP r5)
    try:
        A.set_kernel_mode('jnp')
        maps_jnp = run()
        A.set_kernel_mode('pallas')
        maps_pallas = run()
    finally:
        A.set_kernel_mode(mode)
        A.set_odd_packed(odd)

    assert maps_pallas.shape == maps_jnp.shape
    assert np.isfinite(maps_pallas).all()
    np.testing.assert_allclose(maps_pallas, maps_jnp, rtol=1e-2, atol=1e-3)


def test_traced_generation_pallas_mode_matches_jnp():
    """The production kernel path (set_kernel_mode('pallas') -> interpret mode
    on CPU): traced heat maps from the in-kernel accumulation must match the
    jnp capture path (VERDICT r1: the TPU path must be covered by CI)."""
    from daam_tpu.ops import attention as A

    def run():
        pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
        with trace(pipe) as tc:
            pipe('a dog chases a ball', num_inference_steps=2,
                 generator=set_seed(11))
            gm = tc.compute_global_heat_map()
            return np.asarray(gm.heat_maps)

    mode = A.get_kernel_mode()
    try:
        A.set_kernel_mode('jnp')
        maps_jnp = run()
        A.set_kernel_mode('pallas')
        maps_pallas = run()
    finally:
        A.set_kernel_mode(mode)

    assert maps_pallas.shape == maps_jnp.shape
    assert np.isfinite(maps_pallas).all()
    np.testing.assert_allclose(maps_pallas, maps_jnp, rtol=1e-2, atol=1e-3)
