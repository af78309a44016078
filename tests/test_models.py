import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daam_tpu.models.configs import get_pipeline_config, MODEL_PRESETS
from daam_tpu.models.clip import CLIPTextEncoder
from daam_tpu.models.unet import (UNet2DConditionModel, cross_attention_layout,
                                  timestep_embedding)
from daam_tpu.models.vae import AutoencoderKL
from daam_tpu.models import weights as W


@pytest.fixture(scope='module')
def tiny():
    return get_pipeline_config('tiny')


@pytest.fixture(scope='module')
def tiny_params(tiny):
    return W.init_random_params(tiny, seed=0)


def test_presets_exist():
    for name in ('v1', 'v2-base', 'v2-large', 'v2-1-base', 'v2-1-large',
                 'xl-base-1.0', 'tiny', 'tiny-xl'):
        assert name in MODEL_PRESETS


def test_sd21_layout_matches_reference_topology():
    cfg = get_pipeline_config('v2-1-base')
    layout = cross_attention_layout(cfg.unet)
    # SD2: 9 up + 6 down + 1 mid = 16 cross-attn layers
    assert len(layout) == 16
    assert [x.position for x in layout][:9] == ['up'] * 9
    assert [x.position for x in layout][9:15] == ['down'] * 6
    assert layout[-1].position == 'mid'
    # up blocks enumerate deepest level first (model order)
    assert [x.level for x in layout[:9]] == [2, 2, 2, 1, 1, 1, 0, 0, 0]
    # per-level head counts (SD2: 5/10/20)
    by_level = {x.level: x.heads for x in layout}
    assert by_level == {0: 5, 1: 10, 2: 20, 3: 20}


def test_sdxl_layout():
    cfg = get_pipeline_config('xl-base-1.0')
    layout = cross_attention_layout(cfg.unet)
    ups = [x for x in layout if x.position == 'up']
    downs = [x for x in layout if x.position == 'down']
    mids = [x for x in layout if x.position == 'mid']
    # levels 1 (depth 2) and 2 (depth 10): up 3 attn/level, down 2 attn/level
    assert len(ups) == 3 * 10 + 3 * 2
    assert len(downs) == 2 * 10 + 2 * 2
    assert len(mids) == 10


def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.array([0.0, 500.0]), 32)
    assert emb.shape == (2, 32)
    assert np.abs(np.asarray(emb)).max() <= 1.0 + 1e-6


def test_clip_text_encoder_shapes(tiny, tiny_params):
    enc = CLIPTextEncoder(tiny.text)
    ids = jnp.zeros((2, 77), dtype=jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407)
    out, pooled = enc.apply({'params': tiny_params['text_encoder']}, ids)
    assert out.shape == (2, 77, tiny.text.hidden_size)
    assert pooled.shape == (2, tiny.text.hidden_size)
    pen, _ = enc.apply({'params': tiny_params['text_encoder']}, ids,
                       penultimate=True)
    assert pen.shape == out.shape
    assert not np.allclose(np.asarray(pen), np.asarray(out))


def test_unet_forward_and_capture(tiny, tiny_params):
    unet = UNet2DConditionModel(tiny.unet)
    B = 2
    x = jnp.ones((B, 8, 8, 4)) * 0.1
    t = jnp.full((B,), 10)
    ctx = jnp.ones((B, 77, tiny.unet.cross_attention_dim)) * 0.2
    eps, probs = unet.apply({'params': tiny_params['unet']}, x, t, ctx)
    assert eps.shape == (B, 8, 8, 4)
    assert probs == {}

    eps2, probs = unet.apply({'params': tiny_params['unet']}, x, t, ctx,
                             capture=True)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), rtol=2e-5, atol=2e-5)
    names = {info.name for info in cross_attention_layout(tiny.unet)}
    assert set(probs) == names
    for name, p in probs.items():
        assert p.shape[0] == B and p.shape[-1] == 77
        # softmax rows sum to 1
        np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-4, atol=1e-4)


def test_unet_replay_changes_output(tiny, tiny_params):
    unet = UNet2DConditionModel(tiny.unet)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), dtype=jnp.float32)
    t = jnp.full((1,), 10)
    ctx = jnp.asarray(rng.randn(1, 77, tiny.unet.cross_attention_dim),
                      dtype=jnp.float32)
    _, probs = unet.apply({'params': tiny_params['unet']}, x, t, ctx, capture=True)
    name = next(iter(probs))
    # Replay uniform attention instead -> output must change.
    uniform = jnp.ones_like(probs[name]) / 77.0
    eps_replay, probs2 = unet.apply({'params': tiny_params['unet']}, x, t, ctx,
                                    capture=True, replay={name: uniform})
    eps_orig, _ = unet.apply({'params': tiny_params['unet']}, x, t, ctx)
    assert not np.allclose(np.asarray(eps_replay), np.asarray(eps_orig))
    np.testing.assert_allclose(np.asarray(probs2[name]), np.asarray(uniform),
                               rtol=1e-6)


def test_vae_roundtrip_shapes(tiny, tiny_params):
    vae = AutoencoderKL(tiny.vae)
    z = jnp.ones((1, 8, 8, 4)) * 0.3
    img = vae.apply({'params': tiny_params['vae']}, z, method=AutoencoderKL.decode)
    assert img.shape == (1, 16, 16, 3)  # scale factor 2 for tiny


def test_vae_encoder(tiny):
    vae = AutoencoderKL(tiny.vae)
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    variables = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    post = vae.apply(variables, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 8, 8, 4)
    sample = post.sample(jax.random.PRNGKey(2))
    assert sample.shape == (1, 8, 8, 4)


def test_sdxl_tiny_init():
    cfg = get_pipeline_config('tiny-xl')
    params = W.init_random_params(cfg, seed=0)
    assert 'text_encoder_2' in params
    unet = UNet2DConditionModel(cfg.unet)
    added = {'text_embeds': jnp.zeros((2, 64)), 'time_ids': jnp.zeros((2, 6))}
    eps, _ = unet.apply({'params': params['unet']}, jnp.zeros((2, 8, 8, 4)),
                        jnp.zeros((2,)), jnp.zeros((2, 77, 96)),
                        added_cond=added)
    assert eps.shape == (2, 8, 8, 4)
