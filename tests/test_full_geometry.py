"""Checkpoint-conversion parity at REAL model geometry (VERDICT r2 #1a).

Round-2 proved the converters numerically on tiny configs only.  These tests
fabricate diffusers-format checkpoints at the *real* channel geometry of the
reference's model registry (``daam/run/generate.py:23-30``) — SD 2.1-base
(320/640/1280/1280, 23-layer OpenCLIP-H) and SDXL base 1.0 (dual encoder,
2048-dim context, depth-(2,10) transformers, ``add_embedding``) — and assert
forward parity between the converted Flax modules and torch modules
implementing the diffusers math with the same weights.

Spatial size does not enter the weight mapping, so CI runs the UNet parity on
16x16 latents to bound runtime on this 1-core host; setting
``DAAM_FULL_SPATIAL=1`` additionally runs the real latent grids (64**2 for
SD2.1, 128**2 for SDXL) plus a traced pipeline step — exercised by
``scripts/full_geometry_parity.sh`` and recorded in ROADMAP.md.

The torch models build on the meta device and adopt the fabricated arrays
via ``load_state_dict(assign=True)`` (a second 3.5/10 GB init is pure waste).
"""

import gc
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from daam_tpu.models.clip import CLIPTextEncoder  # noqa: E402
from daam_tpu.models.configs import get_pipeline_config  # noqa: E402
from daam_tpu.models.unet import UNet2DConditionModel  # noqa: E402
from daam_tpu.models.vae import AutoencoderKL  # noqa: E402
from daam_tpu.models.weights import (_convert_clip, _convert_unet,  # noqa: E402
                                     _convert_vae)

from test_weights_conversion import (_TTinyUNet, _TTinyVAEDecoder,  # noqa: E402
                                     _fabricate_unet_checkpoint,
                                     fast_normal_fill)

FULL_SPATIAL = os.environ.get('DAAM_FULL_SPATIAL') == '1'
# The heaviest fabrications (SDXL 2.6B UNet, OpenCLIP-H/bigG) cost tens of
# minutes on this 1-core host even at 16x16 spatial; they run via
# scripts/full_geometry_parity.sh.  Default CI keeps real-geometry coverage
# through the SD2.1 UNet capture-parity, CLIP-L, and VAE tests below.
FULL_GEOMETRY = FULL_SPATIAL or os.environ.get('DAAM_FULL_GEOMETRY') == '1'


def _build_torch_unet(cfg, sd):
    """Torch diffusers-math UNet adopting the fabricated tensors in place."""
    with torch.device('meta'):
        tmodel = _TTinyUNet(cfg)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True, assign=True)
    return tmodel.eval()


def _sdxl_added(cfg, rng, batch):
    pooled_dim = cfg.projection_class_embeddings_input_dim - \
        6 * cfg.addition_time_embed_dim
    return {
        'text_embeds': rng.standard_normal((batch, pooled_dim),
                                           dtype=np.float32),
        'time_ids': np.tile(
            np.array([1024, 1024, 0, 0, 1024, 1024], np.float32), (batch, 1)),
    }


def _unet_parity(preset, spatial, with_capture=False):
    cfg = get_pipeline_config(preset).unet
    sd = _fabricate_unet_checkpoint(cfg)
    tmodel = _build_torch_unet(cfg, sd)

    rng = np.random.default_rng(42)
    sample = rng.standard_normal((2, spatial, spatial, cfg.in_channels),
                                 dtype=np.float32)
    ctx = rng.standard_normal((2, 77, cfg.cross_attention_dim),
                              dtype=np.float32)
    t = np.array([500, 10], dtype=np.int32)
    added_np = _sdxl_added(cfg, rng, 2) if cfg.addition_embed_type else None

    store = []
    if with_capture:
        from test_e2e_fidelity_torch import _install_capture
        _install_capture(tmodel, store)

    with torch.no_grad():
        args = (torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                torch.from_numpy(t.astype(np.float32)),
                torch.from_numpy(ctx))
        if added_np is None:
            theirs = tmodel(*args)
        else:
            theirs = tmodel(*args, added={k: torch.from_numpy(v)
                                          for k, v in added_np.items()})
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    # the torch model shares the fabricated numpy buffers (from_numpy +
    # assign=True): drop it first, then convert consuming sd so peak RSS
    # stays ~1x the checkpoint (2x trips memory ballooning on this host)
    del tmodel
    gc.collect()
    params = _convert_unet(sd, cfg, consume=True)
    del sd
    gc.collect()

    unet = UNet2DConditionModel(cfg)
    added_j = ({k: jnp.asarray(v) for k, v in added_np.items()}
               if added_np else None)
    ours, probs = unet.apply({'params': params}, jnp.asarray(sample),
                             jnp.asarray(t), jnp.asarray(ctx),
                             added_cond=added_j, capture=with_capture)
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=5e-4, atol=5e-4)
    return cfg, store, probs


@pytest.mark.skipif(not FULL_GEOMETRY,
                    reason='2.6B fabrication: set DAAM_FULL_GEOMETRY=1 '
                           '(scripts/full_geometry_parity.sh)')
def test_unet_full_channel_geometry_parity_sdxl():
    """Converted Flax UNet == torch at the real SDXL channel geometry
    (2.6B params; dual-context 2048-dim, depth-(2,10) transformers,
    ``add_embedding`` text_time conditioning).  Reduced 16x16 spatial input
    (weight mapping is spatial-independent; the full grids run under
    DAAM_FULL_SPATIAL).  SD2.1 is covered by the capture-parity test below,
    which also asserts the eps output."""
    _unet_parity('xl-base-1.0', spatial=16)
    gc.collect()


def _torch_layer_to_ours(torch_name, cfg):
    """Map 'up_blocks.1.attentions.0.transformer_blocks.3.attn2' to our
    capture key 'up_{level}_{i}[.{d}]' (``unet._level_layer_names``)."""
    parts = torch_name.split('.')
    n_levels = len(cfg.block_out_channels)
    if parts[0] == 'down_blocks':
        pos, level, i = 'down', int(parts[1]), int(parts[3])
    elif parts[0] == 'up_blocks':
        pos, level, i = 'up', n_levels - 1 - int(parts[1]), int(parts[3])
    else:
        pos, level, i = 'mid', n_levels - 1, 0
    d = int(parts[-2])
    base = f'{pos}_{level}_{i}' if pos != 'mid' else 'mid_0'
    depth = max(cfg.transformer_layers_per_block[level], 1)
    return f'{base}.{d}' if depth > 1 else base


def test_unet_full_geometry_capture_parity():
    """The capture path at real SD2.1 geometry: every cross-attention layer's
    softmax probabilities from ``capture=True`` match the torch capture
    (the tensors the heat maps are built from, ``daam/trace.py:276``)."""
    cfg, store, probs = _unet_parity('v2-1-base', spatial=16,
                                     with_capture=True)
    assert probs, 'capture returned no probability maps'
    seen = set()
    for torch_name, p in store:
        ours_name = _torch_layer_to_ours(torch_name, cfg)
        assert ours_name in probs, f'{ours_name} missing from capture'
        np.testing.assert_allclose(np.asarray(probs[ours_name]),
                                   p.numpy(), rtol=1e-4, atol=1e-5)
        seen.add(ours_name)
    # torch capture skips the mid block (reference locator default); ours
    # captures it too — everything else must match one-to-one
    assert seen == {k for k in probs if not k.startswith('mid')}
    gc.collect()


_CLIP_GEOMETRIES = {
    # (hidden, inter, layers, heads, act, projection_dim)
    'clip-l': (768, 3072, 12, 12, 'quick_gelu', None),        # SD1.x / SDXL#1
    'openclip-h': (1024, 4096, 23, 16, 'gelu', None),          # SD2.x
    'openclip-bigg': (1280, 5120, 32, 20, 'gelu', 1280),       # SDXL#2
}


@pytest.mark.parametrize('name', sorted(_CLIP_GEOMETRIES))
def test_clip_full_geometry_parity(name):
    """Converted text encoders == transformers CLIPTextModel(WithProjection)
    at the real geometry of all three encoders the reference's model registry
    uses (``daam/run/generate.py:23-30``)."""
    if name != 'clip-l' and not FULL_GEOMETRY:
        pytest.skip('354M/695M fabrication: set DAAM_FULL_GEOMETRY=1 '
                    '(scripts/full_geometry_parity.sh)')
    transformers = pytest.importorskip('transformers')
    hidden, inter, layers, heads, act, proj = _CLIP_GEOMETRIES[name]

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, hidden_act=act,
        bos_token_id=49406, eos_token_id=49407,
        projection_dim=proj or hidden)
    cls = (transformers.CLIPTextModelWithProjection if proj
           else transformers.CLIPTextModel)
    with torch.device('meta'):
        model = cls(hf_cfg)

    sd = {}
    offset = 0
    for k, v in model.state_dict().items():
        shape = tuple(v.shape)
        loc = 1.0 if k.endswith('.weight') and v.ndim == 1 else 0.0
        sd[k] = torch.from_numpy(fast_normal_fill(shape, offset, loc=loc))
        offset += int(np.prod(shape))
    model.load_state_dict(sd, strict=True, assign=True)
    # position_ids is a non-persistent buffer: not in the state dict, so it
    # stays on the meta device after assign — materialize it explicitly
    # (reading a meta buffer silently yields garbage).
    model.text_model.embeddings.position_ids = \
        torch.arange(77).expand(1, -1)
    model.eval()

    ids = np.array([[49406, 320, 1929, 2761, 49407] + [49407] * 72],
                   dtype=np.int32)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    output_hidden_states=True)

    params = _convert_clip({k: v.numpy() for k, v in sd.items()})
    ours_cfg = get_pipeline_config('v1').text if name == 'clip-l' else (
        get_pipeline_config('v2-1-base').text if name == 'openclip-h'
        else get_pipeline_config('xl-base-1.0').text_2)
    enc = CLIPTextEncoder(ours_cfg)

    last, pooled = enc.apply({'params': params}, jnp.asarray(ids),
                             eos_token_id=49407)
    if proj:
        theirs_pooled = out.text_embeds.numpy()
    else:
        theirs_pooled = out.pooler_output.numpy()
    np.testing.assert_allclose(np.asarray(last), out.last_hidden_state.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), theirs_pooled,
                               rtol=3e-4, atol=3e-4)

    # penultimate hidden state: the SD2/SDXL conditioning tensor
    pen, _ = enc.apply({'params': params}, jnp.asarray(ids),
                       penultimate=True, eos_token_id=49407)
    np.testing.assert_allclose(np.asarray(pen), out.hidden_states[-2].numpy(),
                               rtol=3e-4, atol=3e-4)
    gc.collect()


def test_vae_full_geometry_decoder_parity():
    """Converted VAE decoder == torch at the real (128/256/512/512)
    geometry (8x8 latents -> 64x64 pixels; the spatial tiling path has its
    own tests)."""
    cfg = get_pipeline_config('v2-1-base').vae
    with torch.device('meta'):
        tmodel = _TTinyVAEDecoder(cfg)
    sd = {}
    offset = 0
    for k, v in tmodel.state_dict().items():
        shape = tuple(v.shape)
        loc = 1.0 if k.endswith('.weight') and v.ndim == 1 else 0.0
        sd[k] = torch.from_numpy(fast_normal_fill(shape, offset, loc=loc))
        offset += int(np.prod(shape))
    tmodel.load_state_dict(sd, strict=True, assign=True)
    tmodel.eval()

    z = np.random.default_rng(9).standard_normal(
        (1, 8, 8, cfg.latent_channels), dtype=np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    params = _convert_vae({k: v.numpy() for k, v in sd.items()}, cfg)
    vae = AutoencoderKL(cfg)
    ours = vae.apply({'params': params}, jnp.asarray(z),
                     method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)
    gc.collect()


# ---------------------------------------------------------------------------
# full-spatial runs (DAAM_FULL_SPATIAL=1): the real latent grids + a traced
# pipeline step through a converted full-geometry checkpoint
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not FULL_SPATIAL, reason='set DAAM_FULL_SPATIAL=1')
@pytest.mark.parametrize('preset,spatial', [('v2-1-base', 64),
                                            ('xl-base-1.0', 128)])
def test_unet_full_spatial_parity(preset, spatial):
    """The real latent grids (64**2 SD2.1 / 128**2 SDXL)."""
    _unet_parity(preset, spatial=spatial)
    gc.collect()


@pytest.mark.skipif(not FULL_SPATIAL, reason='set DAAM_FULL_SPATIAL=1')
def test_traced_step_full_geometry():
    """One traced sampling step of the real-geometry SD2.1 pipeline using a
    converted checkpoint: heat maps come out finite and token-shaped on the
    64**2 grid (the 'traced step at real shapes' gate, VERDICT r2 #1a)."""
    import jax

    from daam_tpu import trace
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('v2-1-base')
    cfg = pipe.config.unet
    sd = _fabricate_unet_checkpoint(cfg)
    pipe.params['unet'] = _convert_unet(sd, cfg)
    del sd
    gc.collect()

    with trace(pipe) as tc:
        out = pipe('a dog runs', num_inference_steps=1,
                   generator=jax.random.PRNGKey(0))
        hm = tc.compute_global_heat_map()
    assert np.asarray(out.images[0]).shape == (512, 512, 3)
    maps = np.asarray(hm.heat_maps)
    assert maps.shape[1:] == (64, 64)
    assert np.isfinite(maps).all()
    word = hm.compute_word_heat_map('dog')
    assert np.isfinite(np.asarray(word.heatmap)).all()
