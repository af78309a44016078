"""End-to-end heat-map fidelity vs a torch implementation with shared weights.

The strongest offline analog of ``scripts/fidelity_vs_reference.py`` (which
needs diffusers + real checkpoints): drive the *same* fabricated UNet weights
through

1. our traced pipeline (capture inside the jitted sampling scan), and
2. a torch denoise loop over ``_TTinyUNet`` (the from-scratch torch module
   implementing the diffusers math, ``test_weights_conversion.py``) with
   reference-DAAM attention capture and aggregation semantics
   (``daam/trace.py:252-304`` capture → ``daam/trace.py:83-132`` aggregation:
   cond-half filter, per-(layer, head) running sum over steps, bicubic
   upsample + clamp, mean over entries, truncate to len+2),

then compare final latents and the per-token global heat maps (Spearman ≥0.99
is the BASELINE.json:5 gate), including the head/layer filter and normalize
query variants.  Both loops share our scheduler step functions and text
context, so any disagreement isolates to the UNet forward, the capture path,
or the aggregation math.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from daam_tpu import trace  # noqa: E402
from daam_tpu.models.weights import _convert_unet  # noqa: E402
from daam_tpu.pipeline.sd import StableDiffusionPipeline  # noqa: E402

from test_weights_conversion import _TTinyUNet, _fabricate_unet_checkpoint  # noqa: E402

PROMPT = 'a dog runs'
STEPS = 4
GUIDANCE = 7.5
SEED = 0


def _spearman(a, b):
    ar = np.argsort(np.argsort(a.ravel()))
    br = np.argsort(np.argsort(b.ravel()))
    ar = ar - ar.mean()
    br = br - br.mean()
    denom = np.sqrt((ar ** 2).sum() * (br ** 2).sum())
    return float((ar * br).sum() / denom) if denom else 1.0


def _assert_close(ours, theirs):
    assert ours.shape == theirs.shape
    # BASELINE.json:5 gate: per-token Spearman >= 0.99 (both real tokens and
    # the SOS/pad rows the reference keeps).  Ranks are meaningless on a flat
    # map (e.g. a bf16-replayed uniform SOS row where the only variation is
    # quantization noise), so the rank gate applies only to maps with real
    # structure; flat maps are held to the allclose gate below.
    for tok in range(ours.shape[0]):
        spread = ours[tok].max() - ours[tok].min()
        if spread < 1e-4 * max(abs(ours[tok]).max(), 1e-9):
            continue
        rho = _spearman(ours[tok], theirs[tok])
        assert rho >= 0.99, f'token {tok}: Spearman {rho:.4f}'
    np.testing.assert_allclose(ours, theirs, rtol=0.05, atol=0.02)


@pytest.fixture(scope='module')
def shared():
    """Pipeline + torch UNet sharing one fabricated checkpoint."""
    pipe = StableDiffusionPipeline.from_pretrained('tiny')
    cfg = pipe.config.unet
    sd = _fabricate_unet_checkpoint(cfg)
    pipe.params['unet'] = _convert_unet(sd, cfg)

    tmodel = _TTinyUNet(cfg)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()
    return pipe, tmodel


def _install_capture(tmodel, store):
    """Reference-style capture: record every cross-attention (attn2) softmax
    probability tensor, excluding the mid block (the reference locator skips
    it unless save/load_heads, ``daam/hook.py:89-127``)."""
    for name, mod in tmodel.named_modules():
        if not name.endswith('attn2') or name.startswith('mid_block'):
            continue

        def make_fwd(mod=mod, name=name):
            def fwd(x, ctx=None):
                c = x if ctx is None else ctx
                B, L, C = x.shape
                hd = C // mod.heads

                def split(t):
                    return t.reshape(B, -1, mod.heads, hd).permute(0, 2, 1, 3)

                q = split(mod.to_q(x))
                k, v = split(mod.to_k(c)), split(mod.to_v(c))
                p = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
                store.append((name, p.detach().clone()))
                o = (p @ v).permute(0, 2, 1, 3).reshape(B, L, C)
                return mod.to_out[0](o)
            return fwd

        mod.forward = make_fwd()


def _torch_denoise(pipe, tmodel, context_np, store, on_step=None,
                   added_np=None, guidance=GUIDANCE):
    """The pipeline's sampling loop, re-run eagerly through the torch UNet
    using the *same* scheduler functions and initial latents."""
    sched = pipe.scheduler
    cfg = pipe.config.unet
    latent_shape = (1, cfg.sample_size, cfg.sample_size, cfg.in_channels)

    key = jax.random.PRNGKey(SEED)
    latents = np.asarray(
        jax.random.normal(key, latent_shape, dtype=jnp.float32)
        * sched.init_noise_sigma)

    state = jax.tree.map(np.asarray,
                         sched.init_state(STEPS, latent_shape, jnp.float32))
    timesteps = np.asarray(state['timesteps'])
    context_t = torch.from_numpy(context_np)
    added_t = None
    if added_np is not None:
        added_t = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
                   for k, v in added_np.items()}

    for i in range(sched.num_scan_steps(STEPS)):
        if on_step is not None:
            on_step(i)
        latent_in = np.concatenate([latents, latents], axis=0)
        latent_in = np.asarray(sched.scale_model_input(state, latent_in, i))
        t = np.full((2,), timesteps[i], dtype=np.float32)
        with torch.no_grad():
            args = (torch.from_numpy(latent_in.transpose(0, 3, 1, 2)),
                    torch.from_numpy(t), context_t)
            eps = tmodel(*args) if added_t is None else tmodel(*args,
                                                               added=added_t)
        eps = eps.numpy().transpose(0, 2, 3, 1)
        eps_u, eps_c = eps[:1], eps[1:]
        eps = eps_u + guidance * (eps_c - eps_u)
        latents_j, state = sched.step(state, i, jnp.asarray(eps),
                                      jnp.asarray(latents))
        latents = np.asarray(latents_j)
        state = jax.tree.map(np.asarray, state)
    return latents


def _layer_sums(store):
    """Per-layer (H, hw, T) probability sums over steps, cond half only
    (``daam/trace.py:240``, ``daam/heatmap.py:153-156``)."""
    sums = {}
    for name, p in store:  # p: (2B, H, hw, T)
        p_cond = p[p.shape[0] // 2:]
        sums[name] = p_cond[0] + sums.get(name, 0.0)
    return sums


def _reference_aggregate(store, x, n_tokens, head_idx=None, layer_pred=None):
    """Reference global-heat-map math over the captured torch probs
    (``daam/trace.py:83-132`` + ``_unravel_attn`` ``daam/trace.py:219-244``),
    with the same head/layer filtering hooks as ``compute_global_heat_map``."""
    entries = []
    for name, s in _layer_sums(store).items():
        if layer_pred is not None and not layer_pred(name):
            continue
        H, hw, T = s.shape
        edge = int(round(hw ** 0.5))
        maps = s.reshape(H, edge, edge, T).permute(0, 3, 1, 2)  # (H, T, h, w)
        for h in range(H):
            if head_idx is not None and h != head_idx:
                continue
            up = F.interpolate(maps[h][:, None], size=(x, x), mode='bicubic')
            entries.append(up.clamp(min=0)[:, 0])
    glob = torch.stack(entries).mean(0)      # (T, x, x)
    return glob[:n_tokens + 2].numpy()


@pytest.fixture(scope='module')
def runs(shared):
    """One traced run of our pipeline + one captured torch denoise loop."""
    pipe, tmodel = shared

    with trace(pipe) as tc:
        out = pipe(PROMPT, num_inference_steps=STEPS,
                   generator=jax.random.PRNGKey(SEED),
                   guidance_scale=GUIDANCE)
        ours_img = np.asarray(out.images[0])

    # identical text context on both sides (CLIP parity is proven separately)
    ids = pipe._encode_tokens([PROMPT])
    neg = pipe._encode_tokens([''])
    cond, _ = pipe._text_forward(pipe.params, jnp.asarray(ids))
    uncond, _ = pipe._text_forward(pipe.params, jnp.asarray(neg))
    context_np = np.concatenate([np.asarray(uncond), np.asarray(cond)], axis=0)

    store = []
    _install_capture(tmodel, store)
    final_latents = _torch_denoise(pipe, tmodel, context_np, store)

    n_tokens = len(pipe.tokenizer.tokenize(PROMPT))
    x = int(round(np.sqrt(tc.latent_hw)))
    return dict(pipe=pipe, tc=tc, store=store, ours_img=ours_img,
                final_latents=final_latents, n_tokens=n_tokens, x=x)


def test_e2e_final_images_agree(runs):
    """The two denoise loops agree (UNet forward parity over the schedule)."""
    pipe = runs['pipe']
    images = pipe._jit_cache[('decode', 1, pipe.config.image_size,
                              pipe.config.image_size)](
        pipe.params, jnp.asarray(runs['final_latents']))
    torch_img = np.clip(np.asarray(images[0]) * 255 + 0.5, 0,
                        255).astype(np.uint8)
    assert np.abs(torch_img.astype(int) -
                  runs['ours_img'].astype(int)).max() <= 2


def test_e2e_heat_map_fidelity(runs):
    ours = np.asarray(runs['tc'].compute_global_heat_map().heat_maps)
    theirs = _reference_aggregate(runs['store'], runs['x'], runs['n_tokens'])
    _assert_close(ours, theirs)


def test_e2e_head_filter_fidelity(runs):
    """``compute_global_heat_map(head_idx=…)`` matches the reference math
    restricted to that head (``daam/trace.py:112-117`` filter)."""
    for h in (0, 1):
        ours = np.asarray(
            runs['tc'].compute_global_heat_map(head_idx=h).heat_maps)
        theirs = _reference_aggregate(runs['store'], runs['x'],
                                      runs['n_tokens'], head_idx=h)
        _assert_close(ours, theirs)


def test_e2e_layer_filter_fidelity(runs):
    """``compute_global_heat_map(layer_idx=…)`` for the down-block layer
    matches the torch aggregation over only that layer.  The locator orders
    up → down → mid (reference ``daam/hook.py:110-114``), so tiny's down
    layer is the last located id; on the torch side it is the module under
    ``down_blocks``."""
    tc = runs['tc']
    down_ids = [info.layer_idx for info in tc._located
                if info.name.startswith('down')]
    assert len(down_ids) == 1
    ours = np.asarray(
        tc.compute_global_heat_map(layer_idx=down_ids[0]).heat_maps)
    theirs = _reference_aggregate(
        runs['store'], runs['x'], runs['n_tokens'],
        layer_pred=lambda name: name.startswith('down_blocks'))
    _assert_close(ours, theirs)


def test_e2e_normalize_fidelity(runs):
    """``normalize=True`` divides by the real-token sum after truncation
    (reference ``daam/trace.py:129-130``)."""
    ours = np.asarray(
        runs['tc'].compute_global_heat_map(normalize=True).heat_maps)
    glob = _reference_aggregate(runs['store'], runs['x'], runs['n_tokens'])
    theirs = glob / (glob[1:-1].sum(0, keepdims=True) + 1e-6)
    _assert_close(ours, theirs)


def test_e2e_factors_filter_is_identity_for_tiny(runs):
    """tiny has one spatial factor, so an explicit factors list equals the
    default 'all captured factors' result."""
    tc = runs['tc']
    factor = sorted(tc.batch_heat_maps)[0]
    a = np.asarray(tc.compute_global_heat_map().heat_maps)
    b = np.asarray(tc.compute_global_heat_map(factors=[factor]).heat_maps)
    np.testing.assert_array_equal(a, b)


# our locator's layer names (up -> down -> mid, reference daam/hook.py:110-114)
# mapped to the torch module paths of the same attention layers
_TINY_NAME_MAP = {
    'up_0_0': 'up_blocks.1.attentions.0.transformer_blocks.0.attn2',
    'up_0_1': 'up_blocks.1.attentions.1.transformer_blocks.0.attn2',
    'down_0_0': 'down_blocks.0.attentions.0.transformer_blocks.0.attn2',
    'mid_0': 'mid_block.attentions.0.transformer_blocks.0.attn2',
}


def test_e2e_head_replay_transplant(shared):
    """The save_heads → load_heads attention transplant (the demo's
    counterfactual, reference ``daam/trace.py:279-282``) replayed through the
    torch loop: both implementations must generate the same image from the
    *new* prompt under the *old* prompt's attention."""
    pipe, tmodel = shared
    new_prompt = 'a cat sits'
    data_dir = 'e2e-replay-test'

    with trace(pipe, save_heads=True, data_dir=data_dir) as tc:
        pipe(PROMPT, num_inference_steps=STEPS,
             generator=jax.random.PRNGKey(SEED), guidance_scale=GUIDANCE)
        buf = {n: np.asarray(a, dtype=np.float32)
               for n, a in tc.replay_buffer(STEPS).items()}

    with trace(pipe, load_heads=True, data_dir=data_dir) as tc2:
        out = pipe(new_prompt, num_inference_steps=STEPS,
                   generator=jax.random.PRNGKey(SEED),
                   guidance_scale=GUIDANCE)
        ours_img = np.asarray(out.images[0])
        ours_maps = np.asarray(tc2.compute_global_heat_map().heat_maps)

    assert set(buf) == set(_TINY_NAME_MAP)
    torch_mods = dict(tmodel.named_modules())
    step_holder = {'i': 0}
    store = []
    for ours_name, torch_name in _TINY_NAME_MAP.items():
        mod = torch_mods[torch_name]

        def make_fwd(mod=mod, ours_name=ours_name):
            def fwd(x, ctx=None):
                c = x if ctx is None else ctx
                B, L, C = x.shape
                hd = C // mod.heads
                v = mod.to_v(c).reshape(B, -1, mod.heads, hd).permute(0, 2, 1, 3)
                p = torch.from_numpy(buf[ours_name][step_holder['i']])
                store.append((ours_name, p))
                o = (p @ v).permute(0, 2, 1, 3).reshape(B, L, C)
                return mod.to_out[0](o)
            return fwd

        mod.forward = make_fwd()

    ids = pipe._encode_tokens([new_prompt])
    neg = pipe._encode_tokens([''])
    cond, _ = pipe._text_forward(pipe.params, jnp.asarray(ids))
    uncond, _ = pipe._text_forward(pipe.params, jnp.asarray(neg))
    ctx = np.concatenate([np.asarray(uncond), np.asarray(cond)], axis=0)

    final_latents = _torch_denoise(pipe, tmodel, ctx, store=[],
                                   on_step=lambda i: step_holder.update(i=i))
    images = pipe._jit_cache[('decode', 1, pipe.config.image_size,
                              pipe.config.image_size)](
        pipe.params, jnp.asarray(final_latents))
    torch_img = np.clip(np.asarray(images[0]) * 255 + 0.5, 0,
                        255).astype(np.uint8)
    assert np.abs(torch_img.astype(int) - ours_img.astype(int)).max() <= 2

    # heat maps under replay aggregate the replayed probabilities (incl. the
    # mid block, which save/load_heads adds to the located set)
    n_tokens = len(pipe.tokenizer.tokenize(new_prompt))
    x = int(round(np.sqrt(tc2.latent_hw)))
    theirs = _reference_aggregate(store, x, n_tokens)
    _assert_close(ours_maps, theirs)


def test_e2e_sdxl_heat_map_fidelity():
    """SDXL path end to end: dual-encoder context + text_time added
    conditioning through capture and aggregation, vs the torch loop with the
    same fabricated weights (reference SDXL support ``daam/trace.py:55-56``)."""
    from daam_tpu.pipeline.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.from_pretrained('tiny-xl')
    cfg = pipe.config.unet
    sd = _fabricate_unet_checkpoint(cfg)
    pipe.params['unet'] = _convert_unet(sd, cfg)

    tmodel = _TTinyUNet(cfg)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()

    guidance = 5.0
    with trace(pipe) as tc:
        out = pipe(PROMPT, num_inference_steps=STEPS,
                   generator=jax.random.PRNGKey(SEED),
                   guidance_scale=guidance)
        ours = np.asarray(tc.compute_global_heat_map().heat_maps)
        ours_img = np.asarray(out.images[0])

    size = pipe.config.image_size
    ids = pipe._encode_tokens([PROMPT])
    neg = pipe._encode_tokens([''])
    cond, pooled_c = pipe._text_forward(pipe.params, jnp.asarray(ids))
    uncond, pooled_u = pipe._text_forward(pipe.params, jnp.asarray(neg))
    context_np = np.concatenate([np.asarray(uncond), np.asarray(cond)], axis=0)
    added = pipe._merge_added(pooled_u, pooled_c, size, size)
    added_np = {k: np.asarray(v) for k, v in added.items()}

    store = []
    _install_capture(tmodel, store)
    final_latents = _torch_denoise(pipe, tmodel, context_np, store,
                                   added_np=added_np, guidance=guidance)

    images = pipe._jit_cache[('decode', 1, size, size)](
        pipe.params, jnp.asarray(final_latents))
    torch_img = np.clip(np.asarray(images[0]) * 255 + 0.5, 0,
                        255).astype(np.uint8)
    assert np.abs(torch_img.astype(int) - ours_img.astype(int)).max() <= 2

    n_tokens = len(pipe.tokenizer.tokenize(PROMPT))
    x = int(round(np.sqrt(tc.latent_hw)))
    theirs = _reference_aggregate(store, x, n_tokens)
    _assert_close(ours, theirs)


def test_e2e_capture_step_count(shared):
    """The torch loop captures steps × located-layers calls (sanity that the
    capture actually saw the whole schedule)."""
    pipe, tmodel = shared
    store = []
    _install_capture(tmodel, store)
    ids = pipe._encode_tokens([PROMPT])
    cond, _ = pipe._text_forward(pipe.params, jnp.asarray(ids))
    ctx = np.concatenate([np.asarray(cond)] * 2, axis=0)
    _torch_denoise(pipe, tmodel, ctx, store)
    n_layers = len({n for n, _ in store})
    assert n_layers == 3  # tiny: 1 down + 2 up cross-attn layers (mid excluded)
    assert len(store) == STEPS * n_layers
