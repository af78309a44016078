"""Run the ACTUAL reference ``daam`` package (read-only checkout at
``/root/reference``) against our torch reference UNet, for true
"fidelity vs daam itself" tests without diffusers or network access.

The reference package imports ``diffusers`` and ``spacy`` at module scope
(``daam/trace.py:5-7``, ``daam/hook.py:5-6``, ``daam/utils.py:11``,
``daam/heatmap.py:10``) but only ever *uses* a narrow protocol surface:

- ``diffusers``: the names ``StableDiffusionPipeline`` /
  ``StableDiffusionXLPipeline`` / ``UNet2DConditionModel`` /
  ``VaeImageProcessor`` / ``Attention`` (type hints + one exact-type check),
  the UNet block tree walked by ``UNetCrossAttentionLocator.locate``
  (``daam/hook.py:95-127``), the ``Attention`` processor protocol used by
  ``UNetCrossAttentionHooker.__call__`` (``daam/trace.py:252-304``), and the
  pipeline methods patched by ``PipelineHooker`` (``daam/trace.py:150-186``).
- ``spacy``: ``spacy.load(...)`` returning a callable that parses a prompt
  into tokens with ``.text``/``.pos_``/``.dep_``/``.head``
  (``daam/utils.py:94-109``, ``daam/heatmap.py:125-141``).

This module installs stdlib shims for exactly that surface, backed by the
same machinery the rest of the test suite already trusts: ``_TTinyUNet``
(the from-scratch torch module implementing the diffusers math,
``test_weights_conversion.py``), our schedulers, and our fallback NLP
pipeline.  Nothing is copied from the reference; its package is imported
in place and exercised as a black box.
"""

import importlib.machinery
import sys
import types
from pathlib import Path


def _make_module(name):
    """A shim module with a valid __spec__ (importlib probes like
    transformers' ``_is_package_available`` call ``find_spec`` on it)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

import numpy as np

REFERENCE_ROOT = Path('/root/reference')


def reference_available():
    return (REFERENCE_ROOT / 'daam' / 'trace.py').is_file()


# ---------------------------------------------------------------------------
# spacy shim: parse with our fallback NLP (99.5% POS agreement vs goldens)
# ---------------------------------------------------------------------------

def _install_spacy_shim():
    if 'spacy' in sys.modules:
        return
    from daam_tpu import nlp as _nlp

    class _Pipeline:
        def __call__(self, text):
            return _nlp._fallback_nlp(text)

    spacy_mod = _make_module('spacy')
    tokens_mod = _make_module('spacy.tokens')
    tokens_mod.Token = _nlp.Token
    tokens_mod.Doc = _nlp.Doc
    spacy_mod.tokens = tokens_mod
    spacy_mod.load = lambda name, **kw: _Pipeline()
    sys.modules['spacy'] = spacy_mod
    sys.modules['spacy.tokens'] = tokens_mod

    # keep daam_tpu's own backend probe honest: the fake module must not make
    # our cached_nlp think real spaCy is installed (it would still resolve to
    # the same fallback parser, but via a confusing path).
    _nlp._spacy_checked = True
    _nlp._spacy_nlp = None


# ---------------------------------------------------------------------------
# diffusers shim: pipeline + attention protocol around _TTinyUNet
# ---------------------------------------------------------------------------

def _numpy_to_pil(image):
    import PIL.Image
    arr = np.clip(np.asarray(image) * 255 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3:
        arr = arr[None]
    return [PIL.Image.fromarray(a) for a in arr]


class VaeImageProcessor:
    """Shim of ``diffusers.image_processor.VaeImageProcessor`` — the SDXL
    trace hooks only ``postprocess`` (``daam/trace.py:140-147``)."""

    def postprocess(self, image, output_type='pil'):
        return _numpy_to_pil(image)

    def numpy_to_pil(self, image):
        return _numpy_to_pil(image)


class Attention:
    """Name placeholder for ``diffusers.models.attention_processor.Attention``
    (the reference uses it only in annotations)."""


class UNet2DConditionModel:
    """Name placeholder for ``diffusers.UNet2DConditionModel``."""


class _DefaultProcessor:
    """Pre-hook processor: delegate to the module's original forward so an
    unhooked shim pipeline is bit-identical to the bare torch model."""

    def __init__(self, orig_forward):
        self._orig = orig_forward

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None):
        return self._orig(hidden_states, encoder_hidden_states)


def adapt_attention(mod):
    """Give a ``_TAttention`` instance the diffusers ``Attention`` protocol
    surface used by ``UNetCrossAttentionHooker.__call__``
    (``daam/trace.py:252-304``)."""
    import torch
    import torch.nn as tnn

    if getattr(mod, '_daam_shim_adapted', False):
        return
    mod._daam_shim_adapted = True

    if len(mod.to_out) == 1:           # reference calls to_out[1] (dropout)
        mod.to_out.append(tnn.Identity())
    mod.norm_cross = None
    heads = mod.heads

    def head_to_batch_dim(t):
        B, L, C = t.shape
        hd = C // heads
        return t.reshape(B, L, heads, hd).permute(0, 2, 1, 3).reshape(
            B * heads, L, hd)

    def batch_to_head_dim(t):
        BH, L, hd = t.shape
        B = BH // heads
        return t.reshape(B, heads, L, hd).permute(0, 2, 1, 3).reshape(
            B, L, heads * hd)

    def get_attention_scores(q, k, attention_mask=None):
        scale = q.shape[-1] ** -0.5
        scores = torch.baddbmm(
            torch.zeros(q.shape[0], q.shape[1], k.shape[1], dtype=q.dtype),
            q, k.transpose(-1, -2), beta=0, alpha=scale)
        if attention_mask is not None:
            scores = scores + attention_mask
        return scores.softmax(dim=-1)

    mod.head_to_batch_dim = head_to_batch_dim
    mod.batch_to_head_dim = batch_to_head_dim
    mod.get_attention_scores = get_attention_scores
    mod.prepare_attention_mask = lambda mask, seq_len, batch: mask

    mod.processor = _DefaultProcessor(mod.forward)

    def set_processor(p):
        mod.processor = p

    mod.set_processor = set_processor
    mod.forward = lambda x, ctx=None: mod.processor(
        mod, x, encoder_hidden_states=ctx, attention_mask=None)


def adapt_unet(tmodel):
    """Rename block classes and adapt cross-attention modules so the
    reference locator (``daam/hook.py:95-127``) finds and hooks them."""
    import torch.nn as tnn

    cross_down = type('CrossAttnDownBlock2D', (tnn.Module,), {})
    cross_up = type('CrossAttnUpBlock2D', (tnn.Module,), {})
    cross_mid = type('UNetMidBlock2DCrossAttn', (tnn.Module,), {})
    for blk in tmodel.down_blocks:
        if hasattr(blk, 'attentions'):
            blk.__class__ = cross_down
    for blk in tmodel.up_blocks:
        if hasattr(blk, 'attentions'):
            blk.__class__ = cross_up
    if hasattr(tmodel.mid_block, 'attentions'):
        tmodel.mid_block.__class__ = cross_mid

    for name, mod in tmodel.named_modules():
        if name.endswith('attn2'):
            adapt_attention(mod)

    tmodel.config = tmodel.cfg      # locator reads unet.config.sample_size
    return tmodel


class StableDiffusionPipeline:
    """Duck-typed diffusers pipeline: our torch reference UNet + our jax
    schedulers/CLIP/VAE, hookable by the reference ``daam.trace``
    (``daam/trace.py:150-186`` patches ``check_inputs`` /
    ``run_safety_checker``; the attention capture rides the processor swap).

    The denoise loop mirrors ``_torch_denoise`` in
    ``test_e2e_fidelity_torch.py`` so a run here is numerically comparable
    to our traced pipeline under the same fabricated checkpoint.
    """

    def __init__(self, daam_tpu_pipe, tmodel, seed=0):
        self._pipe = daam_tpu_pipe
        self.unet = adapt_unet(tmodel)
        self.vae_scale_factor = 8
        self.tokenizer = daam_tpu_pipe.tokenizer
        self.image_processor = None
        self.seed = seed

    # --- methods the reference PipelineHooker monkey-patches -------------
    def check_inputs(self, prompt, *args, **kwargs):
        return None

    def run_safety_checker(self, image, *args, **kwargs):
        return image, None

    def numpy_to_pil(self, image):
        return _numpy_to_pil(image)

    # --- text encoding via our jax CLIP (parity proven separately) -------
    def _context(self, prompt):
        import jax.numpy as jnp
        pipe = self._pipe
        ids = pipe._encode_tokens([prompt])
        neg = pipe._encode_tokens([''])
        cond, pooled_c = pipe._text_forward(pipe.params, jnp.asarray(ids))
        uncond, pooled_u = pipe._text_forward(pipe.params, jnp.asarray(neg))
        ctx = np.concatenate([np.asarray(uncond), np.asarray(cond)], axis=0)
        return ctx, pooled_u, pooled_c

    def _added_cond(self, pooled_u, pooled_c):
        return None

    def __call__(self, prompt, num_inference_steps=50, generator=None,
                 guidance_scale=7.5, callback=None):
        import jax
        import jax.numpy as jnp
        import torch

        self.check_inputs(prompt)
        pipe = self._pipe
        sched = pipe.scheduler
        cfg = pipe.config.unet
        steps = num_inference_steps

        ctx_np, pooled_u, pooled_c = self._context(prompt)
        added_np = self._added_cond(pooled_u, pooled_c)
        added_t = None
        if added_np is not None:
            added_t = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
                       for k, v in added_np.items()}

        latent_shape = (1, cfg.sample_size, cfg.sample_size, cfg.in_channels)
        key = jax.random.PRNGKey(self.seed)
        latents = np.asarray(
            jax.random.normal(key, latent_shape, dtype=jnp.float32)
            * sched.init_noise_sigma)
        state = jax.tree.map(
            np.asarray, sched.init_state(steps, latent_shape, jnp.float32))
        timesteps = np.asarray(state['timesteps'])
        ctx_t = torch.from_numpy(ctx_np)

        for i in range(sched.num_scan_steps(steps)):
            latent_in = np.concatenate([latents, latents], axis=0)
            latent_in = np.asarray(sched.scale_model_input(state, latent_in, i))
            t = np.full((2,), timesteps[i], dtype=np.float32)
            with torch.no_grad():
                args = (torch.from_numpy(latent_in.transpose(0, 3, 1, 2)),
                        torch.from_numpy(t), ctx_t)
                eps = (self.unet(*args) if added_t is None
                       else self.unet(*args, added=added_t))
            eps = eps.numpy().transpose(0, 2, 3, 1)
            eps_u, eps_c = eps[:1], eps[1:]
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            latents_j, state = sched.step(state, i, jnp.asarray(eps),
                                          jnp.asarray(latents))
            latents = np.asarray(latents_j)
            state = jax.tree.map(np.asarray, state)
            if callback is not None:
                callback(i, timesteps[i], latents)

        size = pipe.config.image_size
        decode = pipe._jit_cache.get(('decode', 1, size, size))
        if decode is None:     # populate the decode jit via a 1-step dry run
            pipe('', num_inference_steps=1,
                 generator=jax.random.PRNGKey(0), guidance_scale=1.0)
            decode = pipe._jit_cache[('decode', 1, size, size)]
        image = np.asarray(decode(pipe.params, jnp.asarray(latents)))

        image, _ = self.run_safety_checker(image)
        return types.SimpleNamespace(images=_numpy_to_pil(image))


class StableDiffusionXLPipeline(StableDiffusionPipeline):
    """SDXL variant: dual-encoder context + text_time added conditioning;
    the reference detects it by exact type and hooks
    ``image_processor.postprocess`` instead of ``run_safety_checker``
    (``daam/trace.py:55-56,135-147``)."""

    def __init__(self, daam_tpu_pipe, tmodel, seed=0):
        super().__init__(daam_tpu_pipe, tmodel, seed=seed)
        self.image_processor = VaeImageProcessor()

    def _added_cond(self, pooled_u, pooled_c):
        pipe = self._pipe
        size = pipe.config.image_size
        added = pipe._merge_added(pooled_u, pooled_c, size, size)
        return {k: np.asarray(v) for k, v in added.items()}

    def __call__(self, prompt, **kwargs):
        out = super().__call__(prompt, **kwargs)
        # diffusers SDXL routes the decoded image through
        # image_processor.postprocess; the hooked version records last_image.
        out.images = self.image_processor.postprocess(
            np.stack([np.asarray(im) for im in out.images]) / 255.0)
        return out


def _install_diffusers_shim():
    if 'diffusers' in sys.modules:
        return
    diffusers_mod = _make_module('diffusers')
    diffusers_mod.StableDiffusionPipeline = StableDiffusionPipeline
    diffusers_mod.StableDiffusionXLPipeline = StableDiffusionXLPipeline
    diffusers_mod.UNet2DConditionModel = UNet2DConditionModel

    image_processor_mod = _make_module('diffusers.image_processor')
    image_processor_mod.VaeImageProcessor = VaeImageProcessor

    models_mod = _make_module('diffusers.models')
    attn_mod = _make_module('diffusers.models.attention_processor')
    attn_mod.Attention = Attention
    models_mod.attention_processor = attn_mod

    diffusers_mod.image_processor = image_processor_mod
    diffusers_mod.models = models_mod
    sys.modules['diffusers'] = diffusers_mod
    sys.modules['diffusers.image_processor'] = image_processor_mod
    sys.modules['diffusers.models'] = models_mod
    sys.modules['diffusers.models.attention_processor'] = attn_mod


def load_reference_daam():
    """Import the reference ``daam`` package in place (or return it if already
    imported).  Returns None when the reference checkout is absent."""
    if 'daam' in sys.modules:
        return sys.modules['daam']
    if not reference_available():
        return None
    _install_spacy_shim()
    _install_diffusers_shim()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import daam
    return daam
