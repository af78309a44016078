"""Stable Diffusion pipeline — jit-compiled, scan-sampled, trace-aware.

TPU-native replacement for the reference's ``diffusers`` pipeline + monkey
patching (reference ``daam/trace.py``): the whole sampling loop (text encode →
CFG denoising scan → VAE decode) is one jitted function per
(steps, batch, capture-mode) signature.  Tracing is a *configuration* of that
function, not object surgery: when a :class:`~daam_tpu.trace.trace` context is
active, the pipeline runs the capture variant, which carries per-factor heat
map accumulators through the ``lax.scan`` (summing over timesteps on-device —
the functional analog of ``RawHeatMapCollection.update``'s running sum,
reference ``daam/heatmap.py:153-156``) and can save or replay raw attention
(reference ``daam/trace.py:279-282``).
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from ..models.clip import CLIPTextEncoder
from ..parallel.mesh import fetch_global
from ..models.configs import PipelineConfig, get_pipeline_config
from ..models.unet import UNet2DConditionModel, cross_attention_layout
from ..models.vae import AutoencoderKL
from ..tokenization import default_tokenizer
from .schedulers import BaseScheduler, get_scheduler

__all__ = ['StableDiffusionPipeline', 'PipelineOutput']


@dataclass
class PipelineOutput:
    images: List[PIL.Image.Image]
    nsfw_content_detected: Optional[List[bool]] = None


class _ModuleShim:
    """Duck-typed ``pipe.unet.config`` surface for reference-API parity
    (``daam/trace.py:32`` reads ``pipeline.unet.config.sample_size``)."""

    def __init__(self, config):
        self.config = config


def _to_pil(images: np.ndarray) -> List[PIL.Image.Image]:
    images = fetch_global(images)
    if images.dtype != np.uint8:
        images = np.clip(images * 255 + 0.5, 0, 255).astype(np.uint8)
    return [PIL.Image.fromarray(im) for im in images]


# uint8 quantization on device: fetching fp32 images through the relay costs
# ~4x the bytes of u8 (145 vs 68 ms for one 512² image, scripts/profile_phases
# measurements), so the default 'pil' path converts before the fetch.
@jax.jit
def _quantize_u8(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(images * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


class StableDiffusionPipeline:
    """Text-to-image Stable Diffusion (1.x / 2.x) on JAX/TPU.

    Construction: :meth:`from_pretrained` (local diffusers-format checkpoint
    dir or preset name with random weights).  Call signature mirrors the
    reference pipeline: ``pipe(prompt, num_inference_steps=…, generator=key,
    guidance_scale=…, negative_prompt=…, callback=…)``.
    """

    is_sdxl = False

    def __init__(self, config: PipelineConfig, params: Dict[str, Any],
                 tokenizer=None, scheduler: Union[str, BaseScheduler] = 'ddim',
                 dtype: jnp.dtype = jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.tokenizer = tokenizer or default_tokenizer()
        if isinstance(scheduler, str):
            scheduler = get_scheduler(scheduler, config.prediction_type)
        self.scheduler = scheduler

        self.text_encoder = CLIPTextEncoder(config.text, dtype=dtype)
        self.unet_module = UNet2DConditionModel(config.unet, dtype=dtype)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)

        self.unet = _ModuleShim(config.unet)
        self.vae_scale_factor = config.vae.scale_factor
        self.image_processor = None

        # Tiled VAE decode: splits big latents into overlapping tiles so the
        # decoder's workspace stays bounded (1024-px decode alongside the UNet
        # otherwise exhausts a 16 GB chip).  Auto-on for latent edges > this.
        self.vae_tile_threshold = 96
        self.vae_tiling = 'auto'  # 'auto' | True | False

        # save/load-heads sampling runs in chunks of this many steps so the
        # raw attention buffers stream to host and device memory stays bounded
        # (~chunk×per-step size instead of steps×).
        self.heads_chunk_steps = 8
        # Replay-buffer element type.  bfloat16 (default) halves the head
        # buffers; set to jnp.float32 for bit-exact transplants matching the
        # reference's full-precision saved heads (daam/trace.py:246-250).
        self.heads_dtype = jnp.bfloat16

        # Safety-checker slot (reference pipelines run one and DAAM hooks it,
        # daam/trace.py:156-169): a callable ``(images_u8, prompts) ->
        # List[bool]``.  Flagged outputs are blacked out, mirroring the
        # reference checker's behavior; None (default) disables checking,
        # like diffusers with safety_checker=None.
        self.safety_checker = None

        # Trace integration (installed by daam_tpu.trace; None = untraced).
        self._active_trace = None
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ init
    @classmethod
    def from_pretrained(cls, model_name_or_path: str, scheduler: str = 'ddim',
                        dtype=jnp.float32, seed: int = 0, **kwargs
                        ) -> 'StableDiffusionPipeline':
        from ..models import weights as W
        from pathlib import Path

        if Path(model_name_or_path).exists():
            config, params, tokenizer = W.load_diffusers_checkpoint(
                model_name_or_path, dtype=dtype)
            klass = _pipeline_class(config)
            return klass(config, params, tokenizer=tokenizer,
                         scheduler=scheduler, dtype=dtype)
        config = get_pipeline_config(model_name_or_path)
        klass = _pipeline_class(config)
        params = W.init_random_params(config, seed=seed, dtype=dtype)
        return klass(config, params, scheduler=scheduler, dtype=dtype)

    # ---------------------------------------------------------------- encode
    def _encode_tokens(self, prompts: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer(list(prompts), padding='max_length',
                             truncation=True, return_tensors='np')
        return enc['input_ids'].astype(np.int32)

    def _text_forward(self, params, input_ids):
        """(context, added_cond) for the UNet.  SD: plain hidden states."""
        hidden, _ = self.text_encoder.apply(
            {'params': params['text_encoder']}, input_ids)
        return hidden, None

    # --------------------------------------------------------------- compile
    def _build_generate(self, batch_size: int, num_steps: int, height: int,
                        width: int, capture_spec: Optional[Tuple] = None,
                        save_heads: bool = False, load_heads: bool = False,
                        chunk_steps: Optional[int] = None,
                        snapshot_accs: bool = False):
        """Build the jitted generate pipeline for one signature.

        Three separately-compiled stages (text encode → denoising scan → VAE
        decode) rather than one monolithic program: the text/VAE stages are
        shared across traced/untraced variants (compile-cache reuse), and each
        HLO stays small enough for fast (re)compilation.
        """
        scheduler = self.scheduler
        latent_h = height // self.vae_scale_factor
        latent_w = width // self.vae_scale_factor
        latent_shape = (batch_size, latent_h, latent_w,
                        self.config.unet.in_channels)
        scan_steps = scheduler.num_scan_steps(num_steps)
        layout = {info.name: info for info in
                  cross_attention_layout(self.config.unet)}
        grid_x = self._map_grid_size()

        capture = capture_spec is not None
        # In-kernel accumulation ('acc' capture) is the production heat-map
        # path; save_heads needs the full per-step probability tensors, so it
        # keeps the probs side-output + per-step XLA accumulation.
        acc_mode = capture and not save_heads
        T_ctx = self.tokenizer.model_max_length
        # Bound at build time; the jit cache key includes heads_dtype for
        # save_heads signatures, so changing pipe.heads_dtype mid-session
        # simply compiles a fresh program (no stale-dtype footgun).
        heads_dtype = self.heads_dtype

        # capture_spec: tuple of (factor, (layer_names...), (layer_ids...))
        def make_acc():
            accs = {}
            if not capture:
                return accs
            if acc_mode:
                from ..ops.pallas_attention import cross_acc_shape
                for _factor, names, _ids in capture_spec:
                    for n in names:
                        info = layout[n]
                        h = latent_h // info.downscale
                        w = latent_w // info.downscale
                        accs[n] = jnp.zeros(
                            cross_acc_shape(batch_size,
                                            self._acc_heads(info, h * w),
                                            h * w, T_ctx), jnp.float32)
                return accs
            for factor, names, _ids in capture_spec:
                info = layout[names[0]]
                h = latent_h // info.downscale
                w = latent_w // info.downscale
                accs[factor] = jnp.zeros(
                    (batch_size, len(names), info.heads, T_ctx, h, w),
                    jnp.float32)
            return accs

        def finalize_acc(accs):
            """Per-layer kernel-layout accumulators (B, H, Lk_pad, Lq_pad) →
            per-factor blocks (B, L, H, T, h, w) — once, after the scan."""
            blocks = {}
            for factor, names, _ids in capture_spec:
                per_layer = []
                for n in names:
                    info = layout[n]
                    h = latent_h // info.downscale
                    w = latent_w // info.downscale
                    # [:info.heads] drops the packed path's ghost head (odd
                    # head counts; its row is uniform garbage by design).
                    a = accs[n][:, :info.heads, :T_ctx, :h * w]
                    per_layer.append(a.reshape(batch_size, info.heads, T_ctx,
                                               h, w))
                blocks[factor] = jnp.stack(per_layer, axis=1)
            return blocks

        def reshape_probs(probs, name):
            # (2B, H, hw, T) -> conditional half -> (B, H, T, h, w)
            info = layout[name]
            h = latent_h // info.downscale
            w = latent_w // info.downscale
            p = probs[batch_size:]  # conditional half (CFG filter,
            #                         reference daam/trace.py:240)
            p = p.astype(jnp.float32).transpose(0, 1, 3, 2)
            return p.reshape(batch_size, info.heads, -1, h, w)

        def encode_text(params, input_ids, neg_input_ids):
            context_cond, added_cond = self._text_forward(params, input_ids)
            context_uncond, added_uncond = self._text_forward(params, neg_input_ids)
            context = jnp.concatenate([context_uncond, context_cond], axis=0)
            added = self._merge_added(added_uncond, added_cond, height, width)
            return context, added

        def init_latents(key):
            from ..parallel.mesh import constraint as shard_constraint
            if key.ndim == 2:
                # one PRNG key per sample (batched per-experiment seeds)
                latents = jax.vmap(
                    lambda k: jax.random.normal(k, latent_shape[1:],
                                                dtype=jnp.float32))(key)
            else:
                latents = jax.random.normal(key, latent_shape, dtype=jnp.float32)
            latents = latents * scheduler.init_noise_sigma
            return shard_constraint(latents, 'data', None, None, None)

        def make_step(params, context, added, guidance_scale, timesteps):
            def step(carry, xs):
                latents, sched_state, accs = carry
                if load_heads:
                    i, rep = xs  # per-step replay rows threaded through xs
                else:
                    i, rep = xs, None
                latent_in = jnp.concatenate([latents, latents], axis=0)
                latent_in = scheduler.scale_model_input(sched_state, latent_in, i)
                t = timesteps[i]
                # 'acc' capture (in-kernel Pᵀ accumulation, no probs in HBM)
                # is the low-overhead heat-map path; save_heads needs every
                # CFG row's probabilities for replay.
                capture_mode = False
                if capture or save_heads:
                    capture_mode = ('full' if save_heads
                                    else 'acc' if acc_mode else 'cond')
                eps, probs = self.unet_module.apply(
                    {'params': params['unet']}, latent_in,
                    jnp.full((2 * batch_size,), t), context,
                    added_cond=added, capture=capture_mode,
                    replay=rep, acc=(accs if acc_mode else None))
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                latents, sched_state = scheduler.step(sched_state, i, eps,
                                                      latents)

                if capture:
                    if acc_mode:
                        accs = {n: probs[n] for n in accs}
                    else:
                        new_accs = {}
                        for factor, names, _ids in capture_spec:
                            update = jnp.stack(
                                [reshape_probs(probs[n], n) for n in names],
                                axis=1)
                            new_accs[factor] = accs[factor] + update
                        accs = new_accs

                ys = None
                if save_heads:
                    ys = {n: p.astype(heads_dtype)
                          for n, p in probs.items()}
                return (latents, sched_state, accs), ys
            return step

        def sample(params, context, added, key, guidance_scale):
            """One-shot sampling scan (no head save/replay)."""
            latents = init_latents(key)
            sched_state = scheduler.init_state(num_steps, latent_shape,
                                               jnp.float32)
            step = make_step(params, context, added, guidance_scale,
                             sched_state['timesteps'])
            (latents, _, accs), _ = jax.lax.scan(
                step, (latents, sched_state, make_acc()),
                jnp.arange(scan_steps))
            if acc_mode:
                accs = finalize_acc(accs)
            return latents, accs

        # save/load-heads runs the scan in bounded chunks so the raw per-step
        # probability buffers stream to host instead of accumulating on device
        # (the full 50-step buffer is tens of GB at 512²; the reference's
        # per-call torch.save never holds more than one step, daam/trace.py:246).
        def chunk_init(key):
            latents = init_latents(key)
            sched_state = scheduler.init_state(num_steps, latent_shape,
                                               jnp.float32)
            return latents, sched_state, make_acc()

        def sample_chunk(params, context, added, guidance_scale, carry, xs):
            step = make_step(params, context, added, guidance_scale,
                             carry[1]['timesteps'])
            return jax.lax.scan(step, carry, xs)

        def decode(params, latents):
            scaled = latents / self.config.vae.scaling_factor
            images = self.vae.apply({'params': params['vae']}, scaled,
                                    method=AutoencoderKL.decode)
            return jnp.clip(images / 2 + 0.5, 0.0, 1.0)

        use_tiling = (self.vae_tiling is True or
                      (self.vae_tiling == 'auto' and
                       max(latent_h, latent_w) > self.vae_tile_threshold))

        # Stage-level jit: text and decode keyed only by (B, H, W) so all
        # capture variants share their compilations.
        text_key = ('text', batch_size, height, width)
        decode_key = ('decode', batch_size, height, width)
        if text_key not in self._jit_cache:
            self._jit_cache[text_key] = jax.jit(encode_text)
        if decode_key not in self._jit_cache:
            if use_tiling:
                self._jit_cache[decode_key] = self._build_tiled_decode(
                    batch_size, latent_h, latent_w)
            else:
                self._jit_cache[decode_key] = jax.jit(decode)
        jit_text = self._jit_cache[text_key]
        jit_decode = self._jit_cache[decode_key]
        chunked = save_heads or load_heads or chunk_steps is not None
        if chunked:
            jit_chunk_init = jax.jit(chunk_init)
            jit_chunk = jax.jit(sample_chunk)
            jit_finalize = jax.jit(finalize_acc)
        else:
            jit_sample = jax.jit(sample)
        if snapshot_accs:
            # Per-chunk heat-map deltas (trace.time_chunk_steps): diff the
            # running in-kernel accumulators against the previous chunk
            # boundary and ship only the factor blocks to host (fp16) — the
            # cheap per-step-maps path; the probability tensors never
            # materialize (unlike save_heads).
            assert acc_mode, 'snapshot_accs requires in-kernel accumulation'

            def snap_diff(a, p):
                blocks = finalize_acc({n: a[n] - p[n] for n in a})
                return {f: b.astype(jnp.float16) for f, b in blocks.items()}
            jit_snap = jax.jit(snap_diff)

        def generate(params, input_ids, neg_input_ids, key, guidance_scale,
                     replay=None, step_callback=None):
            context, added = jit_text(params, input_ids, neg_input_ids)
            snaps = [] if snapshot_accs else None
            if not chunked:
                latents, accs = jit_sample(params, context, added, key,
                                           guidance_scale)
                saved = None
            else:
                C = max(1, int(chunk_steps or self.heads_chunk_steps))
                carry = jit_chunk_init(key)
                prev_accs = carry[2]
                saved_lists: Optional[Dict[str, list]] = None
                for start in range(0, scan_steps, C):
                    end = min(start + C, scan_steps)
                    idxs = jnp.arange(start, end)
                    if load_heads:
                        rep = {n: jnp.asarray(replay[n][start:end])
                               for n in replay}
                        xs = (idxs, rep)
                    else:
                        xs = idxs
                    carry, ys = jit_chunk(params, context, added,
                                          guidance_scale, carry, xs)
                    if save_heads:
                        if saved_lists is None:
                            saved_lists = {n: [] for n in ys}
                        for n, arr in ys.items():
                            saved_lists[n].append(fetch_global(arr))  # to host
                    if snapshot_accs:
                        snaps.append({f: fetch_global(b) for f, b in
                                      jit_snap(carry[2], prev_accs).items()})
                        prev_accs = carry[2]
                    if step_callback is not None:
                        # Live per-step callback at chunk granularity: fires
                        # DURING sampling with the real intermediate latents
                        # (reference contract daam/trace.py:61-62; opt in via
                        # callback_steps to keep the fused scan otherwise).
                        for i in range(start, end):
                            step_callback(i, None, carry[0])
                latents, _, accs = carry
                if acc_mode:
                    accs = jit_finalize(accs)
                saved = (None if saved_lists is None else
                         {n: np.concatenate(chunks, axis=0)
                          for n, chunks in saved_lists.items()})
            images = jit_decode(params, latents)
            return images, accs, saved, snaps

        return generate

    def _build_tiled_decode(self, batch_size: int, latent_h: int,
                            latent_w: int, tile: int = 64, overlap: int = 16):
        """Tiled VAE decode: one compiled program per tile shape, linear
        blending over the overlap bands.  Bounds the decoder's activation
        workspace for large (SDXL 1024-px) outputs; same technique as the SD
        ecosystem's tiled VAE (tiles attend only within themselves in the
        decoder's mid-block — visually negligible)."""
        import numpy as np_host

        sf = self.vae_scale_factor
        tile_h = min(tile, latent_h)
        tile_w = min(tile, latent_w)

        def positions(size, t):
            stride = max(t - overlap, 1)
            pos = list(range(0, max(size - t, 0) + 1, stride))
            if not pos or pos[-1] + t < size:
                pos.append(size - t)
            return sorted(set(p for p in pos if p >= 0))

        rows = positions(latent_h, tile_h)
        cols = positions(latent_w, tile_w)

        # Pixel-space blend ramp for one tile (edges that touch another tile
        # ramp linearly over overlap*sf pixels).
        def tile_weight(r, c):
            wy = np_host.ones(tile_h * sf, dtype=np_host.float32)
            wx = np_host.ones(tile_w * sf, dtype=np_host.float32)
            band = min(overlap, tile_h - 1, tile_w - 1) * sf
            ramp = (np_host.arange(band) + 1) / float(band + 1)
            if r != rows[0]:
                wy[:band] = ramp
            if r != rows[-1]:
                wy[-band:] = ramp[::-1]
            if c != cols[0]:
                wx[:band] = ramp
            if c != cols[-1]:
                wx[-band:] = ramp[::-1]
            return (wy[:, None] * wx[None, :])[None, :, :, None]

        grid = [(r, c) for r in rows for c in cols]
        weights = np_host.stack([tile_weight(r, c) for r, c in grid])

        @jax.jit
        def tiled_decode(params, latents):
            # One program: all tiles decode as a batch (workspace bounded by
            # the tile size), blend fused on device — no eager stitching.
            tiles = jnp.stack([latents[:, r:r + tile_h, c:c + tile_w]
                               for r, c in grid], axis=0)
            T = len(grid)
            tb = tiles.reshape(T * batch_size, tile_h, tile_w,
                               latents.shape[-1])
            scaled = tb / self.config.vae.scaling_factor
            imgs = self.vae.apply({'params': params['vae']}, scaled,
                                  method=AutoencoderKL.decode)
            imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
            imgs = imgs.reshape(T, batch_size, tile_h * sf, tile_w * sf, 3)

            H, W = latent_h * sf, latent_w * sf
            out = jnp.zeros((batch_size, H, W, 3), jnp.float32)
            norm = jnp.zeros((1, H, W, 1), jnp.float32)
            w_const = jnp.asarray(weights)
            for i, (r, c) in enumerate(grid):
                out = out.at[:, r * sf:(r + tile_h) * sf,
                             c * sf:(c + tile_w) * sf].add(imgs[i] * w_const[i])
                norm = norm.at[:, r * sf:(r + tile_h) * sf,
                               c * sf:(c + tile_w) * sf].add(w_const[i])
            return out / jnp.maximum(norm, 1e-8)

        return tiled_decode

    def enable_vae_tiling(self, enabled: bool = True):
        """Force tiled VAE decode on/off ('auto' enables it for latent edges
        above ``vae_tile_threshold``)."""
        self.vae_tiling = enabled
        self._jit_cache = {k: v for k, v in self._jit_cache.items()
                           if not (isinstance(k, tuple) and k and k[0] == 'decode')}

    def _merge_added(self, added_uncond, added_cond, height, width):
        return None  # SD has no added conditioning (SDXL overrides)

    def _map_grid_size(self) -> int:
        """Global heat-map grid: 64 for 512/1024-px models, 96 for 768
        (reference ``daam/trace.py:32-33``)."""
        image_size = self.config.image_size
        return 64 if image_size in (512, 1024) else 96

    def _acc_heads(self, info, q_len: int) -> int:
        """Head count of a layer's 'acc' accumulator: the real head count,
        plus the packed path's ghost head when this layer's cross-attention
        will run the packed kernel with an odd head count (the module and the
        allocation evaluate the same predicate; the ghost row is sliced off
        in ``finalize_acc``)."""
        from ..ops.attention import packed_eligible, packed_ghost_heads
        head_dim = (self.config.unet.block_out_channels[info.level]
                    // info.heads)
        if packed_eligible(info.heads, head_dim, q_len,
                           self.tokenizer.model_max_length, capture='acc'):
            return info.heads + packed_ghost_heads(info.heads)
        return info.heads

    # ------------------------------------------------------------------ call
    def __call__(self, prompt: Union[str, List[str]],
                 num_inference_steps: int = 50,
                 generator: Optional[jnp.ndarray] = None,
                 guidance_scale: Optional[float] = None,
                 negative_prompt: Union[str, List[str], None] = None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 callback=None, callback_steps: Optional[int] = None,
                 output_type: str = 'pil') -> PipelineOutput:
        tr = self._active_trace
        if tr is not None:
            tr._on_call_start(prompt)

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        if negative_prompt is None:
            negatives = [''] * B
        elif isinstance(negative_prompt, str):
            negatives = [negative_prompt] * B
        else:
            negatives = list(negative_prompt)

        height = height or self.config.image_size
        width = width or self.config.image_size
        if guidance_scale is None:
            guidance_scale = self.config.default_guidance_scale
        if generator is None:
            generator = jax.random.PRNGKey(0)

        capture_spec = tr.capture_spec(self) if tr is not None else None
        save_heads = bool(tr and tr.save_heads)
        load_heads = bool(tr and tr.load_heads)
        # Cheap per-chunk heat-map snapshots (trace.time_chunk_steps); the
        # save_heads replay buffer supersedes it (exact per-step maps).
        time_chunk = (tr.time_chunk_steps
                      if tr is not None and tr.time_chunk_steps and
                      not (save_heads or load_heads) else None)

        from ..parallel.mesh import get_active_mesh
        mesh = get_active_mesh()
        mesh_key = None if mesh is None else tuple(sorted(mesh.shape.items()))
        cache_key = (B, num_inference_steps, height, width, capture_spec,
                     save_heads and str(jnp.dtype(self.heads_dtype)),
                     load_heads, callback_steps, time_chunk, mesh_key)
        if cache_key not in self._jit_cache:
            self._jit_cache[cache_key] = self._build_generate(
                B, num_inference_steps, height, width,
                capture_spec=capture_spec, save_heads=save_heads,
                load_heads=load_heads,
                chunk_steps=time_chunk or callback_steps,
                snapshot_accs=time_chunk is not None)
        generate = self._jit_cache[cache_key]

        input_ids = self._encode_tokens(prompts)
        neg_ids = self._encode_tokens(negatives)

        kwargs = {}
        if load_heads:
            scan_steps = self.scheduler.num_scan_steps(num_inference_steps)
            replay = tr.replay_buffer(scan_steps)
            self._validate_replay(replay, B, height, width)
            kwargs['replay'] = replay
        if callback is not None and callback_steps is not None:
            kwargs['step_callback'] = callback
        images, accs, saved, snaps = generate(
            self.params, input_ids, neg_ids, generator,
            jnp.float32(guidance_scale), **kwargs)

        if output_type == 'pil':
            pil_images = _to_pil(_quantize_u8(images))
        else:  # 'np': float arrays in [0, 1] (reference/diffusers contract)
            pil_images = list(fetch_global(images))
        pil_images, nsfw_flags = self.run_safety_checker(pil_images, prompts)

        if tr is not None:
            # trace records the post-safety-checker images, like the
            # reference's hooked run_safety_checker (daam/trace.py:156-169)
            tr._on_call_end(prompts, pil_images, accs, saved,
                            num_inference_steps, time_blocks=snaps)
        if callback is not None and callback_steps is None:
            # Counter-style callbacks (e.g. trace.time_callback) fire after
            # the fused scan; pass callback_steps for live per-step calls.
            for i in range(num_inference_steps):
                callback(i, None, None)

        return PipelineOutput(images=pil_images,
                              nsfw_content_detected=nsfw_flags)

    def _validate_replay(self, replay, batch_size: int, height: int,
                         width: int):
        """Fail with a clear message when a saved replay buffer doesn't fit
        this generation's geometry (batch / spatial grid / context length) —
        the scan would otherwise die on an opaque shape error deep in jit."""
        layout = {info.name: info for info in
                  cross_attention_layout(self.config.unet)}
        latent_h = height // self.vae_scale_factor
        latent_w = width // self.vae_scale_factor
        T_ctx = self.tokenizer.model_max_length
        for name, arr in replay.items():
            info = layout.get(name)
            if info is None:
                raise RuntimeError(
                    f'Replay buffer layer {name!r} does not exist in this '
                    f'UNet ({len(layout)} cross-attention layers); the heads '
                    f'were saved from a different model.')
            want = (2 * batch_size, info.heads,
                    (latent_h // info.downscale) * (latent_w // info.downscale),
                    T_ctx)
            if tuple(arr.shape[1:]) != want:
                raise RuntimeError(
                    f'Replay buffer layer {name!r} has per-step shape '
                    f'{tuple(arr.shape[1:])} but this generation needs {want} '
                    f'(batch {batch_size}, {height}x{width}); save and load '
                    f'heads must use the same batch size and image size.')
        missing = [n for n, info in layout.items() if n not in replay]
        if missing:
            raise RuntimeError(
                f'Replay buffer is missing layers {missing[:4]}'
                f'{"..." if len(missing) > 4 else ""}; it was saved from a '
                f'different model or an incomplete save_heads run.')

    # ------------------------------------------------- reference-API helpers
    def run_safety_checker(self, images, prompts):
        """Apply the configured safety checker: flagged outputs become black
        images (reference checker behavior) and per-sample flags are returned
        (``None`` when no checker is configured)."""
        if self.safety_checker is None:
            return images, None

        def to_u8(im):
            a = np.asarray(im)
            if a.dtype != np.uint8:  # float [0,1] arrays (output_type='np')
                a = np.clip(a * 255 + 0.5, 0, 255).astype(np.uint8)
            return a

        flags = [bool(f) for f in
                 self.safety_checker([to_u8(im) for im in images],
                                     list(prompts))]
        out = []
        for im, flagged in zip(images, flags):
            if not flagged:
                out.append(im)
            elif isinstance(im, PIL.Image.Image):
                out.append(PIL.Image.fromarray(np.zeros_like(np.asarray(im))))
            else:
                out.append(np.zeros_like(im))
        return out, flags

    def check_inputs(self, prompt, *args, **kwargs):
        """Validation hook (patched by PipelineHooker in the reference,
        ``daam/trace.py:171-182``); batching is allowed here."""
        return None

    def numpy_to_pil(self, images):
        return _to_pil(images)


def _pipeline_class(config: PipelineConfig):
    if config.is_sdxl:
        from .sdxl import StableDiffusionXLPipeline
        return StableDiffusionXLPipeline
    return StableDiffusionPipeline
