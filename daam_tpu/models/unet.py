"""Flax UNet2DCondition — the denoiser, built TPU-first.

From-scratch implementation of the SD-family conditional UNet (SD 1.5 / 2.x /
SDXL topologies via :class:`~daam_tpu.models.configs.UNetConfig`).  Key design
points for TPU:

* NHWC layout throughout (XLA's native conv layout on TPU).
* Attention runs through :mod:`daam_tpu.ops.attention` — self-attention hits
  the Pallas flash kernel; cross-attention supports the fused probability
  side-output that replaces the reference's monkey-patched processor
  (reference ``daam/trace.py:252-304``).
* Tracing is a *function argument*, not object surgery: ``capture=True``
  makes ``__call__`` return ``(eps, {layer_name: probs})``; ``replay`` feeds
  probabilities back in (the ``save_heads``/``load_heads`` transplant of
  reference ``daam/trace.py:279-282``).  Both are jit-stable.
* ``cross_attention_layout`` enumerates cross-attn layers in the reference
  locator's order (up → down → mid, reference ``daam/hook.py:110-114``) so
  global layer indices match the reference's ``layer_idx`` semantics.
"""

import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (cross_attention, cross_attention_packed,
                             packed_eligible, packed_ghost_heads,
                             self_attention, self_attention_packed)
from ..parallel.mesh import constraint as shard_constraint
from .configs import UNetConfig

__all__ = ['UNet2DConditionModel', 'CrossAttnLayerInfo', 'cross_attention_layout',
           'timestep_embedding']


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (standard DDPM formulation)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name='linear_1')(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name='linear_2')(x)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype,
                         name='norm1')(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv1')(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name='time_emb_proj')(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype,
                         name='norm2')(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv2')(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class PadDense(nn.Module):
    """``nn.Dense``-compatible projection (identical param tree and numerics)
    that can zero-pad the kernel's output columns (``lanes_pad``) or input
    rows (``rows_pad``) at call time.

    This is how the packed attention path serves odd head counts (SD2.1's
    5-head level): padding the *weight* makes the projection matmul write the
    even-head packed layout directly — the ghost head costs a ~100 KB weight
    pad instead of a multi-MB activation pad/slice copy per attention.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lanes_pad: int = 0, rows_pad: int = 0):
        in_features = x.shape[-1] - rows_pad
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_features, self.features))
        kernel = jnp.asarray(kernel, self.dtype)
        if rows_pad:
            kernel = jnp.pad(kernel, ((0, rows_pad), (0, 0)))
        if lanes_pad:
            kernel = jnp.pad(kernel, ((0, 0), (0, lanes_pad)))
        y = jax.lax.dot_general(jnp.asarray(x, self.dtype), kernel,
                                (((x.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            bias = jnp.asarray(bias, self.dtype)
            if lanes_pad:
                bias = jnp.pad(bias, ((0, lanes_pad),))
            y = y + bias
        return y


class Attention(nn.Module):
    """Multi-head attention over flattened spatial tokens.

    ``is_cross`` selects the text cross-attention path with the DAAM
    capture/replay contract; self-attention goes through the flash kernel.
    """

    heads: int
    dim: int                 # inner dim (= query dim)
    is_cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, capture: bool = False,
                 replay_probs: Optional[jnp.ndarray] = None,
                 acc: Optional[jnp.ndarray] = None):
        B, L, _ = x.shape
        context = x if context is None else context
        head_dim = self.dim // self.heads

        packed = packed_eligible(self.heads, head_dim, L, context.shape[1],
                                 capture=capture if self.is_cross else False,
                                 replay=replay_probs is not None)
        # Odd head counts pad one all-zero ghost head at the weight level so
        # the projections emit the even-head packed layout directly.
        ghost = packed_ghost_heads(self.heads) * head_dim if packed else 0

        q = PadDense(self.dim, use_bias=False, dtype=self.dtype,
                     name='to_q')(x, lanes_pad=ghost)
        k = PadDense(self.dim, use_bias=False, dtype=self.dtype,
                     name='to_k')(context, lanes_pad=ghost)
        v = PadDense(self.dim, use_bias=False, dtype=self.dtype,
                     name='to_v')(context, lanes_pad=ghost)

        if packed:
            # Packed path: the kernels read the (B, L, H·hd) Dense layout
            # directly (two heads per 128-lane block) — no relayout copies.
            # Head parallelism shards the packed channel axis over 'model'
            # (heads are contiguous 64-wide column blocks, so this is the
            # same head sharding as below).
            heads_pad = self.heads + packed_ghost_heads(self.heads)
            q = shard_constraint(q, 'data', None, 'model')
            k = shard_constraint(k, 'data', None, 'model')
            v = shard_constraint(v, 'data', None, 'model')
            probs = None
            if self.is_cross:
                out, probs = cross_attention_packed(q, k, v, heads_pad,
                                                    capture=capture, acc=acc)
            else:
                out = self_attention_packed(q, k, v, heads_pad)
            out = PadDense(self.dim, dtype=self.dtype,
                           name='to_out')(out, rows_pad=ghost)
            return out, probs

        def split(t):
            return t.reshape(B, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # Multi-chip: batch shards over 'data', attention heads over 'model'
        # (tensor parallelism); GSPMD inserts the collectives.
        q = shard_constraint(q, 'data', 'model', None, None)
        k = shard_constraint(k, 'data', 'model', None, None)
        v = shard_constraint(v, 'data', 'model', None, None)

        probs = None
        if self.is_cross:
            out, probs = cross_attention(q, k, v, capture=capture,
                                         replay_probs=replay_probs, acc=acc)
        else:
            out = self_attention(q, k, v)

        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name='to_out')(out)
        return out, probs


class FeedForward(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # GEGLU: project to 2*4*dim, gate with exact (erf) gelu — diffusers'
        # GEGLU uses F.gelu's exact form; the tanh approximation drifts ~1e-3.
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name='proj_in')(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj_out')(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, capture=False, replay_probs=None, acc=None):
        h, _ = Attention(self.heads, self.dim, is_cross=False, dtype=self.dtype,
                         name='attn1')(nn.LayerNorm(dtype=self.dtype, name='norm1')(x))
        x = x + h
        h, probs = Attention(self.heads, self.dim, is_cross=True, dtype=self.dtype,
                             name='attn2')(
            nn.LayerNorm(dtype=self.dtype, name='norm2')(x), context,
            capture=capture, replay_probs=replay_probs, acc=acc)
        x = x + h
        x = x + FeedForward(self.dim, dtype=self.dtype, name='ff')(
            nn.LayerNorm(dtype=self.dtype, name='norm3')(x))
        return x, probs


class Transformer2DModel(nn.Module):
    """Spatial transformer: flatten HW, run text-conditioned blocks, unflatten."""

    heads: int
    depth: int
    use_linear_projection: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, capture=False, replay: Optional[Dict] = None,
                 acc: Optional[Dict] = None, name_prefix: str = ''):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm')(x).astype(self.dtype)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, dtype=self.dtype, name='proj_in')(h)
        else:
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name='proj_in')(h)
            h = h.reshape(B, H * W, C)

        probs_out = {}
        for d in range(self.depth):
            layer_name = f'{name_prefix}.{d}' if self.depth > 1 else name_prefix
            rp = replay.get(layer_name) if replay else None
            layer_acc = acc.get(layer_name) if acc else None
            # acc mode: layers outside the capture plan (factor-8, reference
            # daam/trace.py:289) have no accumulator — run them uncaptured.
            layer_capture = capture
            if capture == 'acc' and layer_acc is None:
                layer_capture = False
            h, probs = BasicTransformerBlock(
                dim=C, heads=self.heads, dtype=self.dtype,
                name=f'transformer_blocks_{d}')(h, context,
                                                capture=layer_capture,
                                                replay_probs=rp, acc=layer_acc)
            if capture and probs is not None:
                probs_out[layer_name] = probs

        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name='proj_out')(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name='proj_out')(h)
        return h + residual, probs_out


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype, name='conv')(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name='conv')(x)


class CrossAttnLayerInfo(NamedTuple):
    name: str          # UNet-internal layer name (replay/capture key)
    layer_idx: int     # global DAAM layer index (reference locator order)
    position: str      # 'up' | 'down' | 'mid'
    level: int         # resolution level in the UNet
    heads: int
    downscale: int     # spatial downscale vs latent grid (1, 2, 4, 8)


def _level_layer_names(config: UNetConfig, position: str, level: int) -> List[str]:
    """Capture-key names of cross-attn transformer blocks at one level."""
    depth = config.transformer_layers_per_block[level]
    n_attn = config.layers_per_block if position == 'down' else config.layers_per_block + 1
    if position == 'mid':
        n_attn = 1
    names = []
    for i in range(n_attn):
        base = f'{position}_{level}_{i}' if position != 'mid' else 'mid_0'
        if depth > 1:
            names.extend(f'{base}.{d}' for d in range(depth))
        else:
            names.append(base)
    return names


def cross_attention_layout(config: UNetConfig) -> List[CrossAttnLayerInfo]:
    """All cross-attention layers in reference locator order (up → down → mid,
    reference ``daam/hook.py:110-114``), with global layer indices."""
    infos: List[CrossAttnLayerInfo] = []
    n_levels = len(config.block_out_channels)

    def add(position, level):
        depth = max(config.transformer_layers_per_block[level], 1)
        heads = config.attention_head_dim[level]
        downscale = 2 ** level
        for name in _level_layer_names(config, position, level):
            infos.append(CrossAttnLayerInfo(name, -1, position, level, heads, downscale))

    # Reference order: up blocks in *model* order (deepest level first,
    # ``model.up_blocks[0]`` is the lowest resolution), then down blocks
    # (finest first), then mid (``daam/hook.py:110-114``).
    for level in reversed(range(n_levels)):
        if config.up_block_types[level] == 'cross':
            add('up', level)
    for level in range(n_levels):
        if config.down_block_types[level] == 'cross':
            add('down', level)
    if config.mid_block_attn:
        # mid block sits at the deepest level
        depth = max(config.transformer_layers_per_block[-1], 1)
        heads = config.attention_head_dim[-1]
        downscale = 2 ** (n_levels - 1)
        base = 'mid_0'
        names = [f'{base}.{d}' for d in range(depth)] if depth > 1 else [base]
        for name in names:
            infos.append(CrossAttnLayerInfo(name, -1, 'mid', n_levels - 1, heads, downscale))

    return [info._replace(layer_idx=i) for i, info in enumerate(infos)]


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 added_cond: Optional[Dict[str, jnp.ndarray]] = None,
                 capture: bool = False, replay: Optional[Dict] = None,
                 acc: Optional[Dict] = None):
        """Denoise ``sample`` (B, H, W, C latents, NHWC).

        Returns ``(eps_prediction, attn_probs)`` where ``attn_probs`` maps
        cross-attn layer names to ``(B, heads, hw, text_len)`` fp32
        probabilities (empty dict unless ``capture``).  With
        ``capture='acc'``, ``acc`` maps layer names to running heat-map
        accumulators (:func:`~daam_tpu.ops.pallas_attention.cross_acc_shape`
        layout) and the returned dict holds their updated values — the
        in-kernel form of the reference's per-call capture
        (``daam/trace.py:252-304``).
        """
        cfg = self.config
        groups = cfg.norm_num_groups
        ch0 = cfg.block_out_channels[0]

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = timestep_embedding(timesteps, ch0, cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = jnp.broadcast_to(temb, (sample.shape[0], temb.shape[-1]))
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name='time_embedding')(temb)

        if cfg.addition_embed_type == 'text_time':
            assert added_cond is not None, 'SDXL requires added_cond (text_embeds, time_ids)'
            text_embeds = added_cond['text_embeds']           # (B, pooled_dim)
            time_ids = added_cond['time_ids']                 # (B, 6)
            tid = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim,
                                     cfg.flip_sin_to_cos, cfg.freq_shift)
            tid = tid.reshape(sample.shape[0], -1)
            add_emb = jnp.concatenate([text_embeds, tid], axis=-1)
            temb = temb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                            name='add_embedding')(add_emb.astype(self.dtype))

        context = encoder_hidden_states.astype(self.dtype)
        probs_out: Dict[str, jnp.ndarray] = {}

        h = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name='conv_in')(sample.astype(self.dtype))
        # Spatial parallelism: latent rows shard over 'spatial' (size-1 axis
        # = no-op).  Anchoring the NHWC feature maps here and at each
        # resolution change lets GSPMD propagate the sharding through the
        # whole level and insert the 3x3-conv halo exchanges itself.
        h = shard_constraint(h, 'data', 'spatial', None, None)

        # ---- down path ----
        skips = [h]
        for level, ch in enumerate(cfg.block_out_channels):
            is_cross = cfg.down_block_types[level] == 'cross'
            depth = cfg.transformer_layers_per_block[level]
            for i in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, groups=groups, dtype=self.dtype,
                                  name=f'down_{level}_resnet_{i}')(h, temb)
                if is_cross and depth > 0:
                    h, p = Transformer2DModel(
                        cfg.attention_head_dim[level], depth,
                        cfg.use_linear_projection, groups=groups, dtype=self.dtype,
                        name=f'down_{level}_attn_{i}')(
                            h, context, capture=capture, replay=replay,
                            acc=acc, name_prefix=f'down_{level}_{i}')
                    probs_out.update(p)
                skips.append(h)
            if level < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype,
                                 name=f'down_{level}_downsample')(h)
                h = shard_constraint(h, 'data', 'spatial', None, None)
                skips.append(h)

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, groups=groups, dtype=self.dtype,
                          name='mid_resnet_0')(h, temb)
        if cfg.mid_block_attn:
            depth = max(cfg.transformer_layers_per_block[-1], 1)
            h, p = Transformer2DModel(
                cfg.attention_head_dim[-1], depth, cfg.use_linear_projection,
                groups=groups, dtype=self.dtype, name='mid_attn_0')(
                    h, context, capture=capture, replay=replay, acc=acc,
                    name_prefix='mid_0')
            probs_out.update(p)
        h = ResnetBlock2D(mid_ch, groups=groups, dtype=self.dtype,
                          name='mid_resnet_1')(h, temb)

        # ---- up path ----
        for level in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[level]
            is_cross = cfg.up_block_types[level] == 'cross'
            depth = cfg.transformer_layers_per_block[level]
            for i in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch, groups=groups, dtype=self.dtype,
                                  name=f'up_{level}_resnet_{i}')(h, temb)
                if is_cross and depth > 0:
                    h, p = Transformer2DModel(
                        cfg.attention_head_dim[level], depth,
                        cfg.use_linear_projection, groups=groups, dtype=self.dtype,
                        name=f'up_{level}_attn_{i}')(
                            h, context, capture=capture, replay=replay,
                            acc=acc, name_prefix=f'up_{level}_{i}')
                    probs_out.update(p)
            if level > 0:
                h = Upsample2D(ch, dtype=self.dtype,
                               name=f'up_{level}_upsample')(h)
                h = shard_constraint(h, 'data', 'spatial', None, None)

        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype,
                         name='conv_norm_out')(h)
        h = nn.silu(h).astype(self.dtype)
        eps = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=jnp.float32, name='conv_out')(h)
        return eps, probs_out
