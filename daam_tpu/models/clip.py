"""Flax CLIP text encoder (covers CLIP-L, OpenCLIP-H, OpenCLIP-bigG variants).

From-scratch implementation of the text transformer that conditions Stable
Diffusion (the reference delegates this to ``transformers`` — see reference
``daam/trace.py:127`` for where the tokenizer/text length surface matters).
Pre-LN transformer with causal masking; supports returning the penultimate
hidden state (SD2/SDXL convention) and a projected pooled embedding (SDXL's
second encoder).  All matmuls run in the requested dtype (bf16 on TPU).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import CLIPTextConfig

__all__ = ['CLIPTextEncoder']


def _activation(name: str):
    """Explicit dispatch on the HF activation-name taxonomy — a fallthrough
    here silently swaps exact and tanh-approximate gelu (~1e-3 drift per
    layer, the parity bug class the full-geometry tests exist to catch)."""
    if name == 'quick_gelu':                     # CLIP-L (SD1.x, SDXL #1)
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ('gelu', 'gelu_python'):          # OpenCLIP H/bigG: exact erf
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ('gelu_new', 'gelu_pytorch_tanh', 'gelu_fast'):
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f'unknown hidden_act {name!r}')


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        head_dim = d // h
        B, T, _ = x.shape

        q = nn.Dense(d, dtype=self.dtype, name='q_proj')(x)
        k = nn.Dense(d, dtype=self.dtype, name='k_proj')(x)
        v = nn.Dense(d, dtype=self.dtype, name='v_proj')(x)

        q = q.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k) * (head_dim ** -0.5)
        scores = scores + causal_mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        return nn.Dense(d, dtype=self.dtype, name='out_proj')(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        act = _activation(cfg.hidden_act)
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm1')(x)
        x = residual + CLIPAttention(cfg, dtype=self.dtype, name='self_attn')(x, causal_mask)
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm2')(x)
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name='fc1')(x)
        x = act(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name='fc2')(x)
        return residual + x


class CLIPTextEncoder(nn.Module):
    """Text transformer producing per-token hidden states for cross-attention.

    ``__call__`` returns ``(last_hidden_state, pooled)`` where ``pooled`` is
    the EOS-position hidden state (projected if ``config.projection_dim`` is
    set, as SDXL's second encoder requires).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, penultimate: bool = False,
                 eos_token_id: int = 49407):
        cfg = self.config
        B, T = input_ids.shape

        tok_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                           name='token_embedding')(input_ids)
        pos_emb = self.param('position_embedding',
                             nn.initializers.normal(0.01),
                             (cfg.max_position_embeddings, cfg.hidden_size))
        x = tok_emb + pos_emb[None, :T].astype(self.dtype)

        causal_mask = jnp.triu(
            jnp.full((T, T), jnp.finfo(jnp.float32).min, dtype=self.dtype), k=1)

        hidden_states = []
        for i in range(cfg.num_hidden_layers):
            hidden_states.append(x)
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f'layers_{i}')(x, causal_mask)

        final = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name='final_layer_norm')(x)

        # Pooled output = hidden state at the EOS position.  CLIP checkpoints
        # (eos_token_id == 2 configs) historically pool at argmax(input_ids) —
        # identical to first-EOS for the real vocab, where <|endoftext|>
        # (49407) is the maximum id — and HF preserves that behavior; we match
        # it bit-for-bit so converted checkpoints agree.
        if eos_token_id == 2:
            eos_idx = jnp.argmax(input_ids, axis=-1)
        else:
            eos_idx = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32),
                                 axis=-1)
        pooled = final[jnp.arange(B), eos_idx]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, name='text_projection')(pooled)

        # SDXL conditions on the penultimate hidden state (output of layer
        # N-1, i.e. the input to the last layer, without the final LN) — the
        # HF `hidden_states[-2]` convention.  SD2's 23-layer config is already
        # truncated, so it uses the normal final output.
        out = hidden_states[-1] if penultimate else final
        return out, pooled
