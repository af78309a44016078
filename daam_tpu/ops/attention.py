"""Attention ops: the compute core of the traced UNet.

Two ops matter for DAAM-on-TPU:

* :func:`self_attention` — the UNet's spatial self-attention (``attn1``).  The
  hot FLOPs.  Dispatches to a Pallas flash-attention kernel on TPU (no
  materialized QKᵀ) and a plain jnp path elsewhere.
* :func:`cross_attention` — text cross-attention (``attn2``), the layer DAAM
  instruments (reference recomputes and materializes the full probability
  tensor via ``attn.get_attention_scores``, ``daam/trace.py:276``).  Here the
  per-token probability map is a fused *side output*: when ``capture`` is on,
  the op also returns the conditional-half attention probabilities shaped for
  heat-map accumulation, and supports feeding back a replay buffer (the
  ``save_heads``/``load_heads`` transplant mechanism, ``daam/trace.py:279-282``).

All inputs are multi-head shaped ``(B, H, L, head_dim)``.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ['self_attention', 'cross_attention', 'attention_probs_reference',
           'packed_eligible', 'packed_ghost_heads', 'self_attention_packed',
           'cross_attention_packed']

# Kernel dispatch mode: 'auto' | 'jnp' | 'pallas'.  Tests flip this.
_KERNEL_MODE = 'auto'

# Odd head counts through the packed path (one zero ghost head padded at the
# weight level).  Numerically exact but measured SLOWER than the head-major
# fallback on the real chip (scripts/probe_ghost_head.py, v2-1-base UNet step,
# HLO device self-time: packed 17.17 ms vs fallback 16.95 ms, -0.22 ms/step) —
# the ghost head's sixth 64-lane slice buys back less than the relayout
# copies cost on a 5-head level.  Off by default; kept opt-in for the probe
# and for future geometries where the trade may flip.
import os as _os

_ODD_PACKED = _os.environ.get('DAAM_ODD_PACKED', '') == '1'


def set_odd_packed(enabled: bool):
    global _ODD_PACKED
    _ODD_PACKED = bool(enabled)


def get_odd_packed() -> bool:
    return _ODD_PACKED


def set_kernel_mode(mode: str):
    global _KERNEL_MODE
    assert mode in ('auto', 'jnp', 'pallas')
    _KERNEL_MODE = mode


def get_kernel_mode() -> str:
    return _KERNEL_MODE


def _use_pallas(q_len: int, k_len: int, head_dim: int) -> bool:
    if _KERNEL_MODE == 'jnp':
        return False
    try:
        on_tpu = jax.default_backend() in ('tpu', 'axon')
    except RuntimeError:
        on_tpu = False
    if _KERNEL_MODE == 'pallas':
        return True
    # auto: pallas only where it wins — long sequences, MXU-aligned head dims.
    return on_tpu and q_len >= 1024 and head_dim % 64 == 0


def attention_probs_reference(q: jnp.ndarray, k: jnp.ndarray,
                              scale: Optional[float] = None) -> jnp.ndarray:
    """Softmax attention probabilities, fp32 — the numeric reference the
    Pallas side-output is gated against (≥0.99 Spearman, BASELINE.md)."""
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5 if scale is None else scale
    scores = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    return jax.nn.softmax(scores, axis=-1)


def _jnp_attention(q, k, v, scale):
    probs = attention_probs_reference(q, k, scale)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v), probs


def self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Spatial self-attention ``softmax(QKᵀ/√d)V``; flash kernel on TPU."""
    if _use_pallas(q.shape[2], k.shape[2], q.shape[3]):
        from .pallas_attention import flash_self_attention
        return flash_self_attention(q, k, v)
    out, _ = _jnp_attention(q, k, v, q.shape[-1] ** -0.5)
    return out


def packed_eligible(heads: int, head_dim: int, q_len: int, k_len: int,
                    capture=False, replay: bool = False) -> bool:
    """True when the packed-layout kernels can serve this attention.

    The packed kernels (:func:`~daam_tpu.ops.pallas_attention.flash_self_attention_packed`)
    read the (B, L, H·hd) projection layout directly — two 64-wide heads per
    128-lane block — eliminating the four (B,L,H,hd)↔(B,H,L,hd) relayout
    copies per attention (4.2 ms/step on the SDXL UNet).  Requires hd == 64,
    an even head count (or the :func:`set_odd_packed` opt-in — odd counts
    *can* run packed via one weight-level ghost head, see
    :func:`packed_ghost_heads` / ``models.unet.PadDense``, but measured
    slower on chip than the head-major fallback; module comment above), the
    Pallas path, and (for cross-attention) a capture mode the packed
    accumulator kernel implements.
    """
    if head_dim != 64:
        return False
    if heads % 2 and not _ODD_PACKED:
        return False
    if replay:
        return False
    if capture not in (False, 'acc'):
        return False
    return _use_pallas(q_len, k_len, head_dim)


def packed_ghost_heads(heads: int) -> int:
    """Ghost heads the packed path pads an odd head count with (0 or 1).

    The packed kernels pair two 64-wide heads per 128-lane block, so an odd
    head count gets one all-zero ghost head appended: zero q/k makes the
    ghost's scores uniform and zero v makes its output exactly 0, so the
    ghost never affects real lanes; its (garbage-uniform) accumulator row is
    sliced off at heat-map finalization."""
    return heads % 2


def self_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          heads: int) -> jnp.ndarray:
    """Self-attention on packed ``(B, L, H·hd)`` operands (see
    :func:`packed_eligible`); output comes back packed."""
    from .pallas_attention import flash_self_attention_packed
    return flash_self_attention_packed(q, k, v, heads)


def cross_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           heads: int, capture=False,
                           acc: Optional[jnp.ndarray] = None
                           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Cross-attention on packed operands; supports ``capture`` in
    ``{False, 'acc'}`` (the production paths — :func:`packed_eligible` gates
    everything else back to the head-major pipeline)."""
    from .pallas_attention import (cross_attention_acc_packed,
                                   flash_self_attention_packed)
    if capture == 'acc':
        assert acc is not None, "capture='acc' requires the accumulator"
        Bc = q.shape[0] // 2  # CFG layout [uncond; cond]
        out_u = flash_self_attention_packed(q[:Bc], k[:Bc], v[:Bc], heads)
        out_c, acc_new = cross_attention_acc_packed(q[Bc:], k[Bc:], v[Bc:],
                                                    acc, heads)
        return jnp.concatenate([out_u, out_c], axis=0), acc_new
    assert capture is False
    return flash_self_attention_packed(q, k, v, heads), None


def _acc_update_jnp(acc: jnp.ndarray, probs_cond: jnp.ndarray) -> jnp.ndarray:
    """Reference accumulator update: ``acc + Pᵀ`` with zero-padding to the
    accumulator's tile-padded (Lk_pad, Lq_pad) trailing dims.  Numerically
    defines what the Pallas kernel must produce."""
    Bc, H, Lq, Lk = probs_cond.shape
    pt = probs_cond.astype(jnp.float32).transpose(0, 1, 3, 2)  # (Bc,H,Lk,Lq)
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, acc.shape[2] - Lk),
                      (0, acc.shape[3] - Lq)))
    return acc + pt


def cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    capture=False,
    replay_probs: Optional[jnp.ndarray] = None,
    acc: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Text cross-attention with optional probability side-output / replay.

    ``capture`` ∈ {False, 'cond', 'acc', 'full', True}.  Returns
    ``(out, probs)`` where ``probs`` is the probability tensor
    ``(B, H, Lq, Lk)`` when capturing (else ``None``).

    ``'acc'`` is the production heat-map path: ``acc`` (the running per-layer
    accumulator, see :func:`~daam_tpu.ops.pallas_attention.cross_acc_shape`)
    is updated with the conditional CFG half's ``Pᵀ`` and returned in the
    probs slot — on TPU the update happens inside the attention kernel and no
    probability tensor ever reaches HBM.  ``'cond'`` captures the conditional
    half's probs in bf16; ``'full'``/``True`` captures every row (needed for
    ``save_heads`` replay).  When ``replay_probs`` is given, it *replaces* the
    computed probabilities before the value contraction — the
    attention-transplant counterfactual (reference ``daam/trace.py:281-282``).
    """
    scale = q.shape[-1] ** -0.5
    if capture is True:
        capture = 'full'

    if capture == 'acc':
        assert acc is not None, "capture='acc' requires the accumulator"
        Bc = q.shape[0] // 2  # CFG layout [uncond; cond]
        if replay_probs is not None:
            probs = replay_probs.astype(jnp.float32)
            out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v)
            return out, _acc_update_jnp(acc, probs[Bc:])
        if _use_pallas(q.shape[2], k.shape[2], q.shape[3]):
            from .pallas_attention import cross_attention_acc, flash_attention
            out_u = flash_attention(q[:Bc], k[:Bc], v[:Bc])
            out_c, acc_new = cross_attention_acc(q[Bc:], k[Bc:], v[Bc:], acc)
            return jnp.concatenate([out_u, out_c], axis=0), acc_new
        out, probs = _jnp_attention(q, k, v, scale)
        return out, _acc_update_jnp(acc, probs[Bc:])

    if replay_probs is not None:
        probs = replay_probs.astype(jnp.float32)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v)
        return out, (probs if capture else None)

    if capture and _use_pallas(q.shape[2], k.shape[2], q.shape[3]):
        from .pallas_attention import cross_attention_probs
        return cross_attention_probs(
            q, k, v, cond_only=(capture == 'cond'),
            probs_dtype=jnp.bfloat16 if capture == 'cond' else jnp.float32)

    if capture or not _use_pallas(q.shape[2], k.shape[2], q.shape[3]):
        out, probs = _jnp_attention(q, k, v, scale)
        if capture == 'cond':
            probs = probs.astype(jnp.bfloat16)
        return out, (probs if capture else None)

    from .pallas_attention import flash_self_attention
    return flash_self_attention(q, k, v), None
