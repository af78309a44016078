"""Pallas TPU attention kernels.

Two kernels, the performance core of the traced UNet (SURVEY.md §7):

* :func:`flash_self_attention` — spatial self-attention without materializing
  the (L, L) score matrix in HBM.  For SD's spatial lengths (≤ 4096 queries)
  the whole K/V block of one (batch, head) fits in VMEM, so each grid step
  computes one query tile's scores, softmax, and value contraction entirely
  on-chip: HBM sees only Q, K, V, O.  XLA alone would materialize
  softmax(QKᵀ) — ~67 MB per (head, layer) at 64², round-tripped twice.

* :func:`cross_attention_probs` — text cross-attention that emits the
  softmax probabilities as a fused side-output in one pass.  This is the
  kernel form of DAAM's capture: the reference recomputes attention outside
  the model to get the probs (``daam/trace.py:262-276``); here O and P come
  out of the same on-chip softmax.

* :func:`cross_attention_acc` — the production heat-map path: cross-attention
  that **accumulates Pᵀ into a running per-layer heat-map buffer in-kernel**
  (``input_output_aliases`` keeps it in place).  Scores are computed
  transposed (``KQᵀ``) so the accumulation needs no transpose op; the probs
  tensor never exists in HBM at all — per step the capture costs one fp32
  read+write of the accumulator instead of a probs write + XLA
  transpose/convert/add pass (reference hot loop ``daam/trace.py:276,293-294``).

All fall back to interpret mode off-TPU (tests run them on CPU).
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['flash_self_attention', 'flash_attention', 'cross_attention_probs',
           'cross_attention_acc', 'cross_acc_shape']


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ('tpu', 'axon')
    except RuntimeError:
        return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# flash self-attention
# ---------------------------------------------------------------------------

_ONLINE_CHUNK = 512      # key-axis chunk of the online-softmax branch


def _self_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_valid: int):
    q = q_ref[0]            # (TQ, hd)
    Lk = k_ref.shape[1]
    ck = _ONLINE_CHUNK

    if Lk <= ck:
        # Small-K branch (incl. the padded 77-token cross contexts): one score
        # tile, two-pass softmax.  Nothing to pipeline at this size.
        k = k_ref[0]        # (Lk, hd)
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if l_valid != Lk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < l_valid, s, -jnp.inf)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        # Normalize the (TQ, hd) output instead of the (TQ, L) probs: folding
        # 1/denom into the output makes the division L/hd times cheaper.
        # exp(s-m) is already in [0, 1], so the bf16 cast loses nothing vs
        # casting normalized probabilities.
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = (o / denom).astype(o_ref.dtype)
        return

    # Long-K branch: online softmax over key chunks (flash attention proper).
    # A two-pass softmax serializes the VPU exp pass behind the FULL score
    # matmul (exp needs the global row max), leaving the MXU idle during the
    # softmax; chunking makes exp of chunk j independent of the score matmul
    # of chunk j+1, so Mosaic's scheduler overlaps MXU and VPU across the
    # unrolled loop.  Measured on v5e: 0.616 -> 0.476 ms at (2,5,4096,64)
    # (69.7 -> 90.3 TF/s against the ~98 TF/s head_dim=64 ceiling).
    TQ, hd = q.shape
    m = jnp.full((TQ, 1), -1e30, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, hd), jnp.float32)
    for j in range(0, Lk, ck):
        cj = min(ck, Lk - j)
        k = k_ref[0, j:j + cj, :]
        v = v_ref[0, j:j + cj, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if j + cj > l_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j
            s = jnp.where(col < l_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('q_tile',))
def flash_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         q_tile: Optional[int] = None) -> jnp.ndarray:
    """softmax(QKᵀ/√d)V over (B, H, L, hd) without HBM score materialization.

    Works for any key length: short/unaligned K (e.g. the 77-token text
    context of an uncapture cross-attention half) is zero-padded to the TPU
    tile boundary and masked in-kernel.

    ``q_tile=None`` picks the measured-best tile per shape: 512 for the
    long-K online-softmax branch, 256 for the small-K two-pass branch
    (v5e in-situ sweep, ``scripts/probe_online_softmax.py``).
    """
    B, H, L, hd = q.shape
    Lk = k.shape[2]
    scale = hd ** -0.5
    if q_tile is None:
        q_tile = 512 if Lk > _ONLINE_CHUNK else 256

    qf = q.reshape(B * H, L, hd)
    kf = k.reshape(B * H, Lk, hd)
    vf = v.reshape(B * H, Lk, hd)
    Lk_pad = _round_up(Lk, 128)
    if Lk_pad != Lk:
        kf = jnp.pad(kf, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Lk_pad - Lk), (0, 0)))

    # Pad the query length to a tile multiple (extra rows are garbage we slice
    # off; they can't poison real rows since softmax is row-wise).
    TQ = min(q_tile, _round_up(L, 8))
    L_pad = _round_up(L, TQ)
    if L_pad != L:
        qf = jnp.pad(qf, ((0, 0), (0, L_pad - L), (0, 0)))

    grid = (B * H, L_pad // TQ)
    out = pl.pallas_call(
        functools.partial(_self_attn_kernel, scale=scale, l_valid=Lk),
        out_shape=jax.ShapeDtypeStruct((B * H, L_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qf, kf, vf)

    return out[:, :L].reshape(B, H, L, hd)


# Generic masked flash attention (any Lq/Lk); alias kept for call sites that
# use it for non-self attention (e.g. the uncaptured CFG half of cross-attn).
flash_attention = flash_self_attention


# ---------------------------------------------------------------------------
# cross-attention with fused probability side-output
# ---------------------------------------------------------------------------

def _cross_attn_kernel(q_ref, k_ref, v_ref, o_ref, p_ref, *, scale: float,
                       lk_valid: int, skip_probs_below: int):
    q = q_ref[0]            # (TQ, hd)
    k = k_ref[0]            # (LK_pad, hd)
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk_valid, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    # CFG batches lay out [uncond; cond]; DAAM only needs the conditional
    # half's probabilities — skip the HBM write for the rest.
    @pl.when(pl.program_id(0) >= skip_probs_below)
    def _():
        p_ref[0] = p.astype(p_ref.dtype)

    o_ref[0] = jax.lax.dot_general(p.astype(v.dtype), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('q_tile', 'cond_only',
                                             'probs_dtype'))
def cross_attention_probs(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          q_tile: int = 512, cond_only: bool = False,
                          probs_dtype=jnp.float32
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention returning ``(O, P)`` in one fused pass.

    ``q``: (B, H, Lq, hd); ``k``/``v``: (B, H, Lk, hd) with Lk = text length
    (77).  ``P`` comes back as (B, H, Lq, Lk) — the DAAM capture tensor.
    With ``cond_only`` (CFG layout [uncond; cond]) only the second half of the
    batch gets its probabilities written (the rest of P is unspecified) —
    halving the side-output bandwidth, which is the tracing overhead.
    """
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = hd ** -0.5

    LK_pad = _round_up(Lk, 128)
    qf = q.reshape(B * H, Lq, hd)
    kf = jnp.pad(k.reshape(B * H, Lk, hd), ((0, 0), (0, LK_pad - Lk), (0, 0)))
    vf = jnp.pad(v.reshape(B * H, Lk, hd), ((0, 0), (0, LK_pad - Lk), (0, 0)))

    TQ = min(q_tile, _round_up(Lq, 8))
    L_pad = _round_up(Lq, TQ)
    if L_pad != Lq:
        qf = jnp.pad(qf, ((0, 0), (0, L_pad - Lq), (0, 0)))

    skip_below = (B // 2) * H if cond_only else 0
    grid = (B * H, L_pad // TQ)
    out, probs = pl.pallas_call(
        functools.partial(_cross_attn_kernel, scale=scale, lk_valid=Lk,
                          skip_probs_below=skip_below),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, L_pad, LK_pad), probs_dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LK_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LK_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, LK_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(qf, kf, vf)

    out = out[:, :Lq].reshape(B, H, Lq, hd)
    probs = probs[:, :Lq, :Lk].reshape(B, H, Lq, Lk)
    return out, probs


# ---------------------------------------------------------------------------
# cross-attention with in-kernel heat-map accumulation
# ---------------------------------------------------------------------------

def cross_acc_shape(B: int, H: int, Lq: int, Lk: int,
                    q_tile: int = 512) -> Tuple[int, int, int, int]:
    """HBM layout of the per-layer heat-map accumulator fed to
    :func:`cross_attention_acc`: ``(B, H, Lk_pad, Lq_pad)`` fp32, i.e. Pᵀ
    summed over timesteps.  Token rows are padded to the 128-lane tile and
    query columns to the query-tile multiple; the pads stay exactly zero
    (softmax of masked rows is 0) and are sliced off at finalization."""
    Lk_pad = _round_up(Lk, 128)
    TQ = min(q_tile, _round_up(Lq, 8))
    Lq_pad = _round_up(Lq, TQ)
    return (B, H, Lk_pad, Lq_pad)


def _cross_attn_acc_kernel(q_ref, k_ref, v_ref, acc_ref, o_ref, acc_out_ref,
                           *, scale: float, lk_valid: int, lq_valid: int,
                           q_tile: int):
    q = q_ref[0, 0]          # (TQ, hd)
    k = k_ref[0, 0]          # (LK_pad, hd)
    v = v_ref[0, 0]

    # Scores computed TRANSPOSED (KQᵀ): softmax runs over the sublane axis and
    # Pᵀ drops straight into the accumulator — no transpose op anywhere.
    s = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row < lk_valid, s, -jnp.inf)

    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    p = p / denom            # (LK_pad, TQ); masked token rows are exactly 0

    p_acc = p
    if lq_valid % q_tile:
        # Zero-pad query columns so the accumulator's pad region stays exactly
        # zero (padded q rows otherwise softmax to uniform 1/Lk).
        col = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) +
               pl.program_id(2) * q_tile)
        p_acc = jnp.where(col < lq_valid, p, 0.0)

    acc_out_ref[0, 0] = acc_ref[0, 0] + p_acc
    o_ref[0, 0] = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('q_tile',))
def cross_attention_acc(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        acc: jnp.ndarray, q_tile: int = 512
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention that also returns ``acc + Pᵀ`` — the DAAM capture as a
    zero-copy kernel epilogue.

    ``q``: (B, H, Lq, hd); ``k``/``v``: (B, H, Lk, hd); ``acc``: the running
    heat-map buffer shaped :func:`cross_acc_shape`\\ ``(B, H, Lq, Lk)``, fp32.
    The accumulator is aliased in-place (``input_output_aliases``): across a
    sampling scan the heat-map side-channel costs one fp32 read+write of the
    accumulator per layer per step, with no probability tensor ever hitting
    HBM (the reference materializes the full probs every call,
    ``daam/trace.py:276``).
    """
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = hd ** -0.5

    Lk_pad = _round_up(Lk, 128)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, Lk_pad - Lk), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, Lk_pad - Lk), (0, 0)))

    TQ = min(q_tile, _round_up(Lq, 8))
    Lq_pad = _round_up(Lq, TQ)
    qf = q
    if Lq_pad != Lq:
        qf = jnp.pad(q, ((0, 0), (0, 0), (0, Lq_pad - Lq), (0, 0)))
    assert acc.shape == (B, H, Lk_pad, Lq_pad), (acc.shape, (B, H, Lk_pad, Lq_pad))

    grid = (B, H, Lq_pad // TQ)
    out, acc_new = pl.pallas_call(
        functools.partial(_cross_attn_acc_kernel, scale=scale, lk_valid=Lk,
                          lq_valid=Lq, q_tile=TQ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq_pad, hd), q.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TQ, hd), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_pad, hd), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_pad, hd), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_pad, TQ), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, TQ, hd), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk_pad, TQ), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 1},
        interpret=_interpret(),
    )(qf, kf, vf, acc)

    return out[:, :, :Lq], acc_new
