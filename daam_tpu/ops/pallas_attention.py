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
           'cross_attention_acc', 'cross_acc_shape',
           'flash_self_attention_packed', 'cross_attention_acc_packed']


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


def _attend_one_head(q, get_k, get_v, *, scale: float, l_valid: int, Lk: int):
    """softmax(q·kᵀ)·v for one head, fp32 result (un-cast).

    ``get_k(j, c)`` / ``get_v(j, c)`` load rows ``[j, j+c)`` of the key/value
    block from VMEM — an indirection so the same softmax pipeline serves both
    the head-major layout (full last dim) and the packed layout (64-lane
    slice of a 2-head 128-lane block).
    """
    ck = _ONLINE_CHUNK

    if Lk <= ck:
        # Small-K branch (incl. the padded 77-token cross contexts): one score
        # tile, two-pass softmax.  Nothing to pipeline at this size.
        k = get_k(0, Lk)        # (Lk, hd)
        v = get_v(0, Lk)
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
        return o / denom

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
        k = get_k(j, cj)
        v = get_v(j, cj)
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
    return acc / l


def _self_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_valid: int):
    q = q_ref[0]            # (TQ, hd)
    Lk = k_ref.shape[1]
    o = _attend_one_head(q,
                         lambda j, c: k_ref[0, j:j + c, :],
                         lambda j, c: v_ref[0, j:j + c, :],
                         scale=scale, l_valid=l_valid, Lk=Lk)
    o_ref[0] = o.astype(o_ref.dtype)


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
# packed-layout flash attention (two heads per program)
# ---------------------------------------------------------------------------
#
# The head-major kernels above require (B, H, L, hd) operands, so every
# attention pays four relayout copies against the projections' natural
# (B, L, H·hd) layout — measured 4.2 ms/step on the SDXL UNet (6.8% "data
# formatting" in the HLO profile).  Worse, hd = 64 arrays tile to (8, 128)
# lanes with HALF the lanes dead, doubling their HBM footprint.
#
# These kernels read the packed (B, L, H·hd) layout DIRECTLY.  Mosaic
# requires the last block dim to be a divisor-aligned 128 multiple, so one
# 64-lane head can't be a block — but TWO heads side by side are exactly 128
# lanes.  Each program lane-slices its two heads out of one dense block:
# no transpose ops anywhere, no dead lanes in HBM or VMEM.  Requires
# hd == 64 and an even head count (every SDXL level; SD2.1's 10/20-head
# levels — its 5-head level stays on the head-major path).


def _lane_masks(q2, hd: int):
    """Boolean masks selecting each head's 64 lanes of the 128-lane pair."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, q2.shape, 1)
    m0 = lanes < hd
    return m0, jnp.logical_not(m0)


def _self_attn_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             l_valid: int, hd: int):
    # Two heads side by side in one 128-lane block.  NO lane slicing: a
    # K=64 contraction only half-fills the MXU's 128-deep pipeline, so
    # contracting the FULL 128-lane pair with the other head's lanes zeroed
    # costs the same MXU time — (q2⊙m_h)·k2ᵀ = q_h·k_hᵀ — and keeps every
    # operand a dense full-width tile.  Same trick on the PV side:
    # p_h·v2 puts head h's output in its own 64 lanes (the other 64 get
    # p_h·v_{1-h}, masked away at the final select).
    q2 = q_ref[0]           # (TQ, 2*hd)
    Lk = k_ref.shape[1]
    m0, m1 = _lane_masks(q2, hd)
    zero = jnp.zeros((), q2.dtype)
    qs = [jnp.where(m0, q2, zero), jnp.where(m1, q2, zero)]
    ck = _ONLINE_CHUNK
    TQ = q2.shape[0]

    if Lk <= ck:
        k2 = k_ref[0]       # (Lk, 2*hd)
        v2 = v_ref[0]
        outs = []
        for qh in qs:
            s = jax.lax.dot_general(qh, k2, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if l_valid != Lk:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < l_valid, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v2.dtype), v2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o / denom)
        o_ref[0] = jnp.where(m0, outs[0], outs[1]).astype(o_ref.dtype)
        return

    # Online softmax over key chunks, both heads interleaved per chunk so
    # Mosaic overlaps each head's exp with the other's score matmul too.
    ms = [jnp.full((TQ, 1), -1e30, jnp.float32) for _ in range(2)]
    ls = [jnp.zeros((TQ, 1), jnp.float32) for _ in range(2)]
    accs = [jnp.zeros((TQ, 2 * hd), jnp.float32) for _ in range(2)]
    for j in range(0, Lk, ck):
        cj = min(ck, Lk - j)
        k2 = k_ref[0, j:j + cj, :]
        v2 = v_ref[0, j:j + cj, :]
        for h in range(2):
            s = jax.lax.dot_general(qs[h], k2, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if j + cj > l_valid:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j
                s = jnp.where(col < l_valid, s, -jnp.inf)
            m_new = jnp.maximum(ms[h], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(ms[h] - m_new)
            ls[h] = ls[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v2.dtype), v2,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            accs[h] = accs[h] * corr + pv
            ms[h] = m_new
    o_ref[0] = jnp.where(m0, accs[0] / ls[0],
                         accs[1] / ls[1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'q_tile'))
def flash_self_attention_packed(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, heads: int,
                                q_tile: Optional[int] = None) -> jnp.ndarray:
    """Flash attention on the packed ``(B, L, H·hd)`` projection layout.

    Equivalent to ``split -> flash_self_attention -> merge`` for ``hd == 64``
    and even ``heads``, with zero relayout copies: the q/k/v Dense outputs
    feed the kernel as-is and the result feeds ``to_out`` as-is.
    """
    B, L, C = q.shape
    Lk = k.shape[1]
    hd = C // heads
    assert hd * heads == C and hd == 64 and heads % 2 == 0, (heads, C)
    scale = hd ** -0.5
    if q_tile is None:
        # v5e in-situ sweep (scripts/probe_packed_attention.py): 512 wins on
        # both branches at SD/SDXL lengths.  Two heads per program double the
        # live online-softmax temporaries, so cap TQ·Lk at the largest
        # measured-good product (512·4096) to stay inside scoped VMEM for
        # longer sequences.
        q_tile = 512 if Lk > _ONLINE_CHUNK else 256
        while q_tile > 128 and q_tile * _round_up(Lk, 128) > 512 * 4096:
            q_tile //= 2

    Lk_pad = _round_up(Lk, 128)
    if Lk_pad != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lk_pad - Lk), (0, 0)))

    TQ = min(q_tile, _round_up(L, 8))
    L_pad = _round_up(L, TQ)
    if L_pad != L:
        q = jnp.pad(q, ((0, 0), (0, L_pad - L), (0, 0)))

    P = C // (2 * hd)       # head pairs
    grid = (B, P, L_pad // TQ)
    out = pl.pallas_call(
        functools.partial(_self_attn_packed_kernel, scale=scale,
                          l_valid=Lk, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, L_pad, C), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, 2 * hd), lambda b, p, i: (b, i, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, 2 * hd), lambda b, p, i: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, 2 * hd), lambda b, p, i: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, 2 * hd), lambda b, p, i: (b, i, p),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(q, k, v)

    return out[:, :L]


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


def _cross_attn_acc_packed_kernel(q_ref, k_ref, v_ref, acc_ref, o_ref,
                                  acc_out_ref, *, scale: float, lk_valid: int,
                                  lq_valid: int, q_tile: int, hd: int):
    q2 = q_ref[0]            # (TQ, 2*hd) — two heads side by side
    k2 = k_ref[0]            # (LK_pad, 2*hd)
    v2 = v_ref[0]
    m0, m1 = _lane_masks(q2, hd)
    zero = jnp.zeros((), q2.dtype)
    qs = [jnp.where(m0, q2, zero), jnp.where(m1, q2, zero)]
    outs = []
    for h in range(2):
        # Transposed scores (KQᵀ) with the full-width masked contraction (see
        # _self_attn_packed_kernel): k2·(q2⊙m_h)ᵀ = k_h·q_hᵀ.  Softmax runs
        # over the sublane axis and Pᵀ adds straight into the accumulator.
        s = jax.lax.dot_general(k2, qs[h], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(row < lk_valid, s, -jnp.inf)

        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=0, keepdims=True)
        p = p / denom        # (LK_pad, TQ); masked token rows exactly 0

        p_acc = p
        if lq_valid % q_tile:
            col = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) +
                   pl.program_id(2) * q_tile)
            p_acc = jnp.where(col < lq_valid, p, 0.0)

        acc_out_ref[0, h] = acc_ref[0, h] + p_acc
        # Pᵀᵀ·v2 puts head h's output in its own lanes (other lanes carry
        # p_h·v_{1-h}, discarded by the final select).
        outs.append(jax.lax.dot_general(p.astype(v2.dtype), v2,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    o_ref[0] = jnp.where(m0, outs[0], outs[1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'q_tile'))
def cross_attention_acc_packed(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, acc: jnp.ndarray, heads: int,
                               q_tile: int = 512
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`cross_attention_acc` on the packed ``(B, L, H·hd)`` layout.

    Same accumulator contract (``cross_acc_shape`` geometry, aliased
    in-place, pads exactly zero); the q/out relayout copies disappear.
    Requires ``hd == 64`` and even ``heads``.
    """
    B, Lq, C = q.shape
    Lk = k.shape[1]
    hd = C // heads
    assert hd * heads == C and hd == 64 and heads % 2 == 0, (heads, C)
    scale = hd ** -0.5

    Lk_pad = _round_up(Lk, 128)
    kf = jnp.pad(k, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, Lk_pad - Lk), (0, 0)))

    TQ = min(q_tile, _round_up(Lq, 8))
    Lq_pad = _round_up(Lq, TQ)
    qf = q
    if Lq_pad != Lq:
        qf = jnp.pad(q, ((0, 0), (0, Lq_pad - Lq), (0, 0)))
    assert acc.shape == (B, heads, Lk_pad, Lq_pad), \
        (acc.shape, (B, heads, Lk_pad, Lq_pad))

    P = heads // 2
    grid = (B, P, Lq_pad // TQ)
    out, acc_new = pl.pallas_call(
        functools.partial(_cross_attn_acc_packed_kernel, scale=scale,
                          lk_valid=Lk, lq_valid=Lq, q_tile=TQ, hd=hd),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq_pad, C), q.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, 2 * hd), lambda b, p, i: (b, i, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, 2 * hd), lambda b, p, i: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, 2 * hd), lambda b, p, i: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Lk_pad, TQ), lambda b, p, i: (b, p, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TQ, 2 * hd), lambda b, p, i: (b, i, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Lk_pad, TQ), lambda b, p, i: (b, p, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 1},
        interpret=_interpret(),
    )(qf, kf, vf, acc)

    return out[:, :Lq], acc_new
