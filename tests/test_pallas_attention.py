"""Pallas kernel parity vs the naive jnp reference (interpret mode on CPU).

The numerics gate from BASELINE.md: the kernel's probability side-output must
match the reference softmax at ≥0.99 Spearman (we additionally check allclose).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from daam_tpu.ops.attention import attention_probs_reference
from daam_tpu.ops.pallas_attention import (cross_attention_probs,
                                           flash_self_attention)


def _rand_qkv(B, H, Lq, Lk, hd, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, Lq, hd).astype(dtype)
    k = rng.randn(B, H, Lk, hd).astype(dtype)
    v = rng.randn(B, H, Lk, hd).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _reference_out(q, k, v):
    p = attention_probs_reference(q, k)
    return jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v), p


def spearman(a, b):
    from scipy.stats import spearmanr
    return spearmanr(np.asarray(a).ravel(), np.asarray(b).ravel()).statistic


@pytest.mark.parametrize('L,hd', [(64, 64), (256, 64), (100, 64), (256, 128)])
def test_flash_self_attention_matches_reference(L, hd):
    q, k, v = _rand_qkv(2, 2, L, L, hd)
    ref, _ = _reference_out(q, k, v)
    out = flash_self_attention(q, k, v, q_tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('Lq,Lk', [(2048, 2048), (2048, 1157), (512, 1536)])
def test_flash_self_attention_online_branch(Lq, Lk):
    """Long-K shapes route through the online-softmax branch (chunked key
    loop, `_ONLINE_CHUNK`); unaligned Lk exercises the masked last chunk."""
    q, k, v = _rand_qkv(1, 2, Lq, Lk, 64)
    ref, _ = _reference_out(q, k, v)
    out = flash_self_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_self_attention_bf16():
    q, k, v = _rand_qkv(1, 2, 128, 128, 64)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ref, _ = _reference_out(q, k, v)
    out = flash_self_attention(q, k, v, q_tile=64)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize('Lq,Lk', [(64, 77), (256, 77), (100, 77), (64, 13)])
def test_cross_attention_probs_matches_reference(Lq, Lk):
    q, k, v = _rand_qkv(2, 2, Lq, Lk, 64, seed=1)
    ref_out, ref_p = _reference_out(q, k, v)
    out, p = cross_attention_probs(q, k, v, q_tile=64)
    assert p.shape == ref_p.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p),
                               rtol=2e-3, atol=2e-3)
    # probability rows sum to 1 (padded keys masked out)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-4)


def test_cross_attention_probs_spearman_gate():
    """The BASELINE.md fidelity gate: ≥0.99 Spearman vs the naive path."""
    q, k, v = _rand_qkv(2, 4, 256, 77, 64, seed=2)
    _, ref_p = _reference_out(q, k, v)
    _, p = cross_attention_probs(q, k, v)
    rho = spearman(p, ref_p)
    assert rho >= 0.99, rho


# ---------------------------------------------------------------------------
# production capture paths (VERDICT r1: cover the kernels the TPU actually runs)
# ---------------------------------------------------------------------------

def test_cross_attention_probs_cond_only_bf16():
    """The bf16 cond-half kernel path: CFG layout [uncond; cond], only the
    conditional rows carry defined probabilities; grid must be b-major for
    the skip_probs_below cutoff."""
    B, H, Lq, Lk = 4, 2, 64, 77  # B=4 -> cond half is rows 2:
    q, k, v = _rand_qkv(B, H, Lq, Lk, 64, seed=3)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref_out, ref_p = _reference_out(q, k, v)
    out, p = cross_attention_probs(q, k, v, q_tile=32, cond_only=True,
                                   probs_dtype=jnp.bfloat16)
    assert p.dtype == jnp.bfloat16
    # output O is defined for ALL rows
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref_out, dtype=np.float32),
                               rtol=3e-2, atol=3e-2)
    # conditional-half probs match the reference softmax
    np.testing.assert_allclose(np.asarray(p[B // 2:], dtype=np.float32),
                               np.asarray(ref_p[B // 2:], dtype=np.float32),
                               rtol=3e-2, atol=1e-2)
    rho = spearman(p[B // 2:].astype(jnp.float32), ref_p[B // 2:])
    assert rho >= 0.99, rho


def _acc_reference(acc, probs):
    """acc + P^T with tile padding (the kernel's contract)."""
    B, H, Lq, Lk = probs.shape
    pt = np.transpose(np.asarray(probs, dtype=np.float32), (0, 1, 3, 2))
    out = np.asarray(acc).copy()
    out[:, :, :Lk, :Lq] += pt
    return out


@pytest.mark.parametrize('Lq,tile', [(64, 32), (40, 16), (256, 64)])
def test_cross_attention_acc_matches_reference(Lq, tile):
    """In-kernel heat-map accumulation: O matches attention, acc gains P^T,
    pad rows/cols stay zero.  (40, 16) exercises Lq % tile != 0 padding."""
    from daam_tpu.ops.pallas_attention import cross_attention_acc, cross_acc_shape

    B, H, Lk, hd = 2, 3, 77, 64
    q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=4)
    rng = np.random.RandomState(5)
    acc0 = jnp.asarray(rng.rand(*cross_acc_shape(B, H, Lq, Lk, q_tile=tile))
                       .astype(np.float32))
    # zero the pad region so we can assert it stays zero
    Lk_pad, Lq_pad = acc0.shape[2], acc0.shape[3]
    acc0 = acc0.at[:, :, Lk:, :].set(0.0).at[:, :, :, Lq:].set(0.0)

    ref_out, ref_p = _reference_out(q, k, v)
    out, acc1 = cross_attention_acc(q, k, v, acc0, q_tile=tile)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(acc1), _acc_reference(acc0, ref_p),
                               rtol=2e-3, atol=2e-3)
    # pads remain exactly zero (masked softmax rows are 0)
    assert np.all(np.asarray(acc1)[:, :, Lk:, :] == 0.0)
    assert np.all(np.asarray(acc1)[:, :, :, Lq:] == 0.0)


def test_cross_attention_acc_accumulates_over_calls():
    """Sequential calls keep summing (the per-step scan behavior)."""
    from daam_tpu.ops.pallas_attention import cross_attention_acc, cross_acc_shape

    B, H, Lq, Lk, hd = 1, 2, 64, 77, 64
    acc = jnp.zeros(cross_acc_shape(B, H, Lq, Lk, q_tile=32), jnp.float32)
    expect = np.asarray(acc).copy()
    for seed in (0, 1, 2):
        q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=seed)
        _, ref_p = _reference_out(q, k, v)
        _, acc = cross_attention_acc(q, k, v, acc, q_tile=32)
        expect = _acc_reference(expect, ref_p)
    np.testing.assert_allclose(np.asarray(acc), expect, rtol=5e-3, atol=5e-3)


def test_cross_attention_acc_bf16_inputs():
    """bf16 q/k/v (the production dtype) with fp32 accumulation."""
    from daam_tpu.ops.pallas_attention import cross_attention_acc, cross_acc_shape

    B, H, Lq, Lk, hd = 2, 2, 64, 77, 64
    q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=7)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    acc = jnp.zeros(cross_acc_shape(B, H, Lq, Lk, q_tile=32), jnp.float32)
    _, ref_p = _reference_out(qb, kb, vb)
    out, acc1 = cross_attention_acc(qb, kb, vb, acc, q_tile=32)
    assert out.dtype == jnp.bfloat16 and acc1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(acc1),
                               _acc_reference(np.zeros_like(acc), ref_p),
                               rtol=3e-2, atol=1e-2)
    rho = spearman(acc1[:, :, :Lk, :Lq],
                   jnp.transpose(ref_p, (0, 1, 3, 2)).astype(jnp.float32))
    assert rho >= 0.99, rho


def test_cross_attention_dispatch_acc_mode():
    """ops.attention.cross_attention(capture='acc'): pallas and jnp paths
    agree, uncond rows never touch the accumulator."""
    from daam_tpu.ops import attention as A
    from daam_tpu.ops.pallas_attention import cross_acc_shape

    B, H, Lq, Lk, hd = 4, 2, 64, 77, 64  # CFG: rows 2: are conditional
    q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=8)
    acc = jnp.zeros(cross_acc_shape(B // 2, H, Lq, Lk), jnp.float32)

    mode = A.get_kernel_mode()
    try:
        A.set_kernel_mode('jnp')
        out_j, acc_j = A.cross_attention(q, k, v, capture='acc', acc=acc)
        A.set_kernel_mode('pallas')
        out_p, acc_p = A.cross_attention(q, k, v, capture='acc', acc=acc)
    finally:
        A.set_kernel_mode(mode)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_j),
                               rtol=2e-3, atol=2e-3)
    # accumulator holds exactly the conditional half's P^T
    _, ref_p = _reference_out(q, k, v)
    np.testing.assert_allclose(np.asarray(acc_j),
                               _acc_reference(np.zeros_like(acc),
                                              ref_p[B // 2:]),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# packed-layout kernels (two heads per 128-lane block; round-4 throughput)
# ---------------------------------------------------------------------------

def _pack(t):
    """(B, H, L, hd) -> packed (B, L, H*hd), the Dense projection layout."""
    B, H, L, hd = t.shape
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(B, L, H * hd)


@pytest.mark.parametrize('H,Lq,Lk', [(2, 64, 64), (4, 256, 256),
                                     (2, 100, 77), (6, 2048, 2048),
                                     (2, 512, 1157)])
def test_flash_self_attention_packed_matches_reference(H, Lq, Lk):
    """Packed kernel == split -> head-major reference -> merge, including the
    online-softmax long-K branch and masked unaligned Lk."""
    from daam_tpu.ops.pallas_attention import flash_self_attention_packed

    q, k, v = _rand_qkv(2, H, Lq, Lk, 64, seed=11)
    ref, _ = _reference_out(q, k, v)
    out = flash_self_attention_packed(_pack(q), _pack(k), _pack(v), heads=H,
                                      q_tile=64 if Lq <= 256 else None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_pack(ref)),
                               rtol=2e-3, atol=2e-3)


def test_flash_self_attention_packed_bf16():
    from daam_tpu.ops.pallas_attention import flash_self_attention_packed

    q, k, v = _rand_qkv(1, 4, 128, 128, 64, seed=12)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref, _ = _reference_out(qb, kb, vb)
    out = flash_self_attention_packed(_pack(qb), _pack(kb), _pack(vb),
                                      heads=4, q_tile=64)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(_pack(ref), dtype=np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize('Lq,tile', [(64, 32), (40, 16), (256, 64)])
def test_cross_attention_acc_packed_matches_reference(Lq, tile):
    """Packed accumulator kernel: same acc contract as the head-major one
    (cross_acc_shape geometry, pads stay zero), packed O."""
    from daam_tpu.ops.pallas_attention import (cross_attention_acc_packed,
                                               cross_acc_shape)

    B, H, Lk, hd = 2, 4, 77, 64
    q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=13)
    rng = np.random.RandomState(14)
    acc0 = jnp.asarray(rng.rand(*cross_acc_shape(B, H, Lq, Lk, q_tile=tile))
                       .astype(np.float32))
    acc0 = acc0.at[:, :, Lk:, :].set(0.0).at[:, :, :, Lq:].set(0.0)

    ref_out, ref_p = _reference_out(q, k, v)
    out, acc1 = cross_attention_acc_packed(_pack(q), _pack(k), _pack(v),
                                           acc0, heads=H, q_tile=tile)

    np.testing.assert_allclose(np.asarray(out), np.asarray(_pack(ref_out)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(acc1), _acc_reference(acc0, ref_p),
                               rtol=2e-3, atol=2e-3)
    assert np.all(np.asarray(acc1)[:, :, Lk:, :] == 0.0)
    assert np.all(np.asarray(acc1)[:, :, :, Lq:] == 0.0)


def test_cross_attention_packed_dispatch_acc_mode():
    """ops.attention.cross_attention_packed(capture='acc') == the head-major
    cross_attention(capture='acc') over the same CFG batch."""
    from daam_tpu.ops import attention as A
    from daam_tpu.ops.pallas_attention import cross_acc_shape

    B, H, Lq, Lk, hd = 4, 2, 64, 77, 64
    q, k, v = _rand_qkv(B, H, Lq, Lk, hd, seed=15)
    acc = jnp.zeros(cross_acc_shape(B // 2, H, Lq, Lk), jnp.float32)

    mode = A.get_kernel_mode()
    try:
        A.set_kernel_mode('jnp')
        out_ref, acc_ref = A.cross_attention(q, k, v, capture='acc', acc=acc)
        A.set_kernel_mode('pallas')
        out_p, acc_p = A.cross_attention_packed(_pack(q), _pack(k), _pack(v),
                                                heads=H, capture='acc',
                                                acc=acc)
    finally:
        A.set_kernel_mode(mode)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(_pack(out_ref)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_ref),
                               rtol=2e-3, atol=2e-3)


def _ghost_pad(t):
    """(B, H, L, hd) -> (B, H+1, L, hd) with an all-zero ghost head — the
    padding ``models.unet.PadDense`` produces at the weight level for odd
    head counts."""
    B, H, L, hd = t.shape
    return jnp.concatenate([t, jnp.zeros((B, 1, L, hd), t.dtype)], axis=1)


def test_flash_self_attention_packed_ghost_head():
    """Odd head counts (SD2.1's 5-head level): 5 real heads + one all-zero
    ghost head through the packed kernel — real lanes match the 5-head
    reference, ghost lanes are exactly zero (zero v ⇒ zero output)."""
    from daam_tpu.ops.pallas_attention import flash_self_attention_packed

    H = 5
    q, k, v = _rand_qkv(2, H, 256, 256, 64, seed=16)
    ref, _ = _reference_out(q, k, v)
    out = flash_self_attention_packed(_pack(_ghost_pad(q)),
                                      _pack(_ghost_pad(k)),
                                      _pack(_ghost_pad(v)),
                                      heads=H + 1, q_tile=64)
    np.testing.assert_allclose(np.asarray(out[:, :, :H * 64]),
                               np.asarray(_pack(ref)), rtol=2e-3, atol=2e-3)
    assert np.all(np.asarray(out[:, :, H * 64:]) == 0.0)


def test_cross_attention_acc_packed_ghost_head():
    """Ghost head through the packed accumulator kernel: real head rows of
    the accumulator match P^T, real output lanes match, ghost output lanes
    are zero.  The ghost's own acc row (uniform 1/Lk_pad garbage by design)
    is sliced off at heat-map finalization (pipeline/sd.py finalize_acc)."""
    from daam_tpu.ops.pallas_attention import (cross_attention_acc_packed,
                                               cross_acc_shape)

    H, Lq, Lk = 5, 64, 77
    q, k, v = _rand_qkv(1, H, Lq, Lk, 64, seed=17)
    acc0 = jnp.zeros(cross_acc_shape(1, H + 1, Lq, Lk, q_tile=32),
                     jnp.float32)
    ref_out, ref_p = _reference_out(q, k, v)
    out, acc1 = cross_attention_acc_packed(_pack(_ghost_pad(q)),
                                           _pack(_ghost_pad(k)),
                                           _pack(_ghost_pad(v)),
                                           acc0, heads=H + 1, q_tile=32)
    np.testing.assert_allclose(np.asarray(out[:, :, :H * 64]),
                               np.asarray(_pack(ref_out)),
                               rtol=2e-3, atol=2e-3)
    assert np.all(np.asarray(out[:, :, H * 64:]) == 0.0)
    a1 = np.asarray(acc1)
    np.testing.assert_allclose(
        a1[:, :H], _acc_reference(np.asarray(acc0[:, :H]), ref_p),
        rtol=2e-3, atol=2e-3)
    # real heads' pads stay zero
    assert np.all(a1[:, :H, Lk:, :] == 0.0)
    assert np.all(a1[:, :H, :, Lq:] == 0.0)


def test_unet_attention_module_odd_heads_packed_matches_jnp():
    """models.unet.Attention at SD2.1's odd 5-head/64-dim geometry: the
    packed ghost-head path (pallas mode, PadDense weight padding) must match
    the head-major jnp path — self-attention, plain cross, and the 'acc'
    capture path with the pipeline's padded accumulator allocation."""
    import jax
    from daam_tpu.models.unet import Attention
    from daam_tpu.ops import attention as A
    from daam_tpu.ops.pallas_attention import cross_acc_shape

    B2, L, Lk, H, dim, cdim = 4, 64, 77, 5, 320, 32  # B2 = 2B (CFG layout)
    rng = np.random.RandomState(18)
    x = jnp.asarray(rng.randn(B2, L, dim).astype(np.float32))
    ctx = jnp.asarray(rng.randn(B2, Lk, cdim).astype(np.float32))

    mode = A.get_kernel_mode()
    odd = A.get_odd_packed()
    A.set_odd_packed(True)  # ghost-head packing is opt-in since the probe
    try:
        A.set_kernel_mode('jnp')
        self_mod = Attention(heads=H, dim=dim, is_cross=False)
        cross_mod = Attention(heads=H, dim=dim, is_cross=True)
        p_self = self_mod.init(jax.random.PRNGKey(0), x)
        p_cross = cross_mod.init(jax.random.PRNGKey(1), x, ctx)
        out_self_j, _ = self_mod.apply(p_self, x)
        out_cross_j, _ = cross_mod.apply(p_cross, x, ctx)
        acc_j = jnp.zeros(cross_acc_shape(B2 // 2, H, L, Lk), jnp.float32)
        out_acc_j, acc_j1 = cross_mod.apply(p_cross, x, ctx, capture='acc',
                                            acc=acc_j)

        A.set_kernel_mode('pallas')
        assert A.packed_eligible(H, 64, L, Lk, capture='acc')
        out_self_p, _ = self_mod.apply(p_self, x)
        out_cross_p, _ = cross_mod.apply(p_cross, x, ctx)
        acc_p = jnp.zeros(cross_acc_shape(B2 // 2, H + 1, L, Lk), jnp.float32)
        out_acc_p, acc_p1 = cross_mod.apply(p_cross, x, ctx, capture='acc',
                                            acc=acc_p)
    finally:
        A.set_kernel_mode(mode)
        A.set_odd_packed(odd)

    np.testing.assert_allclose(np.asarray(out_self_p), np.asarray(out_self_j),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_cross_p),
                               np.asarray(out_cross_j), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_acc_p), np.asarray(out_acc_j),
                               rtol=2e-3, atol=2e-3)
    # real accumulator head rows agree; the ghost row is the module's to drop
    np.testing.assert_allclose(np.asarray(acc_p1[:, :H]), np.asarray(acc_j1),
                               rtol=2e-3, atol=2e-3)


def test_packed_eligible_gating():
    """The packed path only engages where the kernels support it."""
    from daam_tpu.ops import attention as A

    mode = A.get_kernel_mode()
    try:
        A.set_kernel_mode('pallas')
        assert A.packed_eligible(10, 64, 4096, 4096)
        assert A.packed_eligible(10, 64, 4096, 77, capture='acc')
        # odd heads fall back head-major by default (ghost-head packing
        # measured slower on chip, scripts/probe_ghost_head.py) but remain
        # available behind the opt-in
        assert not A.packed_eligible(5, 64, 4096, 4096)
        odd = A.get_odd_packed()
        try:
            A.set_odd_packed(True)
            assert A.packed_eligible(5, 64, 4096, 4096)
        finally:
            A.set_odd_packed(odd)
        assert A.packed_ghost_heads(5) == 1 and A.packed_ghost_heads(10) == 0
        assert not A.packed_eligible(8, 40, 4096, 4096)          # hd != 64
        assert not A.packed_eligible(10, 64, 4096, 77, capture='full')
        assert not A.packed_eligible(10, 64, 4096, 77, replay=True)
        A.set_kernel_mode('jnp')
        assert not A.packed_eligible(10, 64, 4096, 4096)         # no pallas
    finally:
        A.set_kernel_mode(mode)
