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
