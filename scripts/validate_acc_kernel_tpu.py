"""Validate + micro-bench the in-kernel accumulation path on the real TPU.

Checks, at SD2.1-512² cross-attention shapes (bf16):
  1. numerics: ``cross_attention_acc`` output O and accumulator vs the fp32
     jnp reference (max-abs-err + Spearman, the BASELINE gate),
  2. wall time: acc-kernel vs the round-1 'cond' probs side-output vs
     uncaptured flash attention (per-call, device-synchronized via fetch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_acc_kernel_tpu.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from daam_tpu.ops.attention import attention_probs_reference
from daam_tpu.ops.pallas_attention import (cross_acc_shape,
                                           cross_attention_acc,
                                           cross_attention_probs,
                                           flash_attention)


def spearman(a, b):
    from scipy.stats import spearmanr
    return spearmanr(np.asarray(a).ravel(), np.asarray(b).ravel()).statistic


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[(0,) * x.ndim]), out)  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[(0,) * x.ndim]), out)
    return (time.perf_counter() - t0) / reps


def main():
    print('backend:', jax.default_backend(), jax.devices())
    # SD2.1 512² finest capture layer: B=1 cond half, H=5 heads @64, 64² queries
    B, H, Lq, Lk, hd = 1, 5, 4096, 77, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, Lq, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, Lk, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, Lk, hd), jnp.bfloat16)
    acc0 = jnp.zeros(cross_acc_shape(B, H, Lq, Lk), jnp.float32)

    out, acc1 = cross_attention_acc(q, k, v, acc0)
    ref_p = attention_probs_reference(q, k)
    ref_o = jnp.einsum('bhqk,bhkd->bhqd', ref_p.astype(v.dtype), v)

    acc_slice = np.asarray(acc1[:, :, :Lk, :Lq])
    ref_pt = np.transpose(np.asarray(ref_p, np.float32), (0, 1, 3, 2))
    print('acc max-abs-err:', np.abs(acc_slice - ref_pt).max())
    print('acc spearman   :', spearman(acc_slice, ref_pt))
    print('out max-abs-err:',
          np.abs(np.asarray(out, np.float32) -
                 np.asarray(ref_o, np.float32)).max())
    pad_k = np.asarray(acc1[:, :, Lk:, :])
    pad_q = np.asarray(acc1[:, :, :, Lq:])
    print('pads zero:', (pad_k == 0).all() and
          (pad_q.size == 0 or (pad_q == 0).all()))

    t_flash = timeit(lambda: flash_attention(q, k, v))
    t_acc = timeit(lambda: cross_attention_acc(q, k, v, acc0))
    t_cond2 = timeit(lambda: cross_attention_probs(
        jnp.concatenate([q, q]), jnp.concatenate([k, k]),
        jnp.concatenate([v, v]), cond_only=True, probs_dtype=jnp.bfloat16))
    t_acc2 = timeit(lambda: (
        flash_attention(q, k, v),
        cross_attention_acc(q, k, v, acc0)))
    print(f'flash (1x)        : {t_flash * 1e3:.3f} ms')
    print(f'acc-kernel (1x)   : {t_acc * 1e3:.3f} ms')
    print(f'cond probs (2x CFG): {t_cond2 * 1e3:.3f} ms   <- round-1 path')
    print(f'flash+acc (2x CFG) : {t_acc2 * 1e3:.3f} ms   <- round-2 path')


if __name__ == '__main__':
    main()
