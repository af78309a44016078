"""Sweep flash_self_attention tile sizes at the hot SD2.1 shapes.

Level-0 self-attention (L=4096, H=5/CFG pair -> BH=10, hd=64) is ~3.3 ms of
the ~18 ms UNet step; this sweeps q_tile to find the fastest configuration
on the real chip (ROADMAP round-2 target 2).
"""

import argparse
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np

from daam_tpu.ops.pallas_attention import flash_self_attention


CHAIN = 32  # kernel calls chained inside one program


def bench_chained(make_fn, q, k, v, outer=5):
    """Per-kernel-call seconds: CHAIN dependent calls inside one jit (the
    output feeds the next call's query), so the ~1-2 ms relay dispatch
    amortizes away and calls cannot overlap or be memoized."""

    @jax.jit
    def chained(q, k, v):
        def body(x, _):
            return make_fn(x, k, v).astype(q.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return out

    np.asarray(chained(q, k, v)[0, 0, 0, 0])  # compile
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(chained(q, k, v)[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / CHAIN


def main():
    parser = argparse.ArgumentParser()
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    shapes = [
        (2, 5, 4096, 64),    # SD2.1 level 0 (64x64)
        (2, 10, 1024, 64),   # SD2.1 level 1 (32x32)
        (2, 20, 256, 64),    # SD2.1 level 2 (16x16)
        (2, 10, 4096, 64),   # SDXL level 1 (64x64 at 1024px)
    ]
    for shape in shapes:
        B, H, L, hd = shape
        flops = 2 * 2 * B * H * L * L * hd
        q = jax.random.normal(key, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
        jax.block_until_ready((q, k, v))
        print(f'-- shape {shape} ({flops / 1e9:.1f} GFLOP) --', flush=True)
        for tq in (128, 256, 512, 1024):
            if tq > L:
                continue
            t = bench_chained(
                lambda x, kk, vv, t=tq: flash_self_attention(
                    x, kk, vv, q_tile=t), q, k, v)
            print(f'  q_tile={tq:5d}: {t * 1e3:7.3f} ms  '
                  f'{flops / t / 1e12:6.1f} TF/s', flush=True)


if __name__ == '__main__':
    main()
