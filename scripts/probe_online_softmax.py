"""Probe: chunked online-softmax self-attention vs the two-pass kernel.

The shipping flash kernel (`ops/pallas_attention._self_attn_kernel`) computes
the whole (TQ, L) score tile, then a 3-pass softmax (max / exp / sum).  The
exp pass depends on the max over ALL columns, so the VPU softmax cannot start
until the MXU finishes the full score tile, and the MXU sits idle during the
softmax — the profile attributes ~1.3 ms/step of VPU overhead above the MXU
ideal to this serialization (BASELINE.md round-2 budget).

The online-softmax formulation (flash attention proper) chunks the key axis:
exp of chunk j only needs the running max through chunk j, so the score
matmul of chunk j+1 is data-independent of the exp of chunk j and Mosaic's
scheduler can overlap MXU and VPU across the unrolled chunk loop.  Extra cost:
the rescale-by-exp(m_old - m_new) corrections (O(TQ·hd) per chunk — 64x
cheaper than the O(TQ·ck) exp).

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_online_softmax.py
"""

import argparse
import functools
import glob
import gzip
import json
import os
import tempfile

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daam_tpu.ops.pallas_attention import flash_self_attention, _interpret, _round_up

CHAIN = 16


def _online_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, ck: int):
    q = q_ref[0]                    # (TQ, hd)
    TQ, hd = q.shape
    L = k_ref.shape[1]
    n_chunks = L // ck

    m = jnp.full((TQ, 1), -1e30, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, hd), jnp.float32)
    for j in range(n_chunks):
        k = k_ref[0, j * ck:(j + 1) * ck, :]
        v = v_ref[0, j * ck:(j + 1) * ck, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('q_tile', 'ck'))
def online_self_attention(q, k, v, q_tile: int = 256, ck: int = 1024):
    B, H, L, hd = q.shape
    scale = hd ** -0.5
    qf = q.reshape(B * H, L, hd)
    kf = k.reshape(B * H, L, hd)
    vf = v.reshape(B * H, L, hd)
    TQ = min(q_tile, _round_up(L, 8))
    assert L % TQ == 0 and L % ck == 0
    grid = (B * H, L // TQ)
    out = pl.pallas_call(
        functools.partial(_online_kernel, scale=scale, ck=ck),
        out_shape=jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(B, H, L, hd)


def kernel_self_time_ms(logdir):
    path = max(glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                         recursive=True), key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([path], 'hlo_stats^', {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode() if data[:2] == b'\x1f\x8b' \
            else data.decode()
    t0 = json.loads(data)
    cols = [c.get('label') for c in t0['cols']]
    i = {c: n for n, c in enumerate(cols)}
    tot = 0.0
    for r in t0['rows']:
        v = [c.get('v') for c in r['c']]
        if v[i['HLO op category']] == 'custom-call':
            tot += float(v[i['Total self time (us)']] or 0)
    return tot / 1e3


def measure(fn, q, k, v, label, flops):
    @jax.jit
    def chained(q, k, v):
        def body(x, _):
            return fn(x, k, v).astype(q.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return out

    np.asarray(chained(q, k, v)[0, 0, 0, 0])  # compile
    logdir = tempfile.mkdtemp(prefix='probe_online_')
    jax.profiler.start_trace(logdir)
    np.asarray(chained(q, k, v)[0, 0, 0, 0])
    jax.profiler.stop_trace()
    per_call = kernel_self_time_ms(logdir) / CHAIN
    print(f'  {label:32s}: {per_call:7.3f} ms/call (device)  '
          f'{flops / (per_call / 1e3) / 1e12:6.1f} TF/s', flush=True)
    return per_call


def run_shape(shape, tqs, cks):
    B, H, L, hd = shape
    flops = 2 * 2 * B * H * L * L * hd

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, L, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, hd), jnp.bfloat16)
    jax.block_until_ready((q, k, v))

    # correctness first
    ref = np.asarray(flash_self_attention(q, k, v).astype(jnp.float32))
    got = np.asarray(online_self_attention(q, k, v).astype(jnp.float32))
    err = np.abs(ref - got).max()
    print(f'shape ({B},{H},{L},{hd})  max|Δ| online vs two-pass: {err:.2e}')
    assert err < 2e-2, 'online kernel diverges'

    print(f'({flops / 1e9:.1f} GFLOP/call)')
    for tq in tqs:
        if tq > L:
            continue
        measure(lambda q, k, v, t=tq: flash_self_attention(q, k, v, q_tile=t),
                q, k, v, f'two-pass q_tile={tq}', flops)
    for tq in tqs:
        if tq > L:
            continue
        for ck in cks:
            if ck > L:
                continue
            measure(lambda q, k, v, t=tq, c=ck:
                    online_self_attention(q, k, v, q_tile=t, ck=c),
                    q, k, v, f'online q_tile={tq} ck={ck}', flops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--shapes',
                    default='2,10,4096,64;2,10,1024,64;2,20,1024,64')
    ap.add_argument('--tqs', default='256,512,1024')
    ap.add_argument('--cks', default='256,512,1024')
    args = ap.parse_args()
    tqs = tuple(int(x) for x in args.tqs.split(','))
    cks = tuple(int(x) for x in args.cks.split(','))
    for spec in args.shapes.split(';'):
        run_shape(tuple(int(x) for x in spec.split(',')), tqs, cks)


if __name__ == '__main__':
    main()
