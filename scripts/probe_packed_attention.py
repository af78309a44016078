"""Probe: packed-layout flash attention vs transpose + head-major kernel.

The packed kernels read the (B, L, H*hd) Dense projection layout directly
(two 64-wide heads per 128-lane block).  This measures, on the real chip:

1. numerical parity vs the head-major kernel at production shapes;
2. device time of the full subgraph each design implies —
   head-major: relayout (B,L,C)->(B,H,L,hd), kernel, relayout back;
   packed:     kernel only —
   because the relayout copies are exactly what the packed design deletes
   (4.2 ms/step 'data formatting' in the SDXL HLO profile).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_packed_attention.py
"""

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

from daam_tpu.ops.pallas_attention import (flash_self_attention,
                                           flash_self_attention_packed)

CHAIN = 16


def device_total_ms(logdir):
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
        tot += float(v[i['Total self time (us)']] or 0)
    return tot / 1e3


def profile(fn, *args):
    @jax.jit
    def chained(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return (y * 0.999).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return out

    out = chained(*args)
    np.asarray(out[0, 0, :2])  # true sync through the relay
    logdir = tempfile.mkdtemp(prefix='daam_packed_probe_')
    jax.profiler.start_trace(logdir)
    out = chained(*args)
    np.asarray(out[0, 0, :2])
    jax.profiler.stop_trace()
    return device_total_ms(logdir) / CHAIN


def main():
    for (B, H, L, hd) in [(2, 10, 4096, 64), (2, 20, 1024, 64)]:
        C = H * hd
        rng = np.random.RandomState(0)
        qp = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.1,
                         dtype=jnp.bfloat16)
        kp = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.1,
                         dtype=jnp.bfloat16)
        vp = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.1,
                         dtype=jnp.bfloat16)

        def headmajor(q, k, v):
            def split(t):
                return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
            o = flash_self_attention(split(q), split(k), split(v))
            return o.transpose(0, 2, 1, 3).reshape(B, L, C)

        ref = np.asarray(headmajor(qp, kp, vp), dtype=np.float32)
        flops = 2 * 2 * B * H * L * L * hd
        t_hm = profile(headmajor, qp, kp, vp)
        print(f'({B},{H},{L},{hd})')
        print(f'  head-major+relayout: {t_hm:7.3f} ms  '
              f'({flops / t_hm / 1e9:6.1f} TF/s)')
        for tq in (128, 256, 384, 512):
            def packed(q, k, v, tq=tq):
                return flash_self_attention_packed(q, k, v, heads=H,
                                                   q_tile=tq)
            try:
                got = np.asarray(packed(qp, kp, vp), dtype=np.float32)
            except Exception as e:
                print(f'  packed tq={tq}: FAILED ({str(e)[:90]})')
                continue
            err = np.max(np.abs(ref - got))
            t_pk = profile(packed, qp, kp, vp)
            print(f'  packed tq={tq}:      {t_pk:7.3f} ms  '
                  f'({flops / t_pk / 1e9:6.1f} TF/s)  '
                  f'speedup x{t_hm / t_pk:.3f}  maxerr {err:.1e}')


if __name__ == '__main__':
    main()
