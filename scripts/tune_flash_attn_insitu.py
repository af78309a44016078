"""In-situ q_tile sweep: profile chained flash kernels and read the
custom-call self-time from the device trace (wall-clock through the relay is
too noisy below ~1 ms; the profiler measures actual device-op time)."""

import argparse
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

from daam_tpu.ops.pallas_attention import flash_self_attention

CHAIN = 16


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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--shape', default='2,5,4096,64')
    args = parser.parse_args()
    shape = tuple(int(x) for x in args.shape.split(','))
    B, H, L, hd = shape
    flops = 2 * 2 * B * H * L * L * hd

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
    jax.block_until_ready((q, k, v))

    print(f'shape {shape} ({flops / 1e9:.1f} GFLOP/call)', flush=True)
    for tq in (128, 256, 512, 1024):
        if tq > L:
            continue

        @jax.jit
        def chained(q, k, v, t=tq):
            def body(x, _):
                return flash_self_attention(x, k, v, q_tile=t).astype(q.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=CHAIN)
            return out

        np.asarray(chained(q, k, v)[0, 0, 0, 0])  # compile
        logdir = tempfile.mkdtemp(prefix=f'flash_tq{tq}_')
        jax.profiler.start_trace(logdir)
        np.asarray(chained(q, k, v)[0, 0, 0, 0])
        jax.profiler.stop_trace()
        per_call = kernel_self_time_ms(logdir) / CHAIN
        print(f'  q_tile={tq:5d}: {per_call:7.3f} ms/call (device)  '
              f'{flops / (per_call / 1e3) / 1e12:6.1f} TF/s', flush=True)


if __name__ == '__main__':
    main()
