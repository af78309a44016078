"""Measure: three separate (M,K)@(K,N) projections vs one fused (K,3N).

Decides whether fusing the attention q/k/v projections into one matmul is
worth the weight-layout churn (profiler-measured device time, not wall)."""

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

CHAIN = 32


def fusion_time_ms(logdir):
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
        if 'fusion' in str(v[i['HLO op category']]) or \
           'convolution' in str(v[i['HLO op category']]):
            tot += float(v[i['Total self time (us)']] or 0)
    return tot / 1e3


def profile_chain(fn, x, *ws):
    @jax.jit
    def chained(x, *ws):
        def body(c, _):
            y = fn(c, *ws)
            # fold back to x's shape so the chain carries a dependency
            return jnp.tanh(y[..., :x.shape[-1]]).astype(x.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return out

    np.asarray(chained(x, *ws)[0, 0])
    logdir = tempfile.mkdtemp(prefix='qkv_probe_')
    jax.profiler.start_trace(logdir)
    np.asarray(chained(x, *ws)[0, 0])
    jax.profiler.stop_trace()
    return fusion_time_ms(logdir) / CHAIN


def main():
    key = jax.random.PRNGKey(0)
    for M, K, N in [(8192, 320, 320), (2048, 640, 640), (512, 1280, 1280)]:
        x = jax.random.normal(key, (2, M // 2, K), jnp.bfloat16)
        w1, w2, w3 = (jax.random.normal(jax.random.fold_in(key, i), (K, N),
                                        jnp.bfloat16) for i in range(3))
        wf = jnp.concatenate([w1, w2, w3], axis=1)
        jax.block_until_ready((x, w1, w2, w3, wf))

        def sep(x, w1, w2, w3):
            return jnp.concatenate([x @ w1, x @ w2, x @ w3], axis=-1)

        def fused(x, wf):
            return x @ wf

        t_sep = profile_chain(sep, x, w1, w2, w3)
        t_fused = profile_chain(fused, x, wf)
        print(f'M={M} K={K} N={N}: separate {t_sep:7.4f} ms  '
              f'fused {t_fused:7.4f} ms  ({t_sep / t_fused:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
