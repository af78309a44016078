"""Probe: kill the (B,L,H·hd) → (B,H,L,hd) relayout copies around attention.

The UNet projects with Dense then reshape+transpose (models/unet.py:110-117),
which the HLO profile shows as ~15 µs/layer of pure copy.  Candidate: express
the projection as an einsum straight into the head-major layout
(``blc,chd->bhld``) and let XLA pick the dot output layout — if the compiler
folds the transpose into the matmul, the copy disappears; if it re-emits the
same transpose, nothing is gained.  Likewise the reverse direction for the
out-projection (``bhld,hdc->blc``).

Measures total device time of a chained jit program via the profiler (wall
time through the relay is too noisy at sub-ms scale).
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

CHAIN = 32


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
    f = jax.jit(fn)
    np.asarray(f(*args)[0, 0, 0, 0])  # compile + sync
    logdir = tempfile.mkdtemp(prefix='headlayout_')
    jax.profiler.start_trace(logdir)
    np.asarray(f(*args)[0, 0, 0, 0])
    jax.profiler.stop_trace()
    return device_total_ms(logdir) / CHAIN


def main():
    key = jax.random.PRNGKey(0)
    # (L, C, H) for SD2.1 levels 0-2 (per-call; B=2 CFG batch)
    for L, C, H in [(4096, 320, 5), (1024, 640, 10), (256, 1280, 20)]:
        hd = C // H
        B = 2
        x = jax.random.normal(key, (B, L, C), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, 1), (C, C), jnp.bfloat16)
        wo = jax.random.normal(jax.random.fold_in(key, 2), (C, C), jnp.bfloat16)
        w3 = w.reshape(C, H, hd)
        wo3 = wo.reshape(H, hd, C)
        jax.block_until_ready((x, w, wo, w3, wo3))

        # Each body: full self-attention block — q/k/v projections into
        # head-major (B,H,L,hd), the real flash kernel (a custom call whose
        # operand layout forces the relayout to actually materialize), then
        # the out-projection back to (B,L,C).
        from daam_tpu.ops.pallas_attention import flash_self_attention

        def dense_t(x, w, wo):
            def split(t):
                return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

            def body(x, _):
                q, k, v = split(x @ w), split(x @ wo), split(x @ w)
                a = flash_self_attention(q, k, v)
                z = a.transpose(0, 2, 1, 3).reshape(B, L, C) @ wo
                return z.astype(x.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return out.reshape(B, L, H, hd)

        def einsum_hd(x, w3, wo3):
            def body(x, _):
                q = jnp.einsum('blc,chd->bhld', x, w3)
                k = jnp.einsum('blc,chd->bhld', x, wo3.transpose(2, 0, 1))
                v = jnp.einsum('blc,chd->bhld', x, w3)
                a = flash_self_attention(q, k, v)
                z = jnp.einsum('bhld,hdc->blc', a, wo3)
                return z.astype(x.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return out.reshape(B, L, H, hd)

        t_a = profile(dense_t, x, w, wo)
        t_b = profile(einsum_hd, x, w3, wo3)
        print(f'L={L} C={C} H={H}: dense+transpose {t_a:7.4f} ms  '
              f'einsum-headmajor {t_b:7.4f} ms  ({t_a / t_b:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
