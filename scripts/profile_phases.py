"""Attribute a full warm pipe() call's device time by compiled program.

Answers "where do the non-UNet milliseconds go": text encode, denoise scan,
VAE decode each compile to their own XLA program, so grouping the profiler's
per-op self times by program id splits the call into phases.  The gap between
wall time and device total is host + relay overhead (not addressable in code).
"""

import argparse
import glob
import gzip
import json
import os
import tempfile
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np

from daam_tpu import trace, set_seed
from daam_tpu.pipeline.sd import StableDiffusionPipeline


def per_program_ms(logdir):
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
    pid_col = next((c for c in cols if 'rogram' in c), None)
    agg = {}
    for r in t0['rows']:
        v = [c.get('v') for c in r['c']]
        pid = v[i[pid_col]] if pid_col else '?'
        agg[pid] = agg.get(pid, 0.0) + float(v[i['Total self time (us)']] or 0)
    return {k: t / 1e3 for k, t in agg.items()}, cols


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='v2-1-base')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--traced', action='store_true')
    args = ap.parse_args()

    pipe = StableDiffusionPipeline.from_pretrained(args.model,
                                                   dtype=jnp.bfloat16)

    def run(i):
        t0 = time.perf_counter()
        pipe('a photo of a dog on the beach', num_inference_steps=args.steps,
             generator=jax.random.fold_in(set_seed(0), i), output_type='np')
        return time.perf_counter() - t0

    ctx = trace(pipe) if args.traced else None
    if ctx is not None:
        ctx.__enter__()
    try:
        run(99)  # compile/warm
        wall = run(0)
        logdir = tempfile.mkdtemp(prefix='phases_')
        jax.profiler.start_trace(logdir)
        wall2 = run(1)
        jax.profiler.stop_trace()
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)

    progs, cols = per_program_ms(logdir)
    total = sum(progs.values())
    print(f'wall: {wall:.3f}s / {wall2:.3f}s (profiled); '
          f'device total {total / 1e3:.3f}s; '
          f'host+relay gap {wall2 - total / 1e3:.3f}s')
    for pid, ms in sorted(progs.items(), key=lambda kv: -kv[1]):
        print(f'  {ms:9.1f} ms  program {pid}')


if __name__ == '__main__':
    main()
