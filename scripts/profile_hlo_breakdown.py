"""Per-HLO-op time breakdown of one UNet denoise step on the current backend.

Captures a ``jax.profiler`` device trace of the jitted step and aggregates
device-op durations by category (conv / matmul-fusion / pallas kernel /
groupnorm-ish fusions / elementwise / copies), answering "where do the
~20 ms/step go" (ROADMAP round-2 target 2; the reference has no profiling
subsystem at all, SURVEY.md §5).

    PYTHONPATH=.:$PYTHONPATH python scripts/profile_hlo_breakdown.py
"""

import argparse
import collections
import glob
import gzip
import os
import tempfile

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp


def capture(model, reps, dtype):
    from daam_tpu.models import weights as W
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.unet import UNet2DConditionModel

    config = get_pipeline_config(model)
    params = W.init_random_params(config, seed=0, dtype=dtype)
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    s = config.unet.sample_size
    B = 2

    added = None
    if config.is_sdxl:
        pooled = config.text_2.projection_dim or config.text_2.hidden_size
        added = {'text_embeds': jnp.zeros((B, pooled)),
                 'time_ids': jnp.zeros((B, 6))}

    @jax.jit
    def step(p, x, tt, c):
        return unet.apply({'params': p}, x, tt, c, added_cond=added)[0]

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, s, s, 4), dtype=jnp.float32)
    t = jnp.full((B,), 500)
    ctx = jax.random.normal(key, (B, 77, config.unet.cross_attention_dim),
                            dtype=jnp.float32) * 0.1

    step(params['unet'], x, t, ctx).block_until_ready()  # compile

    logdir = tempfile.mkdtemp(prefix='daam_hlo_profile_')
    import numpy as np
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(reps):
        out = step(params['unet'], x, t, ctx)
    np.asarray(out[0, 0, 0, 0])  # host fetch = true barrier over the relay
    jax.profiler.stop_trace()
    return logdir


CATEGORIES = (
    ('pallas attention', ('self_attn_kernel', 'cross_attn', 'pallas',
                          'custom-call')),
    ('convolution', ('convolution', 'conv')),
    ('matmul fusion', ('dot', 'gemm')),
    ('reduce/norm fusion', ('reduce', 'norm')),
    ('elementwise fusion', ('fusion', 'add', 'multiply', 'subtract')),
    ('copy/transpose/reshape', ('copy', 'transpose', 'reshape', 'bitcast',
                                'concatenate', 'slice', 'pad')),
)


def classify(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return 'other'


def parse(logdir: str, reps: int):
    """Aggregate device-op durations from the xplane proto."""
    paths = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane.pb under {logdir}'
    path = max(paths, key=os.path.getmtime)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], 'hlo_stats^', {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode() if data[:2] == b'\x1f\x8b' \
            else data.decode()

    import json
    table = json.loads(data)
    # hlo_stats json: list with one table: {cols: [...], rows: [...]}; be
    # liberal about the exact shape across xprof versions.
    return table, path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default='v2-1-base')
    parser.add_argument('--reps', type=int, default=10)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--top', type=int, default=25)
    parser.add_argument('--logdir', default=None,
                        help='parse an existing trace instead of capturing')
    args = parser.parse_args()

    if args.logdir:
        logdir = args.logdir
    else:
        dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
        logdir = capture(args.model, args.reps, dtype)
    print(f'trace: {logdir}')

    table, path = parse(logdir, args.reps)
    print(f'xplane: {path}')

    # Locate rows: expect GViz-style {cols:[{label}..], rows:[{c:[{v}..]}..]}
    if isinstance(table, dict):
        tables = [table]
    else:
        tables = list(table)
    t0 = tables[0]
    cols = [c.get('label', c.get('id', '')) for c in t0['cols']]
    print('columns:', cols)

    def col(label_frag):
        for i, c in enumerate(cols):
            if label_frag.lower() == str(c).lower():
                return i
        for i, c in enumerate(cols):
            if label_frag.lower() in str(c).lower():
                return i
        return None

    i_name = col('HLO op name')
    i_text = col('HLO op text')
    i_fw = col('Framework op name')
    i_cat = col('HLO op category')
    i_self = col('Total self time (us)')
    i_occ = col('#Occurrences')
    i_flops = col('Model GFLOP/s')
    i_bw = col('Measured memory BW (GiB/s)')
    i_bound = col('Bound by')

    by_cat = collections.Counter()
    rows_out = []
    for r in t0['rows']:
        vals = [c.get('v') for c in r['c']]
        t_us = float(vals[i_self] or 0)
        cat = str(vals[i_cat]) if i_cat is not None else classify(str(vals[i_name]))
        by_cat[cat] += t_us
        rows_out.append((t_us, cat, vals))

    total = sum(by_cat.values())
    print(f'\n== by category (per step, {args.reps} reps) ==')
    for cat, t_us in by_cat.most_common():
        print(f'{t_us / args.reps / 1e3:8.3f} ms  {t_us / total * 100:5.1f}%  {cat}')

    rows_out.sort(key=lambda x: -x[0])
    print(f'\n== top {args.top} ops (per step) ==')
    for t_us, cat, vals in rows_out[:args.top]:
        occ = vals[i_occ] if i_occ is not None else '?'
        flops = vals[i_flops] if i_flops is not None else '?'
        bw = vals[i_bw] if i_bw is not None else '?'
        bound = vals[i_bound] if i_bound is not None else '?'
        fw = str(vals[i_fw] or '')[-70:] if i_fw is not None else ''
        text = str(vals[i_text] or '')[:90]
        print(f'{t_us / args.reps / 1e3:8.3f} ms  x{occ}  {flops} GF/s  '
              f'{bw} GiB/s  bound={bound}  [{cat}]\n'
              f'          {vals[i_name]}  fw={fw}\n          {text}')


if __name__ == '__main__':
    main()
