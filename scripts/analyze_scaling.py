"""Mesh-sweep scaling analysis of the UNet denoise step (no hardware needed).

Sweeps dp/tp/sp meshes on the virtual CPU device set, compiles the real
model geometry with abstract (ShapeDtypeStruct) inputs — no weights are
materialized, no step executes — and reports, per mesh:

* per-device FLOPs + HBM bytes from XLA's cost model,
* the collective traffic the SPMD partitioner inserted (parsed from the
  compiled HLO, priced with ring-algorithm link factors), and
* an analytic step-time projection anchored to the measured single-chip
  step time (BASELINE.md) with communication at v5e ICI line rate,
  unoverlapped (pessimistic).

This is the strongest multi-chip performance evidence obtainable in this
environment (ROADMAP "Remaining targets #5"); results are recorded in
SCALING.md.  The reference has no distributed subsystem (single CUDA
device, reference ``daam/utils.py:22-29``).

    PYTHONPATH=. python scripts/analyze_scaling.py --model v2-1-base
    PYTHONPATH=. python scripts/analyze_scaling.py --model xl-base-1.0 --batch 4
"""

import argparse
import json
import os

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from daam_tpu.models.configs import get_pipeline_config
from daam_tpu.models.unet import UNet2DConditionModel
from daam_tpu.parallel import make_mesh
from daam_tpu.parallel.analysis import project_step_time, spmd_step_report

# Measured single-chip UNet step device time, ms, at batch 1 (CFG batch 2)
# (BASELINE.md round-4/5 HLO-profiled numbers on TPU v5e-1, bf16): the
# anchor for the compute leg of the projection.  Sweeps at batch B scale it
# by B (time ∝ FLOPs; batch 2 already saturates the chip at these sizes).
MEASURED_STEP_MS = {'v2-1-base': 16.95, 'xl-base-1.0': 118.3}

DEFAULT_MESHES = ((1, 1, 1), (2, 1, 1), (4, 1, 1), (8, 1, 1),
                  (4, 2, 1), (2, 4, 1), (4, 1, 2), (2, 2, 2))


def build_step(model: str, batch: int, dtype):
    """The jitted-signature (fn, abstract_args, data_specs) for one CFG
    denoise step of ``model`` at global batch ``batch``."""
    config = get_pipeline_config(model)
    ucfg = config.unet
    unet = UNet2DConditionModel(ucfg, dtype=dtype)
    s = ucfg.sample_size
    rows = 2 * batch  # CFG doubles the batch
    x = jax.ShapeDtypeStruct((rows, s, s, ucfg.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((rows,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((rows, 77, ucfg.cross_attention_dim),
                               jnp.float32)
    args = [x, t, ctx]
    data_specs = [P('data', None, None, None), P('data'), P('data', None, None)]

    if getattr(config, 'is_sdxl', False):
        pooled = config.text_2.projection_dim or config.text_2.hidden_size
        te = jax.ShapeDtypeStruct((rows, pooled), jnp.float32)
        ti = jax.ShapeDtypeStruct((rows, 6), jnp.float32)
        args += [te, ti]
        data_specs += [P('data', None), P('data', None)]

        def step(params, x, t, ctx, te, ti):
            eps, _ = unet.apply(params, x, t, ctx,
                                added_cond={'text_embeds': te, 'time_ids': ti})
            return eps
    else:
        def step(params, x, t, ctx):
            eps, _ = unet.apply(params, x, t, ctx)
            return eps

    params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), *args[:3],
                            **({'added_cond': {'text_embeds': args[3],
                                               'time_ids': args[4]}}
                               if len(args) > 3 else {}))
    return step, params, args, data_specs


def sweep(model: str, batch: int, meshes, dtype, ici_gbps: float,
          step_ms=None):
    step, params, args, data_specs = build_step(model, batch, dtype)
    if step_ms is None:
        step_ms = MEASURED_STEP_MS.get(model)

    reports = []
    anchor_flops = None
    for dp, tp, sp in meshes:
        mesh = make_mesh(dp=dp, tp=tp, sp=sp)
        sh = lambda spec: NamedSharding(mesh, spec)
        in_sh = (jax.tree_util.tree_map(lambda _: sh(P()), params),
                 *[sh(s) for s in data_specs])
        rep = spmd_step_report(step, (params, *args), mesh, in_shardings=in_sh)
        if anchor_flops is None and mesh.devices.size == 1:
            anchor_flops = rep['flops_per_device']
        if step_ms is not None and anchor_flops:
            # anchor is the measured *batch-1* step; the single-chip time at
            # global batch B is B× that (time ∝ FLOPs), paired with the
            # sweep's own batch-B single-chip FLOP count
            rep['projection'] = project_step_time(
                rep, step_ms * batch, anchor_flops, ici_gbps=ici_gbps)
        reports.append(rep)
        print(format_row(rep), flush=True)
    return reports


def format_header():
    return ('| mesh (dp,tp,sp) | GFLOPs/dev | HBM GB/dev | collectives '
            '(count) | link MB/dev | proj. compute ms | proj. comm ms | '
            'proj. step ms | efficiency |\n'
            '|---|---|---|---|---|---|---|---|---|')


def format_row(rep):
    m = rep['mesh']
    coll = ', '.join(f"{k}×{v['count']}" for k, v in
                     sorted(rep['collectives'].items())) or '—'
    pr = rep.get('projection')
    proj = (f"{pr['compute_ms']:.2f} | {pr['comm_ms']:.3f} | "
            f"{pr['step_ms']:.2f} | {pr['parallel_efficiency']:.1%}"
            if pr else '— | — | — | —')
    return (f"| {m.get('data', 1)},{m.get('model', 1)},{m.get('spatial', 1)} "
            f"| {rep['flops_per_device'] / 1e9:.1f} "
            f"| {rep['hbm_bytes_per_device'] / 1e9:.2f} "
            f"| {coll} "
            f"| {rep['link_bytes_per_device'] / 1e6:.1f} "
            f"| {proj} |")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--model', default='v2-1-base')
    ap.add_argument('--batch', type=int, default=4,
                    help='global batch (CFG doubles the rows)')
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--ici-gbps', type=float, default=45.0,
                    help='ICI bandwidth per direction, GB/s (v5e: 45)')
    ap.add_argument('--step-ms', type=float, default=None,
                    help='measured single-chip step ms anchor '
                         '(default: BASELINE.md value for the model)')
    ap.add_argument('--meshes', default=None,
                    help='semicolon list like "8,1,1;4,2,1"')
    ap.add_argument('--json', default=None, help='write full reports here')
    args = ap.parse_args()

    meshes = DEFAULT_MESHES
    if args.meshes:
        meshes = tuple(tuple(int(v) for v in m.split(','))
                       for m in args.meshes.split(';'))

    print(f"# {args.model} @ global batch {args.batch} ({args.dtype}), "
          f"ICI {args.ici_gbps} GB/s")
    print(format_header())
    reports = sweep(args.model, args.batch, meshes,
                    jnp.dtype(args.dtype), args.ici_gbps, args.step_ms)

    if args.json:
        with open(args.json, 'w') as f:
            json.dump({'model': args.model, 'batch': args.batch,
                       'dtype': args.dtype, 'ici_gbps': args.ici_gbps,
                       'reports': reports}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == '__main__':
    main()
