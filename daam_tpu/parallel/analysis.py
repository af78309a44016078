"""Compiled-SPMD scaling analysis from XLA's cost model.

No multi-chip hardware is reachable from this environment (ROADMAP
"Remaining targets #5"), so scaling cannot be *timed*.  This module extracts
the strongest evidence the compiler can give instead.  For a jitted step
compiled over a real ``jax.sharding.Mesh`` it reports:

* **per-device FLOPs and HBM bytes** from ``compiled.cost_analysis()`` —
  XLA's per-partition cost model, the quantity that must fall as ``1/N``
  for a sharding to scale at all, and
* **the cross-device traffic the SPMD partitioner actually inserted**, by
  parsing every collective op (all-gather / all-reduce / reduce-scatter /
  collective-permute / all-to-all) and its result shape out of the compiled
  HLO, converted to per-device *link* bytes with the standard ring-algorithm
  factors.

:func:`project_step_time` then projects multi-chip step time analytically:
compute shrinks with the cost model's per-device FLOPs anchored to the
*measured* single-chip step time (BASELINE.md), communication is link bytes
over ICI bandwidth, assumed unoverlapped (pessimistic).  This is the
scaling-book recipe run in reverse — instead of profiling collectives on a
pod, read what the partitioner scheduled and price it at line rate.

``scripts/analyze_scaling.py`` sweeps meshes over the real SD2.1 / SDXL
geometry with abstract (``ShapeDtypeStruct``) inputs — nothing is
materialized or executed, so full-size models cost only compile time;
results are recorded in ``SCALING.md``.  ``tests/test_parallel.py`` asserts
the structural invariants (dp linearity, dp-only has zero traffic, tp/sp
traffic is where the design says it is) on the tiny fixture.

The reference has no distributed subsystem to mirror (single CUDA device,
reference ``daam/utils.py:22-29``); these numbers define the rebuild's own
scaling contract.
"""

import re
from typing import Dict, Optional, Sequence

__all__ = ['collective_traffic', 'spmd_step_report', 'project_step_time']

_DTYPE_BYTES = {
    'pred': 1, 's8': 1, 'u8': 1,
    'bf16': 2, 'f16': 2, 's16': 2, 'u16': 2,
    'f32': 4, 's32': 4, 'u32': 4,
    'f64': 8, 's64': 8, 'u64': 8, 'c64': 8,
    'c128': 16,
}

# Sync collectives plus the `-done` halves of async pairs (whose result is
# the true output); `-start` results are (operand, result) tuples and would
# double-count, so they are skipped.
_COLLECTIVE_RE = re.compile(
    r'=\s*(?P<type>\(?[a-z0-9\[\],{}\s/]*?\)?)\s*'
    r'(?P<op>all-gather|all-reduce|reduce-scatter|collective-permute|'
    r'all-to-all)(?P<done>-done)?\(')
_START_RE = re.compile(r'-start\(')
_SHAPE_RE = re.compile(r'([a-z]+\d+|pred)\[([\d,]*)\]')
_GROUPS_SET_RE = re.compile(r'replica_groups=\{\{([\d,]+)\}')
_GROUPS_IOTA_RE = re.compile(r'replica_groups=\[(\d+),(\d+)\]<=')


def _shape_bytes(type_str: str) -> int:
    """Total bytes of every ``dtype[d0,d1,...]`` in an HLO result type."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        width = _DTYPE_BYTES.get(dt)
        if width is None:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * width
    return total


def _group_size(line: str, default: int) -> int:
    m = _GROUPS_SET_RE.search(line)
    if m:
        return len(m.group(1).split(','))
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # replica_groups=[num_groups, group_size]<=[N]
        return int(m.group(2))
    return default


def _link_factor(op: str, g: int) -> float:
    """Per-device link bytes as a fraction of the op's output bytes, for the
    ring algorithms XLA uses on torus interconnects: all-gather and
    reduce-scatter move ``(g-1)/g`` of the full array per device, all-reduce
    is reduce-scatter + all-gather (``2(g-1)/g`` of the *reduced* size, which
    equals its output), a permute moves exactly its payload once."""
    if g <= 1:
        return 0.0
    if op in ('all-gather', 'reduce-scatter'):
        return (g - 1) / g
    if op == 'all-reduce':
        return 2 * (g - 1) / g
    return 1.0  # collective-permute, all-to-all


def collective_traffic(hlo_text: str, n_devices: int) -> Dict[str, dict]:
    """Parse collective ops out of compiled HLO text.

    Returns ``{op_kind: {'count', 'out_bytes', 'link_bytes'}}`` where
    ``out_bytes`` is the summed result size and ``link_bytes`` the estimated
    per-device interconnect traffic (ring factors above).  Counts are static
    op occurrences — for a single-step program with no loops, also the
    per-step execution counts.
    """
    traffic: Dict[str, dict] = {}
    for line in hlo_text.splitlines():
        if _START_RE.search(line):
            continue
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        op = m.group('op')
        out_bytes = _shape_bytes(m.group('type'))
        g = _group_size(line, n_devices)
        entry = traffic.setdefault(
            op, {'count': 0, 'out_bytes': 0, 'link_bytes': 0.0})
        entry['count'] += 1
        entry['out_bytes'] += out_bytes
        entry['link_bytes'] += out_bytes * _link_factor(op, g)
    return traffic


def spmd_step_report(fn, args: Sequence, mesh, in_shardings=None,
                     keep_hlo: bool = False) -> dict:
    """Compile ``fn`` over ``mesh`` (abstract args are fine — pass
    ``jax.ShapeDtypeStruct`` pytrees to avoid materializing weights) and
    return the per-device cost + collective-traffic report."""
    import jax

    from .mesh import use_mesh

    with use_mesh(mesh):
        compiled = (jax.jit(fn, in_shardings=in_shardings)
                    .lower(*args).compile())
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    hlo = compiled.as_text()
    traffic = collective_traffic(hlo, mesh.devices.size)
    report = {
        'mesh': {name: int(size) for name, size
                 in zip(mesh.axis_names, mesh.devices.shape)},
        'n_devices': int(mesh.devices.size),
        'flops_per_device': float(ca.get('flops', 0.0)),
        'hbm_bytes_per_device': float(ca.get('bytes accessed', 0.0)),
        'collectives': traffic,
        'link_bytes_per_device': float(sum(t['link_bytes']
                                           for t in traffic.values())),
    }
    if keep_hlo:
        report['hlo'] = hlo
    return report


def project_step_time(report: dict, single_chip_ms: float,
                      single_chip_flops: float,
                      ici_gbps: float = 45.0) -> dict:
    """Analytic multi-chip step-time projection.

    ``single_chip_ms`` / ``single_chip_flops`` anchor the cost model to a
    measured single-chip step (BASELINE.md); compute time scales with the
    per-device FLOP fraction, communication is link bytes at ``ici_gbps``
    (v5e: 45 GB/s per direction per ICI port), assumed unoverlapped — a
    pessimistic bound, since XLA overlaps async collectives with compute.
    """
    compute_ms = single_chip_ms * report['flops_per_device'] / single_chip_flops
    comm_ms = report['link_bytes_per_device'] / (ici_gbps * 1e9) * 1e3
    step_ms = compute_ms + comm_ms
    speedup = single_chip_ms / step_ms if step_ms else float('inf')
    return {
        'compute_ms': compute_ms,
        'comm_ms': comm_ms,
        'step_ms': step_ms,
        'speedup_vs_1chip': speedup,
        'parallel_efficiency': speedup / report['n_devices'],
    }
