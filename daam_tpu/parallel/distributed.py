"""Multi-host (multi-slice / multi-process) initialization helpers.

A single v5e/v6e slice up to 8 chips is one process — :func:`make_mesh` alone
covers it.  Beyond one host (pods, multi-slice over DCN), JAX requires
``jax.distributed.initialize`` in every process before any device access;
this module wraps that handshake and builds the same ``('data', 'model')``
mesh over the global device set so the rest of the framework (sharding
constraints, ``generate_batch``) is unchanged.

Typical pod launch (same command on every host; TPU metadata supplies
coordinator/process ids automatically on Cloud TPU)::

    from daam_tpu.parallel import init_distributed, make_global_mesh
    init_distributed()                       # no-op on a single process
    mesh = make_global_mesh(tp=2)            # dp = total_chips // 2
    out = generate_batch(pipe, prompts, mesh=mesh)

This exact flow is exercised in CI across REAL process boundaries:
``tests/test_multiprocess.py`` launches two OS processes (4 virtual CPU
devices each), connects them through ``jax.distributed.initialize`` with
Gloo cross-process collectives (the CPU stand-in for DCN), and runs traced
``generate_batch`` over the resulting 8-device global mesh — images match a
single-process run bit-for-bit and heat maps to fp32 rounding, on both
hosts.  Host fetches of process-spanning arrays go through
:func:`daam_tpu.parallel.fetch_global` (images, replay buffers, aggregated
heat maps), which all-gathers across processes only when actually needed.

Design notes (SURVEY.md §5 "distributed communication backend"):

* The reference has no distributed story (single ``cuda``-or-``cpu`` device,
  ``daam/utils.py:22-29``); this is the TPU-native equivalent — JAX
  collectives over ICI within a slice and DCN across slices, expressed only
  through the mesh.  There are no NCCL/MPI calls to port.
* Heat-map accumulators shard with the batch (device-local per sample), so
  scaling out adds NO cross-device traffic to the capture path: the only
  collectives are the parameter broadcast and the final image gather.
* ``data`` should map across slices (DCN-friendly: batch sharding has no
  inner-loop communication) and ``model`` (attention-head TP, which
  all-gathers activations every layer) must stay within a slice's ICI.
  ``make_global_mesh`` orders axes that way by construction: devices are
  sorted by (process, local id) and reshaped (dp, tp), so tp groups are
  intra-process unless tp exceeds a host's local device count.
"""

from typing import Optional

__all__ = ['init_distributed', 'make_global_mesh', 'is_multi_process']


def _already_initialized() -> bool:
    """Whether ``jax.distributed.initialize`` has already run — checked via
    the distributed global state, NOT ``jax.process_count()``: the latter
    lazily initializes the XLA backend, after which ``initialize`` hard-errors
    ('must be called before any JAX calls')."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:
        return False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    With no arguments, relies on the platform's auto-detection (Cloud TPU
    metadata, SLURM, or the ``JAX_COORDINATOR_ADDRESS`` family of env vars).
    Returns True if a multi-process runtime is active, False when
    single-process (in which case this is a no-op and everything below
    behaves exactly as before).  Safe to call twice (the second call is
    ignored).  Must run before any other JAX usage in the process — JAX
    refuses to initialize its distributed runtime after the XLA backend has
    been touched."""
    import jax

    if _already_initialized():
        return jax.process_count() > 1

    if coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except Exception as e:  # surface an actionable message
            raise RuntimeError(
                'jax.distributed.initialize failed; call init_distributed '
                'before any other JAX usage, and check that every process '
                'uses the same coordinator_address and a distinct process_id'
            ) from e
        return jax.process_count() > 1

    # auto-detect path: only meaningful on managed multi-host platforms
    try:
        jax.distributed.initialize()
    except Exception:
        return False                      # single-process environment
    return jax.process_count() > 1


def is_multi_process() -> bool:
    import jax
    return jax.process_count() > 1


def make_global_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1):
    """A ``('data', 'model', 'spatial')`` mesh over the global device set.

    Devices are ordered by (process_index, id) before the (dp, tp, sp)
    reshape, so ``spatial`` (the innermost axis — per-layer halo exchanges
    and K/V gathers, the most bandwidth-hungry collectives) and ``model``
    (TP) groups stay within one host/slice and ride ICI — while ``data``
    spans hosts over DCN, where batch sharding needs no inner-loop
    communication."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if dp is None:
        dp = len(devices) // (tp * sp)
    assert dp * tp * sp <= len(devices), (dp, tp, sp, len(devices))
    local_count = max(len([d for d in devices
                           if d.process_index == devices[0].process_index]), 1)
    if tp * sp > local_count:
        import warnings
        warnings.warn(
            f'tp*sp={tp * sp} exceeds the {local_count} local devices of one '
            f'process; per-layer collectives will cross DCN, which is slow — '
            f'prefer tp*sp <= {local_count} with a larger data axis.')
    arr = np.asarray(devices[:dp * tp * sp]).reshape(dp, tp, sp)
    return Mesh(arr, ('data', 'model', 'spatial'))
