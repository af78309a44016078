"""Device-mesh parallelism for batched traced generation.

The reference is strictly single-device and even rejects batched prompts
(reference ``daam/trace.py:172-173``, ``daam/utils.py:22-29``).  The TPU-native
scale-out story (SURVEY.md §2 "parallelism") is:

* **data parallelism** — the batch axis of a traced generation shards over the
  mesh's ``data`` axis; per-sample heat-map accumulators are device-local, so
  the only cross-device traffic is the initial shard and the final gather,
  riding ICI.
* **tensor parallelism** — attention heads shard over the ``model`` axis via
  GSPMD sharding constraints applied inside the UNet's attention (head axis of
  Q/K/V); XLA inserts the reduce-scatter/all-gather collectives.

Mechanism: ``use_mesh(mesh)`` activates a mesh for the enclosing scope;
:func:`constraint` becomes ``lax.with_sharding_constraint`` under that mesh and
a no-op otherwise, so the same model code runs single-chip and multi-chip.
"""

import contextlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ['make_mesh', 'use_mesh', 'get_active_mesh', 'constraint',
           'replicate_params', 'generate_batch', 'fetch_global']

_ACTIVE_MESH = None


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices=None):
    """Build a ``Mesh`` with ``('data', 'model', 'spatial')`` axes.

    ``dp`` defaults to ``len(devices) // (tp * sp)``.  ``tp`` shards attention
    heads (it must divide the smallest head count of the model you plan to
    run); ``sp`` shards the latent height axis — GSPMD inserts the halo
    exchanges for the 3x3 convs and the K/V all-gathers for attention, so
    high-resolution generation scales past one chip's FLOPs without model
    changes (the 'spatial scaling' axis, SURVEY.md §5).  Axes of size 1 cost
    nothing.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // (tp * sp)
    assert dp * tp * sp <= len(devices), (dp, tp, sp, len(devices))
    arr = np.asarray(devices[:dp * tp * sp]).reshape(dp, tp, sp)
    return Mesh(arr, ('data', 'model', 'spatial'))


def get_active_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    """Activate a mesh: sharding constraints in the model become live and
    jitted pipeline programs compile as SPMD programs over it."""
    global _ACTIVE_MESH
    import jax

    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with jax.set_mesh(mesh):
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def constraint(x, *spec):
    """``with_sharding_constraint(x, PartitionSpec(*spec))`` under an active
    mesh; identity otherwise.  Axis names absent from the mesh are dropped."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    names = set(mesh.axis_names)

    def keep(s):
        if s is None:
            return None
        if isinstance(s, (tuple, list)):
            kept = tuple(x_ for x_ in s if x_ in names)
            return kept if kept else None
        return s if s in names else None

    cleaned = PartitionSpec(*(keep(s) for s in spec))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, cleaned))


def fetch_global(x):
    """``np.asarray(x)`` that also works for arrays spanning processes.

    Single-process (the common case, including the virtual 8-device mesh)
    this is exactly ``np.asarray``.  Under a multi-process runtime
    (``init_distributed``), arrays sharded over a global mesh span devices
    this process cannot address, so the host fetch all-gathers across
    processes first — the "final image gather" of the multi-host design
    (module docstring above; every process must call this collectively,
    which holds because all processes run the same pipeline code)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def replicate_params(params, mesh):
    """Fully replicate a parameter pytree over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(params, sharding)


def generate_batch(pipe, prompts: Sequence[str], mesh=None,
                   num_inference_steps: int = 50, seed: int = 0,
                   guidance_scale: Optional[float] = None,
                   negative_prompt: Optional[str] = None,
                   **kwargs):
    """Data-parallel batched generation over a mesh.

    Batches that do not divide the mesh's ``data`` axis are padded to the next
    multiple by repeating the last prompt (like the demo's ``BatchQueue``) and
    the outputs sliced back — so an uneven corpus tail reuses the same
    compiled program instead of crashing or forcing a second compile.  Works
    with an active trace (per-sample heat maps land in ``tc.batch_heat_maps``
    exactly like single-device batched tracing — accumulators shard with the
    batch; ``batch_idx`` beyond the real batch addresses padding samples).
    """
    import jax

    if mesh is None:
        mesh = get_active_mesh()
    assert mesh is not None, 'generate_batch requires a mesh (use make_mesh/use_mesh)'

    dp = mesh.shape['data']
    B = len(prompts)
    prompts = list(prompts)
    pad = (-B) % dp
    if pad:
        # pad-to-batch: padded sizes are multiples of dp, so an uneven tail
        # reuses the full-batch compiled program whenever B > dp
        prompts = prompts + [prompts[-1]] * pad

    pipe.params = replicate_params(pipe.params, mesh)
    key = jax.random.PRNGKey(seed)

    with use_mesh(mesh):
        out = pipe(prompts, num_inference_steps=num_inference_steps,
                   generator=key, guidance_scale=guidance_scale,
                   negative_prompt=negative_prompt, **kwargs)
    if pad:
        out.images = out.images[:B]
        if out.nsfw_content_detected is not None:
            out.nsfw_content_detected = out.nsfw_content_detected[:B]
    return out
