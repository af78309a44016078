"""Child program for the TRUE multi-process tests (test_multiprocess.py).

Launched (2 copies) by the parent test with ``JAX_PLATFORMS=cpu`` and 4
virtual devices per process: ``jax.distributed.initialize`` connects the two
over the local coordinator, giving a genuine 2-process × 4-device global
runtime — cross-process collectives run over Gloo, the CPU analog of DCN.
This is the strongest multi-host evidence obtainable without a real pod
(SURVEY.md §5 "distributed communication backend"): the documented pod launch
flow (``parallel/distributed.py`` module docstring) executes end-to-end, not
just on a single-process virtual mesh.

Each child writes its sample-0 image and heat map to ``outdir`` for the
parent to compare against a single-process ground truth, and touches
``ok.<pid>`` only after every in-child assertion passed.
"""

import sys
from pathlib import Path


def _transplant(mesh, outdir: Path, pid: int) -> None:
    """save_heads → load_heads replay across processes: the replay buffer is
    staged to host through ``fetch_global`` (each process holds the FULL
    global buffer, not just its local batch shards), then re-fed to the
    sharded replay program.  Same-seed replay must reproduce the original
    images exactly (the demo's transplant contract,
    test_parallel_transplant.py, here across real process boundaries)."""
    import numpy as np

    from daam_tpu import trace
    from daam_tpu.parallel import generate_batch
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    prompts = ['a dog runs', 'a cat sits', 'a bird flies', 'a fish swims']
    # persist_heads=False: both processes would race writing the same
    # cache-dir .npz; the in-process registry is all the replay needs here.
    with trace(pipe, save_heads=True, data_dir='mp-transplant',
               persist_heads=False):
        out1 = generate_batch(pipe, prompts, mesh=mesh,
                              num_inference_steps=2, seed=0)
    with trace(pipe, load_heads=True, data_dir='mp-transplant',
               persist_heads=False):
        out2 = generate_batch(pipe, prompts, mesh=mesh,
                              num_inference_steps=2, seed=0)
    for a, b in zip(out1.images, out2.images):
        np.testing.assert_allclose(np.array(a, np.float32),
                                   np.array(b, np.float32), atol=2.0)
    np.save(outdir / f'tr_img0.{pid}.npy',
            np.array(out1.images[0], dtype=np.float32))
    (outdir / f'ok.{pid}').touch()


def main(pid: int, num_processes: int, port: str, outdir: str,
         mode: str = 'generate') -> None:
    from daam_tpu.parallel import (init_distributed, make_global_mesh,
                                   generate_batch, is_multi_process)

    # The handshake must precede any other JAX usage (distributed.py).
    assert init_distributed(f'127.0.0.1:{port}',
                            num_processes=num_processes,
                            process_id=pid) is True
    assert is_multi_process()

    import jax
    import numpy as np

    assert jax.process_count() == num_processes
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * num_processes

    # DCN-aware layout: every 'model' (and 'spatial') group must stay within
    # one process so per-layer collectives ride the fast interconnect.
    mesh = make_global_mesh(tp=2)
    assert mesh.shape['model'] == 2
    for row in np.asarray(mesh.devices):
        procs = {d.process_index for d in row.ravel()}
        assert len(procs) == 1, f'tp group spans processes: {procs}'

    if mode == 'transplant':
        _transplant(mesh, Path(outdir), pid)
        return

    from daam_tpu import trace
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    prompts = ['a dog runs', 'a cat sits', 'a bird flies', 'a fish swims']

    with trace(pipe) as tc:
        out = generate_batch(pipe, prompts, mesh=mesh,
                             num_inference_steps=2, seed=0)
        # every process can query every sample, including ones whose
        # accumulator shards live on the other process (fetch_global)
        maps0 = np.asarray(tc.compute_global_heat_map(batch_idx=0).heat_maps)
        maps3 = np.asarray(tc.compute_global_heat_map(batch_idx=3).heat_maps)

    assert len(out.images) == len(prompts)
    assert np.isfinite(maps0).all() and np.isfinite(maps3).all()

    outdir = Path(outdir)
    np.save(outdir / f'img0.{pid}.npy',
            np.array(out.images[0], dtype=np.float32))
    np.save(outdir / f'img3.{pid}.npy',
            np.array(out.images[3], dtype=np.float32))
    np.save(outdir / f'maps0.{pid}.npy', maps0)
    np.save(outdir / f'maps3.{pid}.npy', maps3)
    (outdir / f'ok.{pid}').touch()


if __name__ == '__main__':
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
         sys.argv[5] if len(sys.argv) > 5 else 'generate')
