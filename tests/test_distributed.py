"""Multi-host helper tests (single-process semantics + global-mesh layout)."""

import numpy as np
import pytest

import jax

from daam_tpu.parallel import (generate_batch, init_distributed,
                               is_multi_process, make_global_mesh)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def test_init_distributed_single_process_noop():
    assert init_distributed() is False
    assert is_multi_process() is False
    # idempotent
    assert init_distributed() is False


def test_make_global_mesh_layout():
    mesh = make_global_mesh(tp=2)
    assert mesh.shape == {'data': 4, 'model': 2, 'spatial': 1}
    # model (and spatial) groups are contiguous device ids (intra-host by
    # construction; mesh.devices is (dp, tp, sp))
    arr = np.asarray(mesh.devices)
    for row in arr:
        ids = [d.id for d in row.ravel()]
        assert ids == sorted(ids)


def test_make_global_mesh_generates():
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    mesh = make_global_mesh(tp=1)
    out = generate_batch(pipe, ['a dog runs'] * 8, mesh=mesh,
                         num_inference_steps=1, seed=0)
    assert len(out.images) == 8


def test_make_global_mesh_full_tp():
    mesh = make_global_mesh(dp=1, tp=8)
    assert mesh.shape == {'data': 1, 'model': 8, 'spatial': 1}
