"""Batched tracing + attention transplant over a mesh (combined flows)."""

import numpy as np
import pytest

import jax

from daam_tpu import set_seed, trace
from daam_tpu.parallel import make_mesh, generate_batch
from daam_tpu.pipeline.sd import StableDiffusionPipeline

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def test_batched_save_load_heads():
    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    prompts = ['a dog runs', 'a cat sits']
    with trace(pipe, save_heads=True, data_dir='batch-test'):
        out1 = pipe(prompts, num_inference_steps=2, generator=set_seed(0))
    with trace(pipe, load_heads=True, data_dir='batch-test'):
        out2 = pipe(prompts, num_inference_steps=2, generator=set_seed(0))
    for a, b in zip(out1.images, out2.images):
        np.testing.assert_allclose(np.array(a, np.float32),
                                   np.array(b, np.float32), atol=2.0)


def test_mesh_traced_to_experiment(tmp_path):
    pipe = StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')
    mesh = make_mesh(dp=2, tp=1)
    prompts = ['a dog runs', 'a cat sits']
    with trace(pipe) as tc:
        generate_batch(pipe, prompts, mesh=mesh, num_inference_steps=2, seed=0)
        for i, _ in enumerate(prompts):
            exp = tc.to_experiment(tmp_path, seed=0, id=f'e{i}', batch_idx=i)
            exp.save(heat_maps=False)
    assert (tmp_path / 'e0' / 'prompt.txt').read_text() == 'a dog runs'
    assert (tmp_path / 'e1' / 'prompt.txt').read_text() == 'a cat sits'
