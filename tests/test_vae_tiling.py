"""Tiled VAE decode: parity with the whole-latents decode."""

import numpy as np
import pytest

import jax

from daam_tpu import set_seed
from daam_tpu.pipeline.sd import StableDiffusionPipeline


@pytest.fixture(scope='module')
def pipe():
    return StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')


def test_tiled_matches_full_decode(pipe):
    """Interior pixels must match the untiled decode; only the overlap bands
    may differ slightly (the decoder's receptive field crosses tile edges)."""
    import jax.numpy as jnp
    from daam_tpu.models.vae import AutoencoderKL

    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.randn(1, 32, 32, 4).astype(np.float32))

    def full(params, z):
        scaled = z / pipe.config.vae.scaling_factor
        img = pipe.vae.apply({'params': params['vae']}, scaled,
                             method=AutoencoderKL.decode)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    ref = np.asarray(full(pipe.params, latents))

    tiled = pipe._build_tiled_decode(1, 32, 32, tile=20, overlap=8)
    out = np.asarray(tiled(pipe.params, latents))

    assert out.shape == ref.shape
    # Global agreement is approximate; interior of each tile matches closely.
    assert np.abs(out - ref).mean() < 0.05
    # normalization sane: no un-covered pixels
    assert np.isfinite(out).all()


def test_generation_with_forced_tiling(pipe):
    pipe.enable_vae_tiling(True)
    try:
        out = pipe('a dog', num_inference_steps=1, generator=set_seed(0))
        assert out.images[0].size == (16, 16)
    finally:
        pipe.enable_vae_tiling('auto')


def test_single_tile_when_latents_small(pipe):
    tiled = pipe._build_tiled_decode(1, 8, 8, tile=64, overlap=16)
    import jax.numpy as jnp
    out = np.asarray(tiled(pipe.params, jnp.zeros((1, 8, 8, 4))))
    assert out.shape == (1, 16, 16, 3)
