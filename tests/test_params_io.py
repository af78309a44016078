"""save_params/load_params round trip."""

import jax.numpy as jnp
import numpy as np

from daam_tpu.models import weights as W
from daam_tpu.models.configs import get_pipeline_config


def test_params_roundtrip(tmp_path):
    cfg = get_pipeline_config('tiny')
    params = W.init_random_params(cfg, seed=0)
    path = tmp_path / 'params.npz'
    W.save_params(params, path)
    loaded = W.load_params(path)

    import jax
    flat_a = dict(W._flatten(params))
    flat_b = dict(W._flatten(loaded))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


def test_params_load_with_dtype(tmp_path):
    cfg = get_pipeline_config('tiny')
    params = W.init_random_params(cfg, seed=0)
    path = tmp_path / 'params.npz'
    W.save_params(params, path)
    loaded = W.load_params(path, dtype=jnp.bfloat16)
    leaf = dict(W._flatten(loaded))['text_encoder/token_embedding/embedding']
    assert leaf.dtype == jnp.bfloat16
