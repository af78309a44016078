"""Bicubic parity vs torch.nn.functional.interpolate (the reference's resizer)."""

import numpy as np
import pytest

from daam_tpu.ops.resize import bicubic_resize, resize_weight_matrix

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize('in_size,out_size', [
    (16, 64), (8, 64), (32, 64), (64, 64), (24, 96),
    (64, 512), (96, 768), (64, 16), (512, 64),
])
def test_bicubic_matches_torch(in_size, out_size):
    rng = np.random.RandomState(0)
    x = rng.rand(1, 1, in_size, in_size).astype(np.float32)

    ours = np.asarray(bicubic_resize(x, (out_size, out_size)))
    theirs = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                           mode='bicubic').numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_bicubic_rect_and_batched():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 10, 20).astype(np.float32)
    ours = np.asarray(bicubic_resize(x, (37, 53)))
    theirs = F.interpolate(torch.from_numpy(x), size=(37, 53), mode='bicubic').numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_clamp_min():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 1, 8, 8).astype(np.float32)
    out = np.asarray(bicubic_resize(x, (32, 32), clamp_min=0.0))
    assert (out >= 0).all()


def test_weight_matrix_rows_sum_to_one():
    W = np.asarray(resize_weight_matrix(16, 64))
    np.testing.assert_allclose(W.sum(axis=1), np.ones(64), atol=1e-5)


def test_identity_when_same_size():
    x = np.random.RandomState(3).rand(4, 4).astype(np.float32)
    out = np.asarray(bicubic_resize(x, (4, 4)))
    np.testing.assert_array_equal(out, x)


def test_jit_compatible():
    import jax

    @jax.jit
    def up(x):
        return bicubic_resize(x, (64, 64), clamp_min=0.0)

    x = np.random.RandomState(4).rand(2, 16, 16).astype(np.float32)
    out = np.asarray(up(x))
    assert out.shape == (2, 64, 64)
