"""Bicubic resize as separable matmuls — the TPU-idiomatic interpolation path.

The reference leans on ``torch.nn.functional.interpolate(mode='bicubic')`` in
four places (heat-map upsample ``daam/trace.py:116``, word-map expand
``daam/heatmap.py:80``, IoU size-matching ``daam/evaluate.py:16,28``).  A
gather-based interpolation maps poorly onto the TPU's MXU; but 2-D bicubic
resampling (without antialiasing) is an exact *linear* map, separable per axis.
We therefore precompute per-axis weight matrices ``W_out×in`` on the host
(cached by shape) and evaluate the resize as two dense matmuls —
``W_h @ image @ W_w.T`` — which XLA tiles straight onto the systolic array and
fuses with neighbors.

Numerics match torch's implementation: Keys cubic kernel with A = -0.75,
half-pixel centers (``align_corners=False``), and replicate edge handling
(source indices clamped to the valid range).
"""

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ['bicubic_resize', 'resize_weight_matrix']

_A = -0.75  # torch/OpenCV cubic convolution parameter (jax.image uses -0.5)


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (_A + 2.0) * x3 - (_A + 3.0) * x2 + 1.0,
        np.where(x < 2.0, _A * x3 - 5.0 * _A * x2 + 8.0 * _A * x - 4.0 * _A, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def _weight_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) bicubic resampling matrix, float32."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    # Half-pixel source coordinates (align_corners=False).
    x = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    W = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for tap in range(-1, 3):
        idx = np.clip(x0 + tap, 0, in_size - 1)  # replicate edges, like torch
        w = _cubic_kernel(t - tap)
        np.add.at(W, (rows, idx), w)
    return W.astype(np.float32)


def resize_weight_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """The (out, in) bicubic weight matrix as a jnp array (host-cached)."""
    return jnp.asarray(_weight_matrix_np(in_size, out_size))


def bicubic_resize(x: jnp.ndarray, size: Tuple[int, int],
                   clamp_min: float = None, clamp_max: float = None) -> jnp.ndarray:
    """Resize the last two dims of ``x`` to ``size`` with torch-parity bicubic.

    ``x`` may have any number of leading batch dims.  ``clamp_min``/``clamp_max``
    optionally clamp the result (the reference clamps undershoot to ≥0 when
    merging heat maps, ``daam/trace.py:116``).  Runs as two MXU matmuls.
    """
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    # HIGHEST precision keeps the interpolation exact in fp32 on the MXU
    # (default TPU matmul precision is bf16-accumulate, which visibly blurs
    # the torch-parity we promise).
    import jax

    if in_h != out_h:
        Wh = resize_weight_matrix(in_h, out_h)
        xf = jnp.einsum('oi,...iw->...ow', Wh, xf,
                        precision=jax.lax.Precision.HIGHEST)
    if in_w != out_w:
        Ww = resize_weight_matrix(in_w, out_w)
        xf = jnp.einsum('oi,...hi->...ho', Ww, xf,
                        precision=jax.lax.Precision.HIGHEST)

    if clamp_min is not None or clamp_max is not None:
        xf = jnp.clip(xf, clamp_min, clamp_max)
    if orig_dtype in (jnp.bfloat16, jnp.float16):
        xf = xf.astype(orig_dtype)
    return xf
