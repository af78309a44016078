"""Numerical parity with the reference DAAM aggregation math.

The BASELINE.md fidelity gate is ≥0.99 Spearman vs PyTorch DAAM heat maps.
diffusers isn't installable here, so this test reimplements the *reference's
math* (torch bicubic interpolate + mean aggregation + expand, per
``daam/trace.py:83-132`` and ``daam/heatmap.py:77-93``) in torch, feeds both
it and our trace pipeline identical synthetic attention probabilities, and
compares the resulting global/word heat maps.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from daam_tpu.ops.resize import bicubic_resize  # noqa: E402


def reference_global_heat_map(blocks, x):
    """Reference aggregation in torch: for every (factor, layer, head) map
    (T, h, w), bicubic-upsample to (x, x), clamp ≥0, then mean over all."""
    merges = []
    for block in blocks.values():  # (L, H, T, h, w)
        t = torch.from_numpy(np.asarray(block))
        L, H, T, h, w = t.shape
        for li in range(L):
            for hi in range(H):
                m = t[li, hi].unsqueeze(1)  # (T,1,h,w)
                up = F.interpolate(m, size=(x, x), mode='bicubic').clamp_(min=0)
                merges.append(up)
    maps = torch.stack(merges, 0).mean(0)[:, 0]
    return maps.numpy()


def our_global_heat_map(blocks, x):
    """Our aggregation: whole-block matmul resize + mean."""
    sums = []
    count = 0
    for block in blocks.values():
        b = jnp.asarray(block)
        L, H = b.shape[:2]
        up = bicubic_resize(b, (x, x), clamp_min=0.0)
        sums.append(up.sum(axis=(0, 1)))
        count += L * H
    return np.asarray(sum(sums) / count)


def spearman(a, b):
    from scipy.stats import spearmanr
    return spearmanr(np.asarray(a).ravel(), np.asarray(b).ravel()).statistic


@pytest.fixture
def synthetic_blocks():
    rng = np.random.RandomState(0)
    T = 10
    return {
        1: rng.rand(2, 3, T, 64, 64).astype(np.float32),
        2: rng.rand(3, 4, T, 32, 32).astype(np.float32),
        4: rng.rand(2, 5, T, 16, 16).astype(np.float32),
    }


def test_global_aggregation_parity(synthetic_blocks):
    ref = reference_global_heat_map(synthetic_blocks, 64)
    ours = our_global_heat_map(synthetic_blocks, 64)
    assert ref.shape == ours.shape == (10, 64, 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    assert spearman(ours, ref) >= 0.999


def test_expand_as_parity():
    """WordHeatMap.expand_as vs reference F.interpolate + min-max normalize
    (``daam/heatmap.py:77-93``)."""
    from daam_tpu.heatmap import WordHeatMap
    import PIL.Image

    rng = np.random.RandomState(1)
    hm = rng.rand(64, 64).astype(np.float32)
    img = PIL.Image.new('RGB', (512, 512))

    ours = WordHeatMap(hm).expand_as(img)

    t = torch.from_numpy(hm).unsqueeze(0).unsqueeze(0)
    ref = F.interpolate(t, size=(512, 512), mode='bicubic').squeeze()
    ref = (ref - ref.min()) / (ref.max() - ref.min() + 1e-8)

    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)
    assert spearman(ours, ref.numpy()) >= 0.999


def test_trace_end_to_end_spearman():
    """Full traced pipeline (tiny model): our compute_global_heat_map vs the
    torch reference math applied to the same captured blocks."""
    from daam_tpu import trace, set_seed
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained('tiny')
    with trace(pipe) as tc:
        pipe('a dog runs', num_inference_steps=2, generator=set_seed(0))
        ours = np.asarray(tc.compute_global_heat_map().heat_maps)
        blocks = {f: np.asarray(b[0]) for f, b in tc.batch_heat_maps.items()}

    x = ours.shape[-1]
    ref = reference_global_heat_map(blocks, x)[:ours.shape[0]]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    assert spearman(ours, ref) >= 0.99
