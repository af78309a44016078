"""Segmentation-style metrics and evaluators (IoU/IoA, Hungarian mIoU).

TPU-native counterpart of reference ``daam/evaluate.py``: same binarization
semantics (resize with bicubic, then threshold at 1 — reference
``daam/evaluate.py:14-35``), same evaluator report strings
(``daam/evaluate.py:79-80,115-116``).  Metric math runs through jnp (jit-able
and batchable); the evaluators are host-side bookkeeping.
"""

from collections import defaultdict
from typing import Dict, List, Union

import numpy as np

from .ops.resize import bicubic_resize

__all__ = ['compute_iou', 'MeanEvaluator', 'load_mask', 'compute_ioa',
           'UnsupervisedEvaluator']


def _match_size(a, b):
    """Resize ``a`` to ``b``'s spatial shape (bicubic) then binarize at 1,
    mirroring reference ``daam/evaluate.py:15-18``."""
    import jax.numpy as jnp

    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    if a.shape[0] != b.shape[0]:
        a = bicubic_resize(a[None, None], (b.shape[0], b.shape[1]))[0, 0]
        a = (a >= 1.0).astype(jnp.float32)
    return a, b


def compute_iou(a, b) -> float:
    """Intersection-over-union (reference ``daam/evaluate.py:14-23``)."""
    a, b = _match_size(a, b)
    intersection = (a * b).sum()
    union = a.sum() + b.sum() - intersection
    return float(intersection / (union + 1e-8))


def compute_ioa(a, b) -> float:
    """Intersection-over-area of ``a`` (reference ``daam/evaluate.py:26-35``)."""
    a, b = _match_size(a, b)
    intersection = (a * b).sum()
    area = a.sum()
    return float(intersection / (area + 1e-8))


def load_mask(path: str) -> np.ndarray:
    """Binary mask from a PNG's alpha channel (reference ``daam/evaluate.py:38-43``)."""
    import PIL.Image as Image

    mask = np.array(Image.open(path)).astype(np.float32)[:, :, 3]
    return (mask > 0).astype(np.float32)


class UnsupervisedEvaluator:
    """Hungarian-matched unsupervised mIoU (reference ``daam/evaluate.py:46-80``)."""

    def __init__(self, name: str = 'UnsupervisedEvaluator'):
        self.name = name
        self.ious: Dict[int, list] = defaultdict(list)
        self.num_samples = 0

    def log_iou(self, preds, truth, gt_idx: int = 0, pred_idx: int = 0):
        if not isinstance(preds, list):
            preds = [preds]
        iou = max(compute_iou(pred, truth) for pred in preds)
        self.ious[gt_idx].append((pred_idx, iou))

    @property
    def mean_iou(self) -> float:
        from scipy.optimize import linear_sum_assignment

        n = max(max(self.ious), max(y[0] for x in self.ious.values() for y in x)) + 1
        iou_matrix = np.zeros((n, n))
        count_matrix = np.zeros((n, n))
        for gt_idx, ious in self.ious.items():
            for pred_idx, iou in ious:
                iou_matrix[gt_idx, pred_idx] += iou
                count_matrix[gt_idx, pred_idx] += 1
        row_ind, col_ind = linear_sum_assignment(iou_matrix, maximize=True)
        return iou_matrix[row_ind, col_ind].sum() / count_matrix[row_ind, col_ind].sum()

    def increment(self):
        self.num_samples += 1

    def __len__(self) -> int:
        return self.num_samples

    def __str__(self):
        return f'{self.name}<{self.mean_iou:.4f} (mIoU) {len(self)} samples>'


class MeanEvaluator:
    """Best-of-preds mean IoU with 95% CI + mean intensity
    (reference ``daam/evaluate.py:83-116``)."""

    def __init__(self, name: str = 'MeanEvaluator'):
        self.ious: List[float] = []
        self.intensities: List[float] = []
        self.name = name

    def log_iou(self, preds, truth):
        if not isinstance(preds, list):
            preds = [preds]
        self.ious.append(max(compute_iou(pred, truth) for pred in preds))
        return self

    def log_intensity(self, pred):
        self.intensities.append(float(np.asarray(pred).mean()))
        return self

    @property
    def mean_iou(self) -> float:
        return float(np.mean(self.ious))

    @property
    def mean_intensity(self) -> float:
        return float(np.mean(self.intensities))

    @property
    def ci95_miou(self) -> float:
        return float(1.96 * np.std(self.ious) / np.sqrt(len(self.ious)))

    def __len__(self) -> int:
        return max(len(self.ious), len(self.intensities))

    def __str__(self):
        return (f'{self.name}<{self.mean_iou:.4f} (±{self.ci95_miou:.3f} mIoU) '
                f'{self.mean_intensity:.4f} (mInt) {len(self)} samples>')
