import numpy as np
import pytest

from daam_tpu.evaluate import (MeanEvaluator, UnsupervisedEvaluator, compute_ioa,
                               compute_iou, load_mask)


def square_mask(size, lo, hi):
    m = np.zeros((size, size), dtype=np.float32)
    m[lo:hi, lo:hi] = 1.0
    return m


def test_iou_identity():
    m = square_mask(64, 10, 30)
    assert compute_iou(m, m) == pytest.approx(1.0, abs=1e-6)


def test_iou_disjoint():
    a = square_mask(64, 0, 10)
    b = square_mask(64, 40, 60)
    assert compute_iou(a, b) == pytest.approx(0.0, abs=1e-6)


def test_iou_half_overlap():
    a = square_mask(64, 0, 32)   # top-left 32x32
    b = np.zeros((64, 64), dtype=np.float32)
    b[0:32, 16:48] = 1.0
    iou = compute_iou(a, b)
    assert iou == pytest.approx((32 * 16) / (2 * 32 * 32 - 32 * 16), abs=1e-4)


def test_iou_resizes_and_binarizes():
    a = square_mask(32, 8, 24)
    b = square_mask(64, 16, 48)
    assert compute_iou(a, b) > 0.85  # same box after 2x upsample (edge softening)


def test_ioa_subset():
    a = square_mask(64, 10, 20)          # small box
    b = square_mask(64, 0, 40)           # contains a
    assert compute_ioa(a, b) == pytest.approx(1.0, abs=1e-6)
    assert compute_ioa(b, a) == pytest.approx(100 / 1600, abs=1e-4)


def test_load_mask_alpha(tmp_path):
    import PIL.Image
    arr = np.zeros((8, 8, 4), dtype=np.uint8)
    arr[2:6, 2:6, 3] = 255
    PIL.Image.fromarray(arr).save(tmp_path / 'm.png')
    mask = load_mask(str(tmp_path / 'm.png'))
    assert mask.shape == (8, 8)
    assert mask.sum() == 16


def test_mean_evaluator_format():
    ev = MeanEvaluator('Test')
    m = square_mask(16, 2, 10)
    ev.log_iou(m, m)
    ev.log_intensity(m)
    s = str(ev)
    assert s.startswith('Test<1.0000')
    assert 'mIoU' in s and 'mInt' in s and '1 samples' in s


def test_mean_evaluator_best_of_preds():
    ev = MeanEvaluator()
    truth = square_mask(16, 0, 8)
    bad = square_mask(16, 8, 16)
    ev.log_iou([bad, truth], truth)
    assert ev.mean_iou == pytest.approx(1.0, abs=1e-6)


def test_unsupervised_evaluator_hungarian():
    ev = UnsupervisedEvaluator()
    a = square_mask(16, 0, 8)
    b = square_mask(16, 8, 16)
    # Class 0 predictions match gt 1 and vice versa: Hungarian should fix it.
    ev.log_iou(a, a, gt_idx=0, pred_idx=1)
    ev.log_iou(b, b, gt_idx=1, pred_idx=0)
    assert ev.mean_iou == pytest.approx(1.0, abs=1e-6)
    ev.increment()
    assert len(ev) == 1
    assert 'mIoU' in str(ev)


def test_unsupervised_nonsquare_label_sets():
    """Gt labels {0,1,2} vs pred labels {0,1}: the assignment matrix is
    padded square; the row matched to a never-logged column contributes
    0 IoU and 0 count (reference evaluate.py:60-72 semantics)."""
    ev = UnsupervisedEvaluator()
    a = square_mask(16, 0, 8)
    b = square_mask(16, 8, 16)
    ev.log_iou(a, a, gt_idx=0, pred_idx=1)   # perfect, permuted
    ev.log_iou(b, b, gt_idx=1, pred_idx=0)   # perfect, permuted
    ev.log_iou(a, b, gt_idx=2, pred_idx=0)   # disjoint: IoU 0
    # Hungarian: (0,1)=1.0, (1,0)=1.0, (2,2) never logged -> 0/0 contribution
    assert ev.mean_iou == pytest.approx(1.0, abs=1e-6)


def test_unsupervised_missing_pairs_and_repeats():
    """Sparse (gt,pred) tables: repeated logs accumulate sum+count per cell;
    unlogged cells on the assignment diagonal don't poison the mean."""
    ev = UnsupervisedEvaluator()
    a = square_mask(16, 0, 8)
    b = square_mask(16, 8, 16)
    ev.log_iou(a, a, gt_idx=0, pred_idx=0)   # 1.0
    ev.log_iou(b, a, gt_idx=0, pred_idx=0)   # 0.0 (same cell, second sample)
    ev.log_iou(b, b, gt_idx=1, pred_idx=1)   # 1.0
    # cells: (0,0) sum=1.0 count=2; (1,1) sum=1.0 count=1 -> 2/3
    assert ev.mean_iou == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_unsupervised_matches_reference_formula():
    """Randomized sparse table: our accumulator agrees with a direct
    transcription of the reference's defaultdict + square-matrix math."""
    from collections import defaultdict

    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(3)
    ev = UnsupervisedEvaluator()
    ref = defaultdict(list)
    masks = [square_mask(16, 0, 8), square_mask(16, 8, 16),
             square_mask(16, 4, 12)]
    for _ in range(30):
        g, p = int(rng.randint(4)), int(rng.randint(3))
        ma, mb = masks[rng.randint(3)], masks[rng.randint(3)]
        ev.log_iou(ma, mb, gt_idx=g, pred_idx=p)
        ref[g].append((p, compute_iou(ma, mb)))

    n = max(max(ref), max(y[0] for x in ref.values() for y in x)) + 1
    iou_m = np.zeros((n, n))
    cnt_m = np.zeros((n, n))
    for g, entries in ref.items():
        for p, iou in entries:
            iou_m[g, p] += iou
            cnt_m[g, p] += 1
    rows, cols = linear_sum_assignment(iou_m, maximize=True)
    expect = iou_m[rows, cols].sum() / cnt_m[rows, cols].sum()
    assert ev.mean_iou == pytest.approx(expect, abs=1e-6)
