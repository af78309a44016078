"""End-to-end ``daam`` → truth masks → ``daam-evaluate`` round trips.

Asserts the exact reference report-string formats
(``daam/evaluate.py:79-80,115-116``) coming out of the real CLI path, plus
the composite-prediction and vocab-restricted branches
(``daam/run/evaluate.py:61-86``).
"""

import re

import numpy as np
import PIL.Image
import pytest

from daam_tpu.experiment import (COCO80_LABELS, GenerationExperiment,
                                 _write_mask_png)
from daam_tpu.run import evaluate as eval_cli
from daam_tpu.run import generate as gen_cli


def _box_mask(size, lo, hi):
    m = np.zeros((size, size), dtype=np.float32)
    m[lo:hi, lo:hi] = 1.0
    return m


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """One real tiny-model generation with synthetic gt + pred masks.

    The single-prompt action writes the experiment into ``out/exp0`` so the
    corpus root has the ``<root>/<experiment>/`` shape ``daam-evaluate``
    walks (reference ``run/evaluate.py:31``)."""
    out = tmp_path_factory.mktemp('corpus')
    exp_dir = out / 'exp0'
    gen_cli.main(['A dog runs', '--tiny', '-n', '1', '-o', str(exp_dir),
                  '-s', '3'])
    mask = _box_mask(64, 8, 40)
    _write_mask_png(exp_dir / 'dog.gt.png', mask)
    _write_mask_png(exp_dir / 'dog.daam.pred.png', mask)
    return out, exp_dir, mask


def test_labeled_round_trip_exact_report(corpus, capsys):
    out, _, mask = corpus
    ev = eval_cli.main(['-i', str(out)])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    # pred == truth: mIoU 1, CI 0, mInt = mask fill fraction, 1 sample
    m_int = mask.mean()
    assert line == (f'MeanEvaluator<1.0000 (±0.000 mIoU) '
                    f'{m_int:.4f} (mInt) 1 samples>')
    assert ev.mean_iou == pytest.approx(1.0, abs=1e-6)


def test_unlabeled_round_trip_format(corpus, capsys):
    out, _, _ = corpus
    eval_cli.main(['-i', str(out), '-e', 'unlabeled'])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert re.fullmatch(
        r'MeanEvaluator<\d\.\d{4} \(±\d\.\d{3} mIoU\) '
        r'(nan|\d\.\d{4}) \(mInt\) 1 samples>', line), line


def test_hungarian_round_trip_exact_report(corpus, capsys):
    out, _, _ = corpus
    ev = eval_cli.main(['-i', str(out), '-e', 'hungarian'])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert line == 'UnsupervisedEvaluator<1.0000 (mIoU) 1 samples>'
    assert len(ev) == 1


def test_composite_vocab_restricted(tmp_path, capsys):
    """composite.{prefix}.pred.png index-images split against the restricted
    COCO-80 vocab; gt words outside the vocab are skipped."""
    exp_dir = tmp_path / 'exp0'
    exp_dir.mkdir()
    img = PIL.Image.new('RGB', (64, 64), (10, 20, 30))
    heat = np.random.RandomState(0).rand(77, 16, 16).astype(np.float32)
    GenerationExperiment(image=img, global_heat_map=heat,
                         prompt='a dog and a cat', seed=1,
                         path=str(exp_dir)).save(str(exp_dir), heat_maps=False)

    gt_dog = np.zeros((64, 64), dtype=np.float32)
    gt_dog[:32, :] = 1.0    # top half
    gt_cat = np.zeros((64, 64), dtype=np.float32)
    gt_cat[32:, :] = 1.0    # bottom half
    _write_mask_png(exp_dir / 'dog.gt.png', gt_dog)
    _write_mask_png(exp_dir / 'cat.gt.png', gt_cat)
    # a word OUTSIDE the restricted vocab: must be ignored by the scorer
    _write_mask_png(exp_dir / 'unicorn.gt.png', _box_mask(64, 16, 48))

    dog_idx = COCO80_LABELS.index('dog')
    cat_idx = COCO80_LABELS.index('cat')
    comp = np.zeros((64, 64), dtype=np.uint8)
    comp[:32, :32] = dog_idx   # matches gt_dog's upper-left quadrant only
    comp[32:, 32:] = cat_idx   # matches gt_cat's lower-right quadrant only
    PIL.Image.fromarray(comp).save(exp_dir / 'composite.daam.pred.png')

    ev = eval_cli.main(['-i', str(tmp_path), '-m', 'composite',
                        '-r', 'coco80'])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    # dog pred quadrant ⊂ dog gt half: IoU = 1024/2048; same for cat
    assert ev.mean_iou == pytest.approx(0.5, abs=1e-4)
    assert len(ev.ious) == 2  # unicorn (not in vocab) skipped
    assert line.startswith('MeanEvaluator<0.5000')
