"""Experiment persistence: serializable generations, COCO label tables.

TPU-native counterpart of reference ``daam/experiment.py``.  The on-disk
contract is identical (directory layout ``path/id/subtype/`` with
``generation.pt``, ``output.png``, ``prompt.txt``, ``seed.txt``,
``{word}.gt.png`` truth masks, ``{word}.{name}.pred.png`` prediction masks,
``annotations.json``, ``{word}.heat_map.png`` — reference
``daam/experiment.py:140-167,303-344``), so experiment folders written by
either implementation are interchangeable at the file level.  The tensor
payload inside ``generation.pt`` is a plain pickle of numpy arrays rather
than a torch checkpoint (no torch dependency on the load path).
"""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union
import json
import pickle

import numpy as np
import PIL.Image

from .evaluate import load_mask

__all__ = ['GenerationExperiment', 'COCO80_LABELS', 'COCOSTUFF27_LABELS',
           'COCO80_INDICES', 'COCO80_ONTOLOGY', 'COCO80_TO_27',
           'build_word_list_coco80']


from .coco import (COCO80_LABELS, COCO80_INDICES, UNUSED_LABELS,  # noqa: F401
                   COCOSTUFF27_LABELS, COCO80_ONTOLOGY, COCO80_TO_27,
                   build_word_list_coco80)


def _add_mask(masks: Dict[str, np.ndarray], word: str, mask: np.ndarray,
              simplify80: bool = False) -> Dict[str, np.ndarray]:
    """Merge a mask into the dict, optionally coarsening COCO-80 → 27
    (reference ``daam/experiment.py:89-99``)."""
    if simplify80:
        word = COCO80_TO_27.get(word, word)
    if word in masks:
        masks[word] = np.clip(masks[word.lower()] + mask, 0, 1)
    else:
        masks[word] = mask
    return masks


def _mask_to_rgba_png(mask: np.ndarray) -> PIL.Image.Image:
    arr = (np.asarray(mask, dtype=np.float32) * 255).astype(np.uint8)
    return PIL.Image.fromarray(np.repeat(arr[..., None], 4, axis=-1))


@dataclass
class GenerationExperiment:
    """Serializable generation + heat maps (reference ``daam/experiment.py:102-344``)."""

    image: Any  # PIL.Image.Image
    global_heat_map: Any  # (tokens, x, x) array
    prompt: str

    seed: Optional[int] = None
    id: str = '.'
    path: Optional[Path] = None

    truth_masks: Optional[Dict[str, np.ndarray]] = None
    prediction_masks: Optional[Dict[str, np.ndarray]] = None
    annotations: Optional[Dict[str, Any]] = None
    subtype: Optional[str] = '.'
    tokenizer: Any = None

    def __post_init__(self):
        if isinstance(self.path, str):
            self.path = Path(self.path)
        self.path = None if self.path is None else self.path / self.id

    def nsfw(self) -> bool:
        """All-black output means the safety checker fired
        (reference ``daam/experiment.py:125-126``)."""
        return bool(np.sum(np.array(self.image)) == 0)

    def heat_map(self, tokenizer: Any = None):
        if tokenizer is None:
            tokenizer = self.tokenizer
        from .heatmap import GlobalHeatMap
        return GlobalHeatMap(tokenizer, self.prompt, self.global_heat_map)

    def clear_checkpoint(self):
        path = self if isinstance(self, Path) else self.path
        (path / 'generation.pt').unlink(missing_ok=True)

    def _payload(self) -> dict:
        return {
            'image': np.array(self.image),
            'global_heat_map': np.asarray(self.global_heat_map, dtype=np.float32),
            'prompt': self.prompt,
            'seed': self.seed,
            'id': self.id,
            'subtype': self.subtype,
            'annotations': self.annotations,
            'format': 'daam_tpu.v1',
        }

    def save(self, path: Optional[str] = None, heat_maps: bool = True,
             tokenizer: Any = None):
        """Write the reference's exact artifact set
        (``daam/experiment.py:140-167``, README contract)."""
        if path is None:
            path = self.path
        else:
            path = Path(path) / self.id
        self.path = path

        if tokenizer is None:
            tokenizer = self.tokenizer

        (path / self.subtype).mkdir(parents=True, exist_ok=True)
        with (path / self.subtype / 'generation.pt').open('wb') as f:
            pickle.dump(self._payload(), f)
        self.image.save(path / self.subtype / 'output.png')

        (path / 'prompt.txt').write_text(self.prompt)
        (path / 'seed.txt').write_text(str(self.seed))

        if self.truth_masks is not None:
            for name, mask in self.truth_masks.items():
                _mask_to_rgba_png(mask).save(path / f'{name.lower()}.gt.png')

        if heat_maps and tokenizer is not None:
            self.save_all_heat_maps(tokenizer)

        self.save_annotations()

    def save_annotations(self, path: Optional[Path] = None):
        if path is None:
            path = self.path
        if self.annotations is not None:
            with (path / 'annotations.json').open('w') as f:
                json.dump(self.annotations, f)

    def _load_truth_masks(self, simplify80: bool = False) -> Dict[str, np.ndarray]:
        masks: Dict[str, np.ndarray] = {}
        for mask_path in self.path.glob('*.gt.png'):
            word = mask_path.name.split('.gt.png')[0].lower()
            _add_mask(masks, word, load_mask(str(mask_path)), simplify80)
        return masks

    def _load_pred_masks(self, pred_prefix: str, composite: bool = False,
                         simplify80: bool = False,
                         vocab: Optional[List[str]] = None) -> Dict[str, np.ndarray]:
        masks: Dict[str, np.ndarray] = {}
        if vocab is None:
            vocab = UNUSED_LABELS

        if composite:
            try:
                im = PIL.Image.open(
                    self.path / self.subtype / f'composite.{pred_prefix}.pred.png')
                im = np.array(im)
                for mask_idx in np.unique(im):
                    mask = (im == mask_idx).astype(np.float32)
                    _add_mask(masks, vocab[mask_idx], mask, simplify80)
            except FileNotFoundError:
                pass
        else:
            for mask_path in (self.path / self.subtype).glob(f'*.{pred_prefix}.pred.png'):
                mask = load_mask(str(mask_path))
                word = mask_path.name.split(f'.{pred_prefix}.pred')[0].lower()
                _add_mask(masks, word, mask, simplify80)
        return masks

    def clear_prediction_masks(self, name: str):
        path = self if isinstance(self, Path) else self.path
        path = path / self.subtype
        for mask_path in path.glob(f'*.{name}.pred.png'):
            mask_path.unlink()

    def save_prediction_mask(self, mask, word: str, name: str):
        path = self if isinstance(self, Path) else self.path
        im = _mask_to_rgba_png(np.asarray(mask))
        im.save(path / self.subtype / f'{word.lower()}.{name}.pred.png')

    def save_heat_map(self, word: str, tokenizer: Any = None,
                      crop: Optional[int] = None, output_prefix: str = '',
                      absolute: bool = False) -> Path:
        from .heatmap import GlobalHeatMap

        if tokenizer is None:
            tokenizer = self.tokenizer

        path = self.path / self.subtype / f'{output_prefix}{word.lower()}.heat_map.png'
        heat_map = GlobalHeatMap(tokenizer, self.prompt, self.global_heat_map)
        heat_map.compute_word_heat_map(word).expand_as(
            self.image, color_normalize=not absolute, out_file=path, plot=True)
        return path

    def save_all_heat_maps(self, tokenizer: Any = None,
                           crop: Optional[int] = None) -> Dict[str, Path]:
        path_map: Dict[str, Path] = {}
        if tokenizer is None:
            tokenizer = self.tokenizer
        for word in self.prompt.split(' '):
            try:
                path_map[word] = self.save_heat_map(word, tokenizer, crop=crop)
            except Exception:
                pass
        return path_map

    # -- static probes (reference ``daam/experiment.py:259-287``) ------------
    @staticmethod
    def contains_truth_mask(path: Union[str, Path], prompt_id: Optional[str] = None) -> bool:
        if prompt_id is None:
            return any(Path(path).glob('*.gt.png'))
        return any((Path(path) / prompt_id).glob('*.gt.png'))

    @staticmethod
    def read_seed(path: Union[str, Path], prompt_id: Optional[str] = None) -> int:
        if prompt_id is None:
            return int(Path(path).joinpath('seed.txt').read_text())
        return int(Path(path).joinpath(prompt_id).joinpath('seed.txt').read_text())

    @staticmethod
    def has_annotations(path: Union[str, Path]) -> bool:
        return Path(path).joinpath('annotations.json').exists()

    @staticmethod
    def has_experiment(path: Union[str, Path], prompt_id: str) -> bool:
        return (Path(path) / prompt_id / 'generation.pt').exists()

    @staticmethod
    def read_prompt(path: Union[str, Path], prompt_id: Optional[str] = None) -> str:
        if prompt_id is None:
            prompt_id = '.'
        with (Path(path) / prompt_id / 'prompt.txt').open('r') as f:
            return f.read().strip()

    def _try_load_annotations(self):
        if not (self.path / 'annotations.json').exists():
            return None
        return json.load((self.path / 'annotations.json').open())

    def annotate(self, key: str, value: Any) -> 'GenerationExperiment':
        if self.annotations is None:
            self.annotations = {}
        self.annotations[key] = value
        return self

    @classmethod
    def load(cls, path, pred_prefix: str = 'daam', composite: bool = False,
             simplify80: bool = False, vocab: Optional[List[str]] = None,
             subtype: str = '.', all_subtypes: bool = False):
        """Load an experiment dir (recursively over subtypes if requested);
        reference ``daam/experiment.py:303-344``."""
        if all_subtypes:
            experiments = []
            for directory in Path(path).iterdir():
                if not directory.is_dir():
                    continue
                try:
                    experiments.append(cls.load(
                        path, pred_prefix=pred_prefix, composite=composite,
                        simplify80=simplify80, vocab=vocab,
                        subtype=directory.name))
                except Exception:
                    pass
            return experiments

        path = Path(path)
        with (path / subtype / 'generation.pt').open('rb') as f:
            payload = pickle.load(f)
        exp = cls(
            image=PIL.Image.fromarray(payload['image']),
            global_heat_map=payload['global_heat_map'],
            prompt=payload['prompt'],
            seed=payload.get('seed'),
            id='.',
            subtype=subtype,
        )
        exp.path = path
        exp.truth_masks = exp._load_truth_masks(simplify80=simplify80)
        exp.prediction_masks = exp._load_pred_masks(
            pred_prefix, composite=composite, simplify80=simplify80, vocab=vocab)
        exp.annotations = exp._try_load_annotations()
        return exp
