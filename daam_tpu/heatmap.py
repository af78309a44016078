"""Heat-map aggregation and word-level query layer.

TPU-native counterpart of reference ``daam/heatmap.py``.  The core data
structures keep the same names and observable behavior — a keyed collection of
per-(factor, layer, head) maps summed over timesteps
(``daam/heatmap.py:148-172``), a token-level global map queryable by word with
subword merging (``daam/heatmap.py:114-142``), and matplotlib jet overlays
(``daam/heatmap.py:20-53``) — but the storage is redesigned for the jit world:
the traced pipeline emits whole per-factor *blocks* of shape
``(layers, heads, tokens, h, w)`` accumulated on-device inside ``lax.scan``,
and this collection indexes into those blocks lazily instead of growing a
Python dict one tensor at a time.
"""

from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

from .evaluate import compute_ioa
from .nlp import cached_nlp
from .ops.resize import bicubic_resize
from .utils import compute_token_merge_indices

__all__ = ['GlobalHeatMap', 'RawHeatMapCollection', 'WordHeatMap', 'ParsedHeatMap',
           'SyntacticHeatMapPair', 'plot_overlay_heat_map']

RawHeatMapKey = Tuple[int, int, int]  # (factor, layer, head)


def _jet_composite(image_u8: np.ndarray, heat: np.ndarray,
                   color_normalize: bool) -> np.ndarray:
    """Single-pass overlay composite: each pixel blends the jet color of its
    heat value against the photo, weighted by the heat itself.

    Equivalent to the reference's two stacked ``imshow`` calls (jet heat map
    below, photo with per-pixel alpha ``1 − heat`` on top,
    ``daam/heatmap.py:20-53``) — matplotlib "over" compositing of those
    layers reduces to exactly ``photo·(1−heat) + jet·heat`` — but computed
    directly in numpy so one RGB array goes to the renderer.
    """
    import matplotlib

    if color_normalize:
        lo, hi = float(heat.min()), float(heat.max())
        levels = (heat - lo) / (hi - lo) if hi > lo else np.zeros_like(heat)
    else:
        levels = np.clip(heat, 0.0, 1.0)
    jet_rgb = matplotlib.colormaps['jet'](levels)[..., :3]
    photo = np.asarray(image_u8, dtype=np.float32) / 255.0
    w = np.clip(heat, 0.0, 1.0)[..., None]
    return np.clip(photo * (1.0 - w) + jet_rgb * w, 0.0, 1.0)


def plot_overlay_heat_map(im, heat_map, word: Optional[str] = None,
                          out_file=None, crop: Optional[int] = None,
                          color_normalize: bool = True, ax=None):
    """Jet-colormap heat-map overlay, heat-weighted against the image
    (reference ``daam/heatmap.py:20-53``)."""
    import matplotlib.pyplot as plt

    im = np.asarray(im)
    heat_map = np.squeeze(np.asarray(heat_map, dtype=np.float32))
    if crop:
        im = im[crop:-crop, crop:-crop]
        heat_map = heat_map[crop:-crop, crop:-crop]

    composite = _jet_composite(im, heat_map, color_normalize)

    target = ax
    if target is None:
        plt.clf()
        plt.rcParams.update({'font.size': 24})
        target = plt
    target.imshow(composite)
    if word is not None:
        (plt.title if ax is None else ax.set_title)(word)
    if out_file is not None:
        plt.savefig(out_file)


class WordHeatMap:
    """Heat map for one (merged) word (reference ``daam/heatmap.py:56-96``)."""

    def __init__(self, heatmap, word: Optional[str] = None,
                 word_idx: Optional[int] = None):
        self.word = word
        self.word_idx = word_idx
        self.heatmap = heatmap  # (h, w) jnp/np array

    @property
    def value(self):
        return self.heatmap

    def plot_overlay(self, image, out_file=None, color_normalize: bool = True,
                     ax=None, **expand_kwargs):
        plot_overlay_heat_map(
            image,
            self.expand_as(image, **expand_kwargs),
            word=self.word,
            out_file=out_file,
            color_normalize=color_normalize,
            ax=ax,
        )

    def expand_as(self, image, absolute: bool = False,
                  threshold: Optional[float] = None, plot: bool = False,
                  **plot_kwargs):
        """Bicubic-expand to the image's size with min-max normalization
        (reference ``daam/heatmap.py:77-93``)."""
        import jax.numpy as jnp

        if hasattr(image, 'size') and not isinstance(image, np.ndarray):
            size = (image.size[0], image.size[1])  # PIL: (w, h) — ref uses size[0], size[1]
        else:
            arr = np.asarray(image)
            size = (arr.shape[0], arr.shape[1])

        im = jnp.asarray(self.heatmap, dtype=jnp.float32)[None, None]
        im = bicubic_resize(im, size)[0, 0]

        if not absolute:
            im = (im - im.min()) / (im.max() - im.min() + 1e-8)
        if threshold:
            im = (im > threshold).astype(jnp.float32)

        im = np.asarray(im)
        if plot:
            self.plot_overlay(image, **plot_kwargs)
        return im

    def compute_ioa(self, other: 'WordHeatMap'):
        return compute_ioa(self.heatmap, other.heatmap)


@dataclass
class SyntacticHeatMapPair:
    head_heat_map: WordHeatMap
    dep_heat_map: WordHeatMap
    head_text: str
    dep_text: str
    relation: str


@dataclass
class ParsedHeatMap:
    word_heat_map: WordHeatMap
    token: Any  # spaCy token or daam_tpu.nlp.Token


class GlobalHeatMap:
    """Token-level global heat map, queryable by word
    (reference ``daam/heatmap.py:114-142``)."""

    def __init__(self, tokenizer: Any, prompt: str, heat_maps):
        self.tokenizer = tokenizer
        self.heat_maps = heat_maps  # (tokens, x, x)
        self.prompt = prompt
        self.compute_word_heat_map = lru_cache(maxsize=50)(self.compute_word_heat_map)

    def compute_word_heat_map(self, word: str, word_idx: Optional[int] = None,
                              offset_idx: int = 0) -> WordHeatMap:
        import jax.numpy as jnp

        merge_idxs, word_idx = compute_token_merge_indices(
            self.tokenizer, self.prompt, word, word_idx, offset_idx)
        maps = jnp.asarray(self.heat_maps)
        return WordHeatMap(maps[jnp.asarray(merge_idxs)].mean(0), word, word_idx)

    def parsed_heat_maps(self) -> Iterable[ParsedHeatMap]:
        for token in cached_nlp(self.prompt):
            try:
                heat_map = self.compute_word_heat_map(token.text)
                yield ParsedHeatMap(heat_map, token)
            except ValueError:
                pass

    def dependency_relations(self) -> Iterable[SyntacticHeatMapPair]:
        for token in cached_nlp(self.prompt):
            if token.dep_ != 'ROOT':
                try:
                    dep_heat_map = self.compute_word_heat_map(token.text)
                    head_heat_map = self.compute_word_heat_map(token.head.text)
                    yield SyntacticHeatMapPair(head_heat_map, dep_heat_map,
                                               token.head.text, token.text,
                                               token.dep_)
                except ValueError:
                    pass


class RawHeatMapCollection:
    """Per-(factor, layer, head) heat maps summed over timesteps.

    Mirrors reference ``daam/heatmap.py:148-172``'s API while adding an
    efficient *block* path: jitted pipelines register one on-device array per
    spatial factor, shaped ``(layers, heads, tokens, h, w)`` (already summed
    across steps inside the sampling ``lax.scan``), tagged with the global
    layer indices those rows correspond to.  Iteration flattens blocks into
    the reference's per-key view lazily.
    """

    def __init__(self):
        self.ids_to_heatmaps: Dict[RawHeatMapKey, Any] = {}
        # factor -> (block array (L, H, T, h, w), list of global layer ids)
        self.blocks: Dict[int, Tuple[Any, List[int]]] = {}

    def update(self, factor: int, layer_idx: int, head_idx: int, heatmap):
        """Accumulate one ``(tokens, h, w)`` map (reference per-call path)."""
        import jax.numpy as jnp

        key = (factor, layer_idx, head_idx)
        heatmap = jnp.asarray(heatmap, dtype=jnp.float32)
        if key in self.ids_to_heatmaps:
            self.ids_to_heatmaps[key] = self.ids_to_heatmaps[key] + heatmap
        else:
            self.ids_to_heatmaps[key] = heatmap

    def update_block(self, factor: int, block, layer_ids: List[int]):
        """Register a whole per-factor block from a traced pipeline run.

        ``block``: array ``(num_layers, num_heads, tokens, h, w)`` summed over
        timesteps; ``layer_ids``: global layer index for each row.
        """
        import jax.numpy as jnp

        block = jnp.asarray(block, dtype=jnp.float32)
        if factor in self.blocks:
            old, ids = self.blocks[factor]
            assert ids == list(layer_ids), 'layer ids changed between updates'
            block = old + block
        self.blocks[factor] = (block, list(layer_ids))

    def _iter_block_items(self):
        for factor, (block, layer_ids) in self.blocks.items():
            for li, layer in enumerate(layer_ids):
                for head in range(block.shape[1]):
                    yield (factor, layer, head), block[li, head]

    def __iter__(self):
        yield from self.ids_to_heatmaps.items()
        yield from self._iter_block_items()

    def __len__(self):
        n = len(self.ids_to_heatmaps)
        for _, (block, layer_ids) in self.blocks.items():
            n += len(layer_ids) * block.shape[1]
        return n

    def factors(self):
        return {k[0] for k, _ in iter(self)}

    def layers(self):
        return {k[1] for k, _ in iter(self)}

    def heads(self):
        return {k[2] for k, _ in iter(self)}

    def clear(self):
        self.ids_to_heatmaps.clear()
        self.blocks.clear()
