"""Utility layer: seeds, devices, caches, and token→word merge arithmetic.

TPU-native counterpart of reference ``daam/utils.py``.  The key behavioral
contract is :func:`compute_token_merge_indices` (reference ``daam/utils.py:73-91``):
lowercase tokenization, ``</w>`` marker stripping, *all-occurrence* subword-run
matching, and the +1 shift that accounts for the SOS token in the 77-token heat
map.  Seeding returns an explicit ``jax.random.PRNGKey`` instead of mutating
global RNG state (functional JAX idiom replacing ``torch.Generator``,
reference ``daam/utils.py:46-55``).
"""

from functools import lru_cache
from pathlib import Path
from typing import List, Optional, Tuple
import os
import random
import sys

import numpy as np

from .nlp import cached_nlp  # re-exported for API parity with reference utils

__all__ = ['set_seed', 'compute_token_merge_indices', 'plot_mask_heat_map',
           'cached_nlp', 'cache_dir', 'auto_device', 'auto_autocast']


def auto_device(obj=None):
    """Return the preferred JAX device (TPU if present, else CPU), or commit an
    array to it.  Functional analog of reference ``daam/utils.py:22-29``."""
    import jax

    devices = jax.devices()
    dev = devices[0]
    if obj is None:
        return dev
    return jax.device_put(obj, dev)


class auto_autocast:
    """No-op context manager kept for API parity (reference ``daam/utils.py:32-36``).

    JAX handles mixed precision explicitly through dtypes; there is no global
    autocast state to toggle.  Accepts and ignores the torch-style arguments.
    """

    def __init__(self, *args, **kwargs):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def set_seed(seed: int):
    """Seed Python/NumPy RNGs and return a fresh ``jax.random.PRNGKey``.

    The returned key plays the role of the reference's ``torch.Generator``
    (reference ``daam/utils.py:46-55``): pass it to pipeline calls for
    reproducible sampling.
    """
    import jax

    random.seed(seed)
    np.random.seed(seed & 0xFFFFFFFF)
    return jax.random.PRNGKey(seed)


def enable_persistent_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache (idempotent).

    TPU compiles for a full sampling scan take minutes (and go through a
    remote-compile service on relay-attached chips); without this every CLI
    process recompiles from scratch.  Uses the same path as ``bench.py`` so
    the CLI, the demo server, and the benchmark harness share warm programs.
    No reference analog (eager PyTorch does not compile).

    Note: the ``JAX_COMPILATION_CACHE_DIR`` env var is only read when the
    ``jax`` module is first imported — too late if something (a site hook, a
    plugin) imported jax before us — so this sets the live config value too.
    """
    path = os.environ.setdefault(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.expanduser('~/.cache/daam_tpu_jax_cache'))
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir', path)
    except Exception:
        pass  # pre-initialization or exotic backends: env var still applies


def ensure_hugepages() -> None:
    """Opt-in (``DAAM_THP=1``): enable transparent hugepages system-wide.

    Loading a multi-GB checkpoint (SDXL fp32 is ~10 GB) first-touches
    millions of fresh pages; on kernels where the 4 KB fault path is
    expensive this dominates everything (measured on one virtualized host:
    fresh-allocation memcpy 2.6 MB/s vs 460 MB/s into already-faulted pages
    — 85x once THP=always).  Production serving hosts normally set this in
    the image; this helper makes scratch environments behave.

    Because ``/sys/kernel/mm/transparent_hugepage/enabled`` is a
    *system-wide* kernel policy (a host deliberately configured for
    madvise/never workloads should not have a library change it), the write
    only happens when the caller explicitly opts in with ``DAAM_THP=1`` —
    the library's own call sites (checkpoint load) are no-ops by default;
    this repo's bench/test harnesses opt in because this host exhibits the
    pathology.  The previous mode is restored at interpreter exit (atexit)
    and the change is logged.  Silently a no-op without root or on
    non-Linux.  No reference analog (the reference never manages memory).
    """
    if os.environ.get('DAAM_THP') != '1' or \
            os.environ.get('DAAM_NO_THP') == '1':
        return
    path = '/sys/kernel/mm/transparent_hugepage/enabled'
    try:
        with open(path) as f:
            modes = f.read()
        if '[always]' in modes:
            return
        prev = next((m.strip('[]') for m in modes.split() if m.startswith('[')),
                    'madvise')
        with open(path, 'w') as f:
            f.write('always')
    except OSError:
        return
    import atexit
    import logging
    logging.getLogger(__name__).info(
        'transparent_hugepage/enabled: %s -> always (DAAM_THP=1 opt-in; '
        'restored at exit)', prev)

    def _restore(mode=prev):
        try:
            with open(path, 'w') as f:
                f.write(mode)
        except OSError:
            pass
    atexit.register(_restore)


def cache_dir() -> Path:
    """Per-OS cache directory (same layout as reference ``daam/utils.py:58-70``)."""
    if os.name == 'posix' and sys.platform != 'darwin':
        xdg = os.environ.get('XDG_CACHE_HOME', os.path.expanduser('~/.cache'))
        return Path(xdg, 'daam_tpu')
    elif sys.platform == 'darwin':
        return Path(os.path.expanduser('~'), 'Library/Caches/daam_tpu')
    else:
        local = os.environ.get('LOCALAPPDATA', None) \
            or os.path.expanduser('~\\AppData\\Local')
        return Path(local, 'daam_tpu')


def compute_token_merge_indices(tokenizer, prompt: str, word: str,
                                word_idx: Optional[int] = None,
                                offset_idx: int = 0) -> Tuple[List[int], Optional[int]]:
    """Map a word to the token indices it occupies in the padded prompt encoding.

    Semantics mirror reference ``daam/utils.py:73-91`` exactly: the prompt and
    word are lowercased and tokenized, ``</w>`` subword markers stripped, every
    occurrence of the word's token run is matched, and all indices are shifted
    by +1 for the SOS token.  Raises ``ValueError`` if the word is absent.
    """
    merge_idxs: List[int] = []
    tokens = tokenizer.tokenize(prompt.lower())
    tokens = [x.replace('</w>', '') for x in tokens]

    if word_idx is None:
        word = word.lower()
        search_tokens = [x.replace('</w>', '') for x in tokenizer.tokenize(word)]
        start_indices = [x + offset_idx for x in range(len(tokens))
                         if tokens[x:x + len(search_tokens)] == search_tokens]
        for start in start_indices:
            merge_idxs += [i + start for i in range(len(search_tokens))]
        if not merge_idxs:
            raise ValueError(f'Search word {word} not found in prompt!')
    else:
        merge_idxs.append(word_idx)

    return [x + 1 for x in merge_idxs], word_idx


def plot_mask_heat_map(im, heat_map, threshold: float = 0.4):
    """Plot the image masked by ``heat_map > threshold``
    (reference ``daam/utils.py:39-43``)."""
    import matplotlib.pyplot as plt

    im = np.asarray(im, dtype=np.float32) / 255
    mask = (np.squeeze(np.asarray(heat_map)) > threshold).astype(np.float32)
    plt.imshow(im * mask[..., None])
