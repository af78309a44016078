"""ctypes binding for the native BPE tokenizer (`bpe.cpp`).

``NativeBpeTokenizer`` implements the same surface as
:class:`daam_tpu.tokenization.ClipBpeTokenizer` (``tokenize`` / ``encode`` /
``__call__``) on top of the C++ core, ~20× faster per prompt — relevant for
the corpus actions of the CLI and the batched demo server.  If the shared
library can't be built (no compiler), everything falls back to the Python
implementation transparently via :func:`daam_tpu.tokenization.default_tokenizer`.
"""

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

from ..tokenization import _TokenizerBase, _whitespace_clean

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / '_bpe.so'
_BUILD_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _load_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = _HERE / 'bpe.cpp'
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            try:
                subprocess.run(
                    ['g++', '-O2', '-std=c++17', '-shared', '-fPIC',
                     str(src), '-o', str(_LIB_PATH)],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _BUILD_FAILED = True
            return None
        lib.daam_bpe_new.restype = ctypes.c_void_p
        lib.daam_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.daam_bpe_free.argtypes = [ctypes.c_void_p]
        lib.daam_bpe_tokenize.restype = ctypes.c_int
        lib.daam_bpe_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_char_p, ctypes.c_int]
        lib.daam_bpe_encode.restype = ctypes.c_int
        lib.daam_bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.c_int, ctypes.c_int]
        for fn in ('daam_bpe_sot_id', 'daam_bpe_eot_id', 'daam_bpe_vocab_size'):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.daam_bpe_token_to_id.restype = ctypes.c_int
        lib.daam_bpe_token_to_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class NativeBpeTokenizer(_TokenizerBase):
    """CLIP BPE tokenizer backed by the C++ core."""

    def __init__(self, vocab_json: str, merges_txt: str,
                 pad_id: Optional[int] = None):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError('native BPE library unavailable')
        self._lib = lib
        self._vocab_json = str(vocab_json)
        self._merges_txt = str(merges_txt)
        self._pad_id_arg = pad_id
        self._handle = lib.daam_bpe_new(str(vocab_json).encode(),
                                        str(merges_txt).encode())
        if not self._handle:
            raise RuntimeError(f'failed to load BPE data from {vocab_json}')
        super().__init__(vocab_size=lib.daam_bpe_vocab_size(self._handle),
                         sot_id=lib.daam_bpe_sot_id(self._handle),
                         eot_id=lib.daam_bpe_eot_id(self._handle),
                         pad_id=pad_id)

    def __del__(self):
        if getattr(self, '_handle', None) and self._lib is not None:
            self._lib.daam_bpe_free(self._handle)
            self._handle = None

    def __getstate__(self):
        """Pickle by vocab/merges path, not by native state — a ctypes CDLL
        handle can't be pickled.  Experiments saved in the reference's format
        (``GenerationExperiment.save``) pickle their tokenizer, so this keeps
        the native tokenizer usable in that interop path."""
        return {'vocab_json': self._vocab_json,
                'merges_txt': self._merges_txt,
                'pad_id': self._pad_id_arg}

    def __setstate__(self, state):
        self.__init__(state['vocab_json'], state['merges_txt'],
                      pad_id=state['pad_id'])

    @classmethod
    def from_pretrained(cls, path, pad_id: Optional[int] = None
                        ) -> 'NativeBpeTokenizer':
        path = Path(path)
        if (path / 'tokenizer').is_dir():
            path = path / 'tokenizer'
        return cls(path / 'vocab.json', path / 'merges.txt', pad_id=pad_id)

    @staticmethod
    def _pretext(text: str) -> bytes:
        """Unicode-correct whitespace-clean + lowercase happens here (Python);
        the C++ core only handles already-lowered text (ASCII ``tolower`` is
        a no-op on it) — full-unicode case folding in C++ would need ICU."""
        return _whitespace_clean(text).lower().encode('utf-8')

    def tokenize(self, text: str) -> List[str]:
        cap = max(4096, 8 * len(text) + 64)
        buf = ctypes.create_string_buffer(cap)
        n = self._lib.daam_bpe_tokenize(self._handle, self._pretext(text),
                                        buf, cap)
        if n < 0:
            raise ValueError('tokenize buffer overflow')
        raw = buf.value.decode('utf-8')
        return raw.split('\n')[:n] if n else []

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        """Vocab lookup via the native encoder map (unknown tokens -> EOT,
        matching :meth:`ClipBpeTokenizer.convert_tokens_to_ids`)."""
        out = []
        for t in tokens:
            i = self._lib.daam_bpe_token_to_id(self._handle, t.encode('utf-8'))
            out.append(self.eot_id if i < 0 else i)
        return out

    def encode(self, text: str, add_special_tokens: bool = True,
               truncation: bool = True) -> List[int]:
        out = (ctypes.c_int * self.model_max_length)()
        real = self._lib.daam_bpe_encode(self._handle, self._pretext(text),
                                         out, self.model_max_length,
                                         self.pad_id if self.pad_id is not None else -1)
        ids = list(out[:real])
        if not add_special_tokens:
            ids = ids[1:-1]
        return ids

    def __call__(self, text, padding='max_length', truncation=True,
                 max_length=None, return_tensors=None):
        if isinstance(text, str):
            texts, squeeze = [text], True
        else:
            texts, squeeze = list(text), False
        max_length = max_length or self.model_max_length

        all_ids, all_mask = [], []
        for t in texts:
            out = (ctypes.c_int * max_length)()
            real = self._lib.daam_bpe_encode(
                self._handle, self._pretext(t), out, max_length,
                self.pad_id if self.pad_id is not None else -1)
            all_ids.append(list(out[:max_length]))
            all_mask.append([1] * real + [0] * (max_length - real))

        if return_tensors in ('np', 'jax'):
            import numpy as np
            return {'input_ids': np.asarray(all_ids, dtype=np.int32),
                    'attention_mask': np.asarray(all_mask, dtype=np.int32)}
        if squeeze:
            return {'input_ids': all_ids[0], 'attention_mask': all_mask[0]}
        return {'input_ids': all_ids, 'attention_mask': all_mask}
