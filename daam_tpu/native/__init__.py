"""Native (C++) runtime components with pure-Python fallbacks.

Currently: the BPE tokenizer core (``bpe.cpp``), loaded lazily through ctypes.
Build happens on demand (``g++ -O2 -shared``) and is cached next to the
source; any failure falls back silently to the Python implementation in
:mod:`daam_tpu.tokenization`.
"""

from .bpe_binding import NativeBpeTokenizer, native_available  # noqa: F401
