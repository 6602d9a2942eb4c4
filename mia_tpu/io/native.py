"""ctypes binding for the native C++ read parser (native/src/fastaio.cc).

Loads ``native/libmiaio.so`` when present (``make -C native``); callers use
:func:`iter_frag_seqs_fast`, which transparently falls back to the exact
Python parser when the library is unavailable.  Both paths produce identical
records (tests/test_native_io.py asserts it).
"""
from __future__ import annotations

import ctypes
import os
from typing import Iterator

import numpy as np

from ..core.types import FragSeq

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libmiaio.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.mia_parse_reads.restype = ctypes.c_void_p
    lib.mia_parse_reads.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mia_reads_count.restype = ctypes.c_int64
    lib.mia_reads_count.argtypes = [ctypes.c_void_p]
    for name in ("ids", "descs", "seqs", "quals"):
        fn = getattr(lib, f"mia_reads_{name}")
        fn.restype = ctypes.POINTER(ctypes.c_char)
        fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.mia_reads_seq_lens.restype = ctypes.POINTER(ctypes.c_int64)
    lib.mia_reads_seq_lens.argtypes = [ctypes.c_void_p]
    lib.mia_reads_qual_sums.restype = ctypes.POINTER(ctypes.c_int64)
    lib.mia_reads_qual_sums.argtypes = [ctypes.c_void_p]
    lib.mia_reads_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _blob(lib, h, name: str) -> list[str]:
    n = ctypes.c_int64()
    p = getattr(lib, f"mia_reads_{name}")(h, ctypes.byref(n))
    raw = ctypes.string_at(p, n.value)
    # arena is '\0'-separated with a trailing separator
    return raw.decode("latin-1").split("\0")[:-1] if n.value else []


def parse_reads_native(path: str) -> list[FragSeq] | None:
    lib = _load()
    if lib is None:
        return None
    h = lib.mia_parse_reads(path.encode(), -1)
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        count = lib.mia_reads_count(h)
        if count == 0:
            return []
        ids = _blob(lib, h, "ids")
        descs = _blob(lib, h, "descs")
        seqs = _blob(lib, h, "seqs")
        quals = _blob(lib, h, "quals")
        seq_lens = np.ctypeslib.as_array(lib.mia_reads_seq_lens(h), (count,)).copy()
        qual_sums = np.ctypeslib.as_array(lib.mia_reads_qual_sums(h), (count,)).copy()
    finally:
        lib.mia_reads_free(h)
    out = []
    for i in range(count):
        fs = FragSeq()
        fs.id = ids[i]
        fs.desc = descs[i]
        fs.seq = seqs[i]
        fs.qual = quals[i]
        fs.seq_len = int(seq_lens[i])
        fs.qual_sum = int(qual_sums[i])
        out.append(fs)
    return out


def iter_frag_seqs_fast(path: str) -> Iterator[FragSeq]:
    """Native-parser read stream with exact-Python fallback."""
    reads = parse_reads_native(path)
    if reads is None:
        from .fasta import iter_frag_seqs

        yield from iter_frag_seqs(path)
    else:
        yield from reads
