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


def _build(native_dir: str) -> None:
    """Build libmiaio.so in-tree when sources are present but the library is
    not (fresh checkout).  Serialised across processes with an exclusive
    lock so concurrent engines don't race the compiler; any failure just
    leaves the Python fallbacks in charge."""
    import subprocess

    lock = os.path.join(native_dir, ".build.lock")
    try:
        import fcntl

        with open(lock, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if not os.path.exists(os.path.join(native_dir, "libmiaio.so")):
                subprocess.run(
                    ["make", "-C", native_dir],
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
    except Exception:
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )
    path = os.path.join(native_dir, "libmiaio.so")
    stale = False
    if os.path.exists(path):
        try:
            import glob

            so_mtime = os.path.getmtime(path)
            stale = any(
                os.path.getmtime(src) > so_mtime
                for src in glob.glob(os.path.join(native_dir, "src", "*.cc"))
            )
        except OSError:
            pass
    if stale or not os.path.exists(path):
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            if stale:
                try:
                    os.remove(path)
                except OSError:
                    pass
            _build(native_dir)
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
