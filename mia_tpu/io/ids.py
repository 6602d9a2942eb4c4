"""Sequence-ID allow-list parsing (parse_ids, src/io.c:1088-1135).

The reference loads newline-separated IDs (truncated at MAX_ID_LEN) into a
sorted array for bsearch; a hash set gives the same membership semantics.
"""
from __future__ import annotations

from ..constants import MAX_ID_LEN


def parse_ids(path: str) -> set[str]:
    ids: set[str] = set()
    with open(path, "rb") as fh:
        data = fh.read()
    # only newline-terminated lines count (a trailing partial line is dropped,
    # matching the reference's per-'\n' commit)
    for line in data.split(b"\n")[:-1]:
        ids.add(line[:MAX_ID_LEN].decode("latin-1"))
    return ids
