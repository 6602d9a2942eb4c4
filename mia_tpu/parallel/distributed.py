"""Multi-host orchestration (single-controller JAX).

Reference analogue: none — the reference is a single process (SURVEY §2).
The multi-host recipe for this framework:

1. every host runs the same program and calls :func:`initialize_if_needed`
   (jax.distributed over JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
   JAX_PROCESS_ID);
2. each host streams only its slice of the input reads
   (:func:`host_read_shard`) and runs pass 1 / realignment on them, with the
   reference and PSSMs replicated — the per-host device work is the same
   entry-sharded program as single-host (core/jax_engine.py);
3. per-iteration consensus merges the per-host ColumnCounts accumulators
   with ONE all-reduce (:func:`allreduce_column_counts`) before the
   find_consensus decision, exactly the psum-merge SURVEY §5 names for the
   BaseCounts arrays (src/map_align.c:229-263 / src/mia.c:551-599);
4. the dynamic score-cutoff regression merges its scalar terms the same way
   (:func:`allreduce_terms`; Σx, Σy, Σxy, Σxx of src/fsdb.c:291-315);
5. every host exits the iteration loop together via
   :func:`converged_everywhere`.

Verified by tests/test_distributed.py: two real jax.distributed processes
produce the same consensus as a single process over the same observations.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def initialize_if_needed() -> bool:
    """`jax.distributed.initialize` from standard env vars; no-op for
    single-process runs.  Returns True when a multi-process runtime was set
    up.  The env check precedes the jax import: single-process runs (and
    the all-native engine in particular) must not pay the multi-second jax
    import for a no-op."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


@dataclass
class HostShard:
    """This host's slice of a globally sharded read set."""

    start: int
    count: int


def host_read_shard(total_reads: int) -> HostShard:
    """Contiguous per-host partition of the input read stream: host i of n
    takes reads [i*ceil(N/n), ...) — each host parses only its slice."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = -(-total_reads // n)
    start = min(i * per, total_reads)
    return HostShard(start, min(per, total_reads - start))


def allreduce_terms(terms: np.ndarray) -> np.ndarray:
    """Sum a small 1-D int64/float64 term vector across all processes
    (identity single-process).  Used for the score-cut regression sums and
    any other scalar reductions."""
    import jax

    if jax.process_count() == 1:
        return terms
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(terms))
    return np.asarray(gathered).sum(axis=0)


def allreduce_column_counts(cc):
    """Merge per-host ColumnCounts (counts [n,5], cov [n], scores [n,4]) into
    the global accumulators on every host — the production psum of the
    reference's BaseCounts (src/map_align.c:229-263).  Returns ``cc``
    (mutated in place); identity for single-process runs."""
    import jax

    if jax.process_count() == 1:
        return cc
    flat = np.concatenate(
        [cc.counts.ravel(), cc.cov.ravel(), cc.scores.ravel()]
    ).astype(np.int64)
    total = allreduce_terms(flat)
    n = cc.n
    cc.counts = total[: n * 5].reshape(n, 5)
    cc.cov = total[n * 5 : n * 6]
    cc.scores = total[n * 6 :].reshape(n, 4)
    return cc


def allreduce_max(arr: np.ndarray) -> np.ndarray:
    """Elementwise max across all processes (identity single-process); used
    for the shared per-column max-insert array (ref->gaps[],
    src/map_align.c:944-950 semantics made global)."""
    import jax

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(arr))
    out = np.asarray(gathered).max(axis=0)
    arr[...] = out
    return arr


def gather_bytes(data: bytes) -> list[bytes]:
    """All-gather one variable-length byte blob per process; returns the
    blobs in process-rank order on every host."""
    import jax

    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    n = np.array([len(data)], np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = int(lens.max())
    buf = np.zeros(cap, np.uint8)
    if data:
        buf[: len(data)] = np.frombuffer(data, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    return [all_bufs[i, : lens[i]].tobytes() for i in range(len(lens))]


def gather_arrays(arr: np.ndarray) -> list[np.ndarray]:
    """All-gather one variable-length 2-D array per process (same width,
    differing row counts); rank order."""
    blobs = gather_bytes(
        np.ascontiguousarray(arr, np.int64).tobytes()
    )
    w = arr.shape[1] if arr.ndim == 2 else 1
    return [np.frombuffer(b, np.int64).reshape(-1, w) for b in blobs]


class GlobalReadFilter:
    """Replays the single-process FSDB filter history (sort -> uniq ->
    score-cut) over ALL hosts' reads, using lightweight stubs and the exact
    same fsdb code paths, so repeat filtering and the dynamic score cutoff
    are globally identical — including float summation order — to a
    single-process run over the concatenated stream.

    Each local FragSeq carries a ``gid`` (global stream index).  The stub
    list persists across iterations: stable sorts leave the same
    tie-breaking history a single process would have, and membership tracks
    each host's live reads (clean_FSDB etc.) via :meth:`refresh`.

    Reference analogues: sort_fsdb/fs_comp (src/fsdb.c:13-174),
    set_uniq_in_fsdb (src/fsdb.c:440-508), find_fsdb_score_cut
    (src/fsdb.c:269-383)."""

    def __init__(self):
        from ..core.types import FSDB

        self._fsdb = FSDB()
        self._by_gid: dict[int, object] = {}

    def refresh(self, local_fsdb) -> None:
        """Gather every host's live (gid, rc, as, ae, score, qual_sum,
        trimmed, seq_len) and update/insert/drop stubs, preserving the
        current stub order for ties."""
        from ..core.types import FragSeq

        rows = np.array(
            [
                [
                    fs.gid,
                    int(fs.rc),
                    fs.as_,
                    fs.ae,
                    fs.score,
                    fs.qual_sum,
                    int(fs.trimmed),
                    fs.seq_len,
                    int(fs.unique_best),
                ]
                for fs in local_fsdb.fss
            ],
            np.int64,
        ).reshape(-1, 9)
        shards = gather_arrays(rows)
        live: dict[int, np.ndarray] = {}
        order: list[int] = []
        for shard in shards:
            for r in shard:
                live[int(r[0])] = r
                order.append(int(r[0]))
        # update existing stubs in place; drop dead; append new in stream
        # order (only happens on the first refresh)
        kept = [s for s in self._fsdb.fss if s.gid in live]
        have = {s.gid for s in kept}
        for gid in sorted(g for g in order if g not in have):
            s = FragSeq()
            s.gid = gid
            kept.append(s)
        kept_new = [s for s in kept if s.gid not in have]
        kept_old = [s for s in kept if s.gid in have]
        # stream order for first-time stubs; preserved order for the rest
        kept_new.sort(key=lambda s: s.gid)
        self._fsdb.fss = kept_old + kept_new
        for s in self._fsdb.fss:
            r = live[s.gid]
            s.rc = bool(r[1])
            s.as_ = int(r[2])
            s.ae = int(r[3])
            s.score = int(r[4])
            s.qual_sum = int(r[5])
            s.trimmed = bool(r[6])
            s.seq_len = int(r[7])
            s.unique_best = bool(r[8])
        self._by_gid = {s.gid: s for s in self._fsdb.fss}

    def sort_and_uniq(self, qscore: bool, just_outer: bool, tol: int,
                      local_fsdb) -> None:
        """Global sort + duplicate marking; writes unique_best back onto the
        local reads."""
        from ..core.fsdb import (
            set_uniq_in_fsdb,
            sort_fsdb,
            sort_fsdb_qscore,
        )

        (sort_fsdb_qscore if qscore else sort_fsdb)(self._fsdb)
        set_uniq_in_fsdb(self._fsdb, just_outer, tol)
        for fs in local_fsdb.fss:
            fs.unique_best = self._by_gid[fs.gid].unique_best

    def score_cut(self) -> tuple[float, float]:
        """Global (slope, intercept) in the global sorted order — identical
        rounding to the single-process fit."""
        from ..core.fsdb import find_fsdb_score_cut

        return find_fsdb_score_cut(self._fsdb)

    def sort_pos(self) -> dict[int, int]:
        """gid -> position in the current global sorted order (the culled
        maln's insertion-order key for the global maln write)."""
        return {s.gid: i for i, s in enumerate(self._fsdb.fss)}


def culled_record_keys(
    fsdb, sort_pos: dict[int, int], culled
) -> list[tuple[int, int]]:
    """(owner global-sort position, segment index) per culled record, in
    ``culled.aln_seqs`` order.  Call AFTER sort_aln_frags: keys are bound to
    the record objects themselves (front/back AlnSeq identity), so the
    stable (start,end) re-sort cannot detach a record from its owner's
    tie-break key (cull picks front then back per unique read,
    src/mia.c:432-470)."""
    by_rec: dict[int, tuple[int, int]] = {}
    for fs in fsdb.fss:
        if fs.unique_best:
            p = sort_pos[fs.gid]
            by_rec[id(fs.front_asp)] = (p, 0)
            if fs.back_asp is not None:
                by_rec[id(fs.back_asp)] = (p, 1)
    return [by_rec[id(a)] for a in culled.aln_seqs]


def write_ma_global(
    path: str,
    culled,
    record_keys: list[tuple[int, int]],
    pass1_total: int,
    *,
    timestamp: float | None = None,
) -> None:
    """Host 0 writes the COMPLETE maln: every host's culled records,
    stable-merged by (start, end, owner global-sort position, segment) —
    byte-identical to a single process culling the concatenated stream
    (records there are inserted in global sorted order and stably sorted by
    (start, end), src/map_align.c:393-414)."""
    import jax

    from ..io.maln import alnseq_lines, header_lines

    recs = culled.aln_seqs
    assert len(recs) == len(record_keys), (len(recs), len(record_keys))
    parts = []
    for (pos, seg), a in zip(record_keys, recs):
        body = "\n".join(alnseq_lines(a))
        parts.append(f"{a.start}\t{a.end}\t{pos}\t{seg}\n{body}")
    blob = "\x00".join(parts).encode("latin-1")
    shards = gather_bytes(blob)
    counts = allreduce_terms(np.array([len(recs)], np.int64))
    if jax.process_index() != 0:
        return
    merged = []
    for shard in shards:
        if not shard:
            continue
        for part in shard.decode("latin-1").split("\x00"):
            keyline, body = part.split("\n", 1)
            start, end, pos, seg = (int(x) for x in keyline.split("\t"))
            merged.append(((start, end, pos, seg), body))
    merged.sort(key=lambda kv: kv[0])
    lines = header_lines(
        culled, timestamp=timestamp, nas=int(counts[0]), siz=pass1_total
    )
    lines.extend(kv[1] for kv in merged)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def reduce_column_counts(cc):
    """Hook for core.columns: allreduce one ColumnCounts accumulator."""
    return allreduce_column_counts(cc)


def converged_everywhere(local_equal: bool) -> bool:
    """All-host convergence vote: every host must see its consensus repeat
    before any host stops iterating (src/mia_main.c:915-916 made global)."""
    import jax

    if jax.process_count() == 1:
        return local_equal
    votes = allreduce_terms(np.array([int(local_equal)], np.int64))
    return int(votes[0]) == jax.process_count()
