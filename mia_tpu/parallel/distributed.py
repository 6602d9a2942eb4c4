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
    up."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return False
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


def converged_everywhere(local_equal: bool) -> bool:
    """All-host convergence vote: every host must see its consensus repeat
    before any host stops iterating (src/mia_main.c:915-916 made global)."""
    import jax

    if jax.process_count() == 1:
        return local_equal
    votes = allreduce_terms(np.array([int(local_equal)], np.int64))
    return int(votes[0]) == jax.process_count()
