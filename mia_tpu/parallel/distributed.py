"""Multi-host orchestration (single-controller JAX).

Reference analogue: none — the reference is a single process (SURVEY §2).
On a multi-host slice each host runs this same program; reads stream
host-locally and shard over the global ``dp`` axis, while per-column counts
psum over ICI/DCN (see :mod:`mia_tpu.parallel.sharded`).  The per-iteration
convergence decision is a psum'd vote on the gathered consensus string, so
every host exits the loop on the same iteration.
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


def converged_everywhere(local_equal: bool) -> bool:
    """All-host convergence vote (scalar psum across the mesh)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return local_equal
    votes = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),), jnp.int32) * int(local_equal)
    )
    return int(votes[0]) == jax.device_count()
