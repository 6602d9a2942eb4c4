"""Batched DP scorer on the XLA/TPU path.

Same row-parallel formulation as :mod:`mia_tpu.ops.dp_numpy`, expressed as a
``lax.scan`` over read rows with every column of every read in the batch
computed per step — the layout the TPU VPU wants: [batch(sublanes),
ref_cols(lanes)] int32 vectors, a cummax for the column-gap prefix argmax and
elementwise selects for the priority chain.  Integer arithmetic matches C
exactly (int32, HIM sentinel), so scores agree bit-for-bit with the host
engine; traceback for the winning strand is recovered on host over an
exact right-truncated window (cells left of a column never depend on cells to
its right).

Semi-global scoring summary (matches dyn_prog, src/mia.c:740-981):
row 0 free; col 0 carries the sg5 penalty; gap options are running argmaxes
with GOP+GEP*len cost; restart pays the sg5 prefix penalty; the last row's
maximum (earliest column) is the alignment score.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GEP, GOP, HIM

# np scalar, not jnp: a module-level jnp.int32 is a concrete device array
# that gets hoisted as an executable parameter under some program orderings
_LOW = np.int32(-(2**30) - 2**29)  # below any reachable value, no overflow


@functools.partial(jax.jit, static_argnames=("sg5",))
def batch_last_row(
    s1c: jax.Array,      # [W] shared or [B, W] per-read reference codes 0..4
    mask: jax.Array,     # [B, W] bool open columns per read
    s2c: jax.Array,      # [B, L] int32 read codes (padded with 4)
    lengths: jax.Array,  # [B] int32 read lengths (>=1)
    depths: jax.Array,   # [B, L] int32 PSSM depth per row (clipped)
    submat: jax.Array,   # [31, 5, 5] int32
    sg5: bool = True,
) -> jax.Array:
    """Return the DP matrix row at each read's last row: [B, W] int32.

    All rows run to L with per-read snapshots at row == length-1; masked
    columns hold HIM exactly like the scalar engine.
    """
    B, W = mask.shape
    L = s2c.shape[1]
    cols = jax.lax.iota(jnp.int32, W)  # symbolic: no hoisted consts
    s1c2d = s1c if s1c.ndim == 2 else jnp.broadcast_to(s1c[None, :], (B, W))

    # row 0: plain substitution scores on open columns (depth 0 always,
    # src/mia.c:763-766)
    sub0 = jnp.take_along_axis(
        submat[jnp.zeros((B,), jnp.int32)],  # depth 0 at row 0 always
        s2c[:, 0][:, None, None],
        axis=2,
    )[:, :, 0]  # [B, 5]
    cell0 = jnp.take_along_axis(sub0, s1c2d, axis=1)
    row0 = jnp.where(mask, cell0, jnp.int32(HIM))

    snap0 = row0  # snapshot if length == 1
    rbest_val0 = row0  # n[0] = row0 + GEP*0
    init = (row0, jnp.full_like(row0, _LOW), rbest_val0, snap0)

    # columns whose best_gap_row entry is maintained: mask shifted left
    upd_mask = jnp.concatenate([mask[:, 1:], jnp.zeros((B, 1), bool)], axis=1)

    def step(carry, row):
        prev, prev2, rbest_val, snap = carry

        depth = depths[:, row]  # [B]
        subm = submat[depth]  # [B,5,5]
        row_sm = jnp.take_along_axis(subm, s2c[:, row][:, None, None], axis=2)[:, :, 0]
        cell_sub = jnp.take_along_axis(row_sm, s1c2d, axis=1)

        sg5_pen = jnp.int32(GOP + GEP * (row + 1)) if sg5 else jnp.int32(0)

        # column gaps: prefix max over normalised previous row
        m = prev + GEP * cols[None, :]
        cand = jnp.full((B, W), _LOW, dtype=jnp.int32)
        cand = cand.at[:, : W - 2].set(jnp.where(mask[:, 2:], m[:, : W - 2], _LOW))
        cand = cand.at[:, 0].set(m[:, 0])
        run_max = jax.lax.cummax(cand, axis=1)
        gap_col = jnp.full((B, W), jnp.int32(HIM))
        gap_col = gap_col.at[:, 2:].set(
            run_max[:, : W - 2] - GOP - GEP * (cols[None, 2:] - 1)
        )

        # row gaps: running per-column argmax over rows <= row-2
        def upd(rv):
            cand_r = prev2 + GEP * (row - 2)
            return jnp.where(upd_mask & (cand_r > rv), cand_r, rv)

        rbest_val = jax.lax.cond(row >= 2, upd, lambda rv: rv, rbest_val)
        gap_row = jnp.full((B, W), jnp.int32(HIM))
        gap_row = jnp.where(
            row >= 2,
            gap_row.at[:, 1:].set(rbest_val[:, :-1] - GOP - GEP * (row - 1)),
            gap_row,
        )

        diag = jnp.concatenate([jnp.full((B, 1), _LOW), prev[:, :-1]], axis=1)
        start_new = -sg5_pen if sg5 else jnp.int32(0)

        is_start = (
            (start_new > diag) & (start_new > gap_col) & (start_new > gap_row)
        )
        is_diag = (diag >= gap_col) & (diag >= gap_row)
        is_gc = gap_col >= gap_row
        base = jnp.where(is_diag, diag, jnp.where(is_gc, gap_col, gap_row))
        new_row = jnp.where(is_start, start_new, cell_sub + base)

        # column 0 special case
        c0 = cell_sub[:, 0] - sg5_pen
        new_row = new_row.at[:, 0].set(c0)
        new_row = jnp.where(mask, new_row, jnp.int32(HIM))

        snap = jnp.where((lengths - 1 == row)[:, None], new_row, snap)
        return (new_row, prev, rbest_val, snap), None

    (prev, prev2, rbest, snap), _ = jax.lax.scan(
        step, init, jax.lax.iota(jnp.int32, L - 1) + 1
    )
    return snap


@functools.partial(jax.jit, static_argnames=("sg5",))
def batch_last_row_rowsm(
    s1c: jax.Array,      # [B, W] per-read reference codes 0..4
    mask: jax.Array,     # [B, W] bool open columns per read
    row_sm: jax.Array,   # [B, L, 5] int32 per-row substitution score vectors
    lengths: jax.Array,  # [B] int32 read lengths (>=1)
    sg5: bool = True,
) -> jax.Array:
    """:func:`batch_last_row` with the per-row substitution scores
    precomputed (``row_sm[b, r, i] = submat[depth(b,r), i, s2c[b,r]]``) —
    the form the entry-based device engine uses so per-entry PSSM selection
    (fw vs rc matrix) costs one gather instead of a second program."""
    B, W = mask.shape
    L = row_sm.shape[1]
    cols = jax.lax.iota(jnp.int32, W)  # symbolic: no hoisted consts
    s1c2d = s1c

    cell0 = jnp.take_along_axis(row_sm[:, 0, :], s1c2d, axis=1)
    row0 = jnp.where(mask, cell0, jnp.int32(HIM))

    snap0 = row0  # snapshot if length == 1
    init = (row0, jnp.full_like(row0, _LOW), row0, snap0)

    upd_mask = jnp.concatenate([mask[:, 1:], jnp.zeros((B, 1), bool)], axis=1)

    def step(carry, row):
        prev, prev2, rbest_val, snap = carry

        row_sm_r = jax.lax.dynamic_index_in_dim(
            row_sm, row, axis=1, keepdims=False
        )  # [B, 5]
        cell_sub = jnp.take_along_axis(row_sm_r, s1c2d, axis=1)

        sg5_pen = jnp.int32(GOP) + jnp.int32(GEP) * (row + 1) if sg5 else jnp.int32(0)

        m = prev + GEP * cols[None, :]
        cand = jnp.full((B, W), _LOW, dtype=jnp.int32)
        cand = cand.at[:, : W - 2].set(jnp.where(mask[:, 2:], m[:, : W - 2], _LOW))
        cand = cand.at[:, 0].set(m[:, 0])
        run_max = jax.lax.cummax(cand, axis=1)
        gap_col = jnp.full((B, W), jnp.int32(HIM))
        gap_col = gap_col.at[:, 2:].set(
            run_max[:, : W - 2] - GOP - GEP * (cols[None, 2:] - 1)
        )

        def upd(rv):
            cand_r = prev2 + GEP * (row - 2)
            return jnp.where(upd_mask & (cand_r > rv), cand_r, rv)

        rbest_val = jax.lax.cond(row >= 2, upd, lambda rv: rv, rbest_val)
        gap_row = jnp.full((B, W), jnp.int32(HIM))
        gap_row = jnp.where(
            row >= 2,
            gap_row.at[:, 1:].set(rbest_val[:, :-1] - GOP - GEP * (row - 1)),
            gap_row,
        )

        diag = jnp.concatenate([jnp.full((B, 1), _LOW), prev[:, :-1]], axis=1)
        start_new = -sg5_pen if sg5 else jnp.int32(0)

        is_start = (
            (start_new > diag) & (start_new > gap_col) & (start_new > gap_row)
        )
        is_diag = (diag >= gap_col) & (diag >= gap_row)
        is_gc = gap_col >= gap_row
        base = jnp.where(is_diag, diag, jnp.where(is_gc, gap_col, gap_row))
        new_row = jnp.where(is_start, start_new, cell_sub + base)

        c0 = cell_sub[:, 0] - sg5_pen
        new_row = new_row.at[:, 0].set(c0)
        new_row = jnp.where(mask, new_row, jnp.int32(HIM))

        snap = jnp.where((lengths - 1 == row)[:, None], new_row, snap)
        return (new_row, prev, rbest_val, snap), None

    (_, _, _, snap), _ = jax.lax.scan(
        step, init, jax.lax.iota(jnp.int32, L - 1) + 1
    )
    return snap


def depths_for(lengths: np.ndarray, L: int) -> np.ndarray:
    """Depth slot per (read, row), clipped for padded rows."""
    from ..constants import PSSM_DEPTH

    rows = np.arange(L)[None, :]
    ln = lengths[:, None]
    from_back = ln - (rows + 1)
    d = np.where(
        rows < PSSM_DEPTH,
        rows,
        np.where(from_back < PSSM_DEPTH, 2 * PSSM_DEPTH - from_back, PSSM_DEPTH),
    )
    return np.clip(d, 0, 2 * PSSM_DEPTH).astype(np.int32)


def batch_best_and_aec(last_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-read (best_score, earliest argmax column) of the last DP row."""
    aec = jnp.argmax(last_rows, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(last_rows, aec[:, None], axis=1)[:, 0]
    return best, aec
