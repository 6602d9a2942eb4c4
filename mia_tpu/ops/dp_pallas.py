"""Pallas TPU kernel for the batched semi-global DP scorer.

Layout: one program per batch block; reads on sublanes, reference columns on
lanes ([BB, W] int32 vectors in VMEM).  The row loop is a fori_loop carrying
(prev, prev2, rbest, snap); the column-gap prefix max runs as a Hillis-Steele
doubling scan over lanes (log2(W) shifted maxes), everything else is pure VPU
elementwise work.  Integer semantics identical to
:mod:`mia_tpu.ops.dp_numpy` — this kernel feeds the same host traceback.

Row work is bounded per block: callers sort entries by read length
(jax_engine.dispatch_entries) and ship a per-block row bound, so a block of
~60 bp reads runs ~60 DP rows instead of the padded L_MAX=256 — the
dominant win over the round-3 kernel, which paid full padding for every
read (ancient-DNA reads are ~40-120 bp, reference cap 256:
/root/reference/src/params.h:68).

Per-cell work: ~14 int32 vector ops + ~2*log2(W)/row amortised scan ops; a
[BB=32, W=384] block holds ~10 vector slabs of 48 KB in VMEM plus the
[L, BB, 5] score table (160 KB).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GEP, GOP, HIM

_LOW = np.int32(-(2**30) - 2**29)


def _prefix_max_lanes(x: jax.Array, W: int) -> jax.Array:
    """Inclusive prefix max along the last (lane) axis via doubling."""
    shift = 1
    while shift < W:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)), constant_values=_LOW)[:, :W]
        x = jnp.maximum(x, shifted)
        shift *= 2
    return x


def _dp_kernel(
    maxlen_ref,   # [NB] int32 scalar-prefetch: per-block row bound
    s1c_ref,      # [1, W] shared or [BB, W] per-read int32
    mask_ref,     # [BB, W] int32 (0/1)
    row_sm_ref,   # [L, BB, 5] int32 precomputed per-row substitution scores
    lengths_ref,  # [BB, 1] int32
    out_ref,      # [BB, W] int32 snapshot of each read's last row
    *,
    W: int,
    L: int,
    sg5: bool,
):
    BB = mask_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    s1c = s1c_ref[...]  # [1, W] broadcasts against [BB, *]; [BB, W] is direct
    # masks stay int32 throughout: Mosaic cannot shift/pad i1 vectors
    mask_i = mask_ref[...]
    mask = mask_i != 0
    lengths1 = lengths_ref[...] - 1  # [BB,1]

    # ---- loop invariants (hoisted: the row loop runs up to L times) ------
    # s1c equality planes for the 5-way substitution select
    eq = [s1c == i for i in range(5)]
    gep_cols = GEP * cols
    # gap_col subtracts GOP + GEP*(c-1) from the twice-shifted running max
    gcost = GOP + gep_cols - GEP
    # scan input mask: candidate origins are masked cols shifted by 2, plus
    # col 0 (the reference seeds the scan there, src/mia.c:838-847)
    mask2_i = jnp.pad(mask_i[:, 2:], ((0, 0), (0, 2)))
    cand_ok = (mask2_i != 0) | (cols == 0)
    upd_mask = jnp.pad(mask_i[:, 1:], ((0, 0), (0, 1))) != 0
    is_col0 = cols == 0

    def cell_sub_for(row):
        # row_sm[row, b, s1c[b, w]] as five masked selects (VPU-friendly
        # gather); the row index is on the LEADING dim so the dynamic slice
        # is a cheap contiguous VMEM read
        sm_row = row_sm_ref[row]  # [BB, 5]
        acc = jnp.zeros((BB, W), jnp.int32)
        for i in range(5):
            acc = jnp.where(eq[i], sm_row[:, i][:, None], acc)
        return acc

    row0 = jnp.where(mask, cell_sub_for(0), jnp.int32(HIM))

    def body(row, carry):
        prev, prev2, rbest, snap = carry
        cell_sub = cell_sub_for(row)
        sg5_pen = (GOP + GEP * (row + 1)) if sg5 else 0

        m = prev + gep_cols
        cand = jnp.where(cand_ok, m, _LOW)
        run_max = _prefix_max_lanes(cand, W)
        # gap_col[c] = run_max[c-2] - GOP - GEP*(c-1); the pad's _LOW keeps
        # cols < 2 out of contention (never within 2^28 of a live score)
        rm2 = jnp.pad(run_max, ((0, 0), (2, 0)), constant_values=_LOW)[:, :W]
        gap_col = rm2 - gcost

        cand_r = prev2 + GEP * (row - 2)
        rbest = jnp.where((row >= 2) & upd_mask & (cand_r > rbest), cand_r, rbest)
        # row < 2: push gap_row out of contention via the scalar penalty
        # (2^28 below any live score, no int32 overflow: HIM - 2^28 > -2^31)
        grow_pen = jnp.where(row >= 2, GOP + GEP * (row - 1), jnp.int32(2**28))
        rb1 = jnp.pad(rbest, ((0, 0), (1, 0)), constant_values=_LOW)[:, :W]
        gap_row = rb1 - grow_pen

        diag = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=_LOW)[:, :W]
        start_new = jnp.int32(-sg5_pen)

        # value semantics only (no traces here): the reference's priority
        # chain restart > diag > col-gap > row-gap (src/mia.c:910-965)
        # reduces to one max — is_start == start_new > max(all three), and
        # base == max(all three) whichever branch of is_diag wins
        base = jnp.maximum(jnp.maximum(gap_col, gap_row), diag)
        new_row = jnp.where(start_new > base, start_new, cell_sub + base)
        new_row = jnp.where(is_col0, cell_sub - sg5_pen, new_row)
        new_row = jnp.where(mask, new_row, jnp.int32(HIM))

        snap = jnp.where(lengths1 == row, new_row, snap)
        return new_row, prev, rbest, snap

    row_hi = maxlen_ref[pl.program_id(0)]  # dynamic: rows 1..maxlen-1 only
    _, _, _, snap = jax.lax.fori_loop(1, row_hi, body, (row0, row0, row0, row0))
    out_ref[...] = snap


@functools.partial(jax.jit, static_argnames=("sg5", "block_b"))
def pallas_last_row(
    s1c: jax.Array,     # [W] shared or [B, W] per-read int32
    mask: jax.Array,    # [B, W] bool/int
    row_sm: jax.Array,  # [B, L, 5] int32
    lengths: jax.Array,  # [B] int32
    sg5: bool = True,
    block_b: int = 8,
    maxlens: jax.Array | None = None,  # [B // block_b] int32 per-block bound
) -> jax.Array:
    """Pallas-call wrapper: grid over batch blocks; returns [B, W] int32 last
    DP rows.  ``s1c`` may be a single shared reference row or one reference
    window per read (the banded pass-1 path).  ``maxlens`` bounds each
    block's row loop (callers sort by length); None runs every row."""
    B, W = mask.shape
    L = row_sm.shape[1]
    assert B % block_b == 0, "pad the batch to a multiple of block_b"
    NB = B // block_b
    if maxlens is None:
        maxlens = jnp.full((NB,), L, jnp.int32)
    kernel = functools.partial(_dp_kernel, W=W, L=L, sg5=sg5)
    if s1c.ndim == 1:
        s1c_arg = s1c.reshape(1, W).astype(jnp.int32)
        s1c_spec = pl.BlockSpec((1, W), lambda i, *_: (0, 0))
    else:
        s1c_arg = s1c.astype(jnp.int32)
        s1c_spec = pl.BlockSpec((block_b, W), lambda i, *_: (i, 0))
    # per-block row bounds ride scalar prefetch (SMEM, indexed by program
    # id); (1,1) SMEM blocks are rejected by the Mosaic lowering
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            s1c_spec,
            pl.BlockSpec((block_b, W), lambda i, *_: (i, 0)),
            pl.BlockSpec((L, block_b, 5), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((block_b, 1), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, W), lambda i, *_: (i, 0)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=14 * B * W * L, bytes_accessed=(2 * B * W + B * L * 5) * 4,
            transcendentals=0,
        ),
    )(
        maxlens.astype(jnp.int32),
        s1c_arg,
        mask.astype(jnp.int32),
        jnp.transpose(row_sm, (1, 0, 2)).astype(jnp.int32),
        lengths.reshape(B, 1).astype(jnp.int32),
    )


def make_row_sm(submat: np.ndarray, s2c: np.ndarray, depths: np.ndarray) -> np.ndarray:
    """Precompute per-(read,row) substitution score vectors:
    row_sm[b, r, i] = submat[depth[b,r], i, s2c[b,r]]."""
    return submat[depths, :, :][
        np.arange(s2c.shape[0])[:, None], np.arange(s2c.shape[1])[None, :], :, s2c
    ]
