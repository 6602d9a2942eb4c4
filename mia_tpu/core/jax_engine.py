"""Device-accelerated pass-1 engine.

Phase split: the host streams/filters reads (trim + k-mer masks), the device
scores whole batches fw+rc with the batched DP kernel, and the host then
reconstructs the winning strand's traceback over a score-verified window —
so merge bookkeeping stays identical to the exact engine while the O(W*L)
scoring work runs on the TPU.

Window verification: the host recomputes the winning strand's DP restricted
to [aec - margin, aec] (margin from the score bound: a gated alignment of
score >= s spans at most len2 + (len2*max_sub - s)/GEP extra columns) and
checks that (best, aec) reproduce exactly; any mismatch falls back to the
full-width exact computation.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import GEP
from ..ops.dp_numpy import Alignment, dyn_prog, max_sg_score
from ..utils.encoding import encode_seq


@dataclass
class StrandScore:
    best: int
    aec: int


class Pass1Scorer:
    """Batches reads against both reference strands on the device."""

    def __init__(self, fw_s1c, rc_s1c, len1: int, submat, batch: int = 256):
        import jax.numpy as jnp

        self.len1 = len1
        self.batch = batch
        self.submat = np.asarray(submat, dtype=np.int32)
        self._fw = jnp.asarray(np.asarray(fw_s1c[:len1], dtype=np.int32))
        self._rc = jnp.asarray(np.asarray(rc_s1c[:len1], dtype=np.int32))
        self._sm = jnp.asarray(self.submat)

    def score_batch(self, reads, fw_masks, rc_masks):
        """reads: list[str] (already trimmed); masks: list[np.ndarray bool].
        Returns list[(StrandScore fw, StrandScore rc)]."""
        import jax.numpy as jnp

        from ..ops.dp_jax import batch_best_and_aec, batch_last_row, depths_for

        n = len(reads)
        if n == 0:
            return []
        L = max(max(len(r) for r in reads), 1)
        B = n
        s2c = np.full((B, L), 4, np.int32)
        lengths = np.empty(B, np.int32)
        for b, r in enumerate(reads):
            lengths[b] = len(r)
            if r:
                s2c[b, : len(r)] = encode_seq(r)
        depths = depths_for(lengths, L)
        fw_m = np.stack([m[: self.len1] for m in fw_masks]).astype(bool)
        rc_m = np.stack([m[: self.len1] for m in rc_masks]).astype(bool)

        out = []
        for strand_s1c, m in ((self._fw, fw_m), (self._rc, rc_m)):
            last = batch_last_row(
                strand_s1c,
                jnp.asarray(m),
                jnp.asarray(s2c),
                jnp.asarray(lengths),
                jnp.asarray(depths),
                self._sm,
                sg5=True,
            )
            best, aec = batch_best_and_aec(last)
            out.append((np.asarray(best), np.asarray(aec)))
        (fb, fa), (rb, ra) = out
        return [
            (StrandScore(int(fb[b]), int(fa[b])), StrandScore(int(rb[b]), int(ra[b])))
            for b in range(n)
        ]


def windowed_exact_dp(a: Alignment, device_best: int, device_aec: int) -> None:
    """Run the exact host DP for ``a`` restricted to a score-bounded window
    ending at the device-reported end column; falls back to the full width
    when the window result disagrees."""
    len2 = a.len2
    max_sub = int(np.max(a.submat))
    slack = max(0, (len2 * max_sub - device_best) // GEP) if device_best < len2 * max_sub else 0
    margin = len2 + slack + 16

    from ..ops.dp_numpy import find_align_begin

    full_mask = a.align_mask[: a.len1].copy()
    lo = max(device_aec - margin, 0)
    if lo > 0 or device_aec < a.len1 - 1:
        a.align_mask[: a.len1] = 0
        a.align_mask[lo : device_aec + 1] = full_mask[lo : device_aec + 1]
        dyn_prog(a)
        best = max_sg_score(a)
        if best == device_best and a.aec == device_aec:
            find_align_begin(a)
            if lo == 0 or a.abc > lo + 2:
                a.align_mask[: a.len1] = full_mask
                return
        # fall back: restore and recompute full-width
        a.align_mask[: a.len1] = full_mask
    dyn_prog(a)
    max_sg_score(a)
    find_align_begin(a)
