"""Device-accelerated pass-1 engine.

Phase split: the host streams/filters reads (trim + k-mer masks), the device
scores whole batches fw+rc with the batched DP kernel, and the host then
reconstructs the winning strand's traceback over a score-verified window —
so merge bookkeeping stays identical to the exact engine while the O(W*L)
scoring work runs on the TPU.

Transfer discipline (the host<->device link may be a high-latency tunnel):
batches ship as fixed shapes (batch padded to SCORE_BATCH, rows bucketed) so
kernels compile once; k-mer band masks ship as per-read interval lists (a
few dozen bytes) and expand to [B, W] on device; only per-read (best, aec)
scalars come back.

Window verification: the host recomputes the winning strand's DP restricted
to [aec - margin, aec] (margin from the score bound: a gated alignment of
score >= s spans at most len2 + (len2*max_sub - s)/GEP extra columns) and
checks that (best, aec) and the alignment start reproduce exactly; any
disagreement falls back to the full-width exact computation.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..constants import GEP
from ..ops.dp_numpy import Alignment, dyn_prog, max_sg_score
from ..utils.encoding import encode_seq

SCORE_BATCH = 512
MAX_INTERVALS = 16
_L_BUCKETS = (32, 64, 96, 128, 192, 256)


@dataclass
class StrandScore:
    best: int
    aec: int


def mask_intervals(mask: np.ndarray) -> np.ndarray | None:
    """[K,2] (lo, hi-exclusive) intervals of the open columns, or None when
    the mask needs more than MAX_INTERVALS (caller falls back to host)."""
    m = mask.astype(bool)
    d = np.diff(m.astype(np.int8))
    starts = list(np.flatnonzero(d == 1) + 1)
    ends = list(np.flatnonzero(d == -1) + 1)
    if m[0]:
        starts.insert(0, 0)
    if m[-1]:
        ends.append(len(m))
    if len(starts) > MAX_INTERVALS:
        return None
    out = np.zeros((MAX_INTERVALS, 2), np.int32)
    for k, (s, e) in enumerate(zip(starts, ends)):
        out[k] = (s, e)
    return out


class Pass1Scorer:
    """Batches reads against both reference strands on the device."""

    def __init__(self, fw_s1c, rc_s1c, len1: int, submat, batch: int = SCORE_BATCH):
        import jax
        import jax.numpy as jnp

        self.len1 = len1
        # pad the reference width to the lane quantum; padded columns stay
        # masked (HIM) so results are unchanged
        self.W = -(-len1 // 128) * 128
        self.batch = batch
        self.submat = np.asarray(submat, dtype=np.int32)
        fw = np.full(self.W, 4, np.int32)
        fw[:len1] = np.asarray(fw_s1c[:len1], dtype=np.int32)
        rc = np.full(self.W, 4, np.int32)
        rc[:len1] = np.asarray(rc_s1c[:len1], dtype=np.int32)
        self._fw = jnp.asarray(fw)
        self._rc = jnp.asarray(rc)
        self._sm = jnp.asarray(self.submat)
        self._use_pallas = jax.devices()[0].platform != "cpu"
        self._score_fn = self._build()

    def _build(self):
        import jax
        import jax.numpy as jnp

        from ..ops.dp_jax import batch_last_row

        W = self.W
        len1 = self.len1

        def expand_mask(iv):  # [B, K, 2] -> [B, W] bool
            cols = jnp.arange(W, dtype=jnp.int32)[None, None, :]
            lo = iv[:, :, 0][:, :, None]
            hi = iv[:, :, 1][:, :, None]
            return ((cols >= lo) & (cols < hi)).any(axis=1)

        use_pallas = self._use_pallas

        def strand_last_row(s1c, iv, payload, lengths):
            mask = expand_mask(iv)
            if use_pallas:
                from ..ops.dp_pallas import pallas_last_row

                last = pallas_last_row(
                    s1c, mask, payload, lengths, sg5=True, block_b=8
                )
            else:
                s2c, depths = payload
                last = batch_last_row(
                    s1c, mask, s2c, lengths, depths, self._sm, sg5=True
                )
            aec = jnp.argmax(last, axis=1).astype(jnp.int32)
            best = jnp.take_along_axis(last, aec[:, None], axis=1)[:, 0]
            return best, aec

        # one jitted call scores BOTH strands, returning ONE stacked [4, B]
        # array: a single dispatch and a single result-fetch round-trip per
        # batch (each fetch on a tunneled device link costs ~30 ms)
        @functools.partial(jax.jit, static_argnames=())
        def score(fw_s1c, rc_s1c, fw_iv, rc_iv, payload, lengths):
            fb, fa = strand_last_row(fw_s1c, fw_iv, payload, lengths)
            rb, ra = strand_last_row(rc_s1c, rc_iv, payload, lengths)
            return jnp.stack([fb, fa, rb, ra])

        return score

    def dispatch(self, reads, fw_masks, rc_masks):
        """Enqueue a batch on the device WITHOUT blocking on the result.

        Returns an opaque handle for :meth:`collect`.  JAX dispatch is
        asynchronous, so the caller can keep doing host work (merging the
        previous batch) while this one computes / transfers.
        """
        import jax.numpy as jnp

        from ..ops.dp_jax import depths_for
        from ..ops.dp_pallas import make_row_sm

        n = len(reads)
        if n == 0:
            return (None, None, 0)
        B = self.batch
        assert n <= B

        L = max(max((len(r) for r in reads), default=1), 1)
        for bucket in _L_BUCKETS:
            if L <= bucket:
                L = bucket
                break

        s2c = np.full((B, L), 4, np.int32)
        lengths = np.ones(B, np.int32)
        fw_iv = np.zeros((B, MAX_INTERVALS, 2), np.int32)
        rc_iv = np.zeros((B, MAX_INTERVALS, 2), np.int32)
        host_only = np.zeros(n, bool)
        for b, r in enumerate(reads):
            if r:
                lengths[b] = len(r)
                s2c[b, : len(r)] = encode_seq(r)
            fiv = mask_intervals(fw_masks[b][: self.len1])
            riv = mask_intervals(rc_masks[b][: self.len1])
            if fiv is None or riv is None:
                host_only[b] = True
            else:
                fw_iv[b] = fiv
                rc_iv[b] = riv

        depths = depths_for(lengths, L)
        if self._use_pallas:
            payload = jnp.asarray(make_row_sm(self.submat, s2c, depths).astype(np.int32))
        else:
            payload = (jnp.asarray(s2c), jnp.asarray(depths))
        outs = self._score_fn(
            self._fw,
            self._rc,
            jnp.asarray(fw_iv),
            jnp.asarray(rc_iv),
            payload,
            jnp.asarray(lengths),
        )
        return (outs, host_only, n)

    @staticmethod
    def collect(handle):
        """Materialise a dispatched batch into per-read StrandScore pairs."""
        outs, host_only, n = handle
        if n == 0:
            return []
        fb, fa, rb, ra = np.asarray(outs)
        res = []
        for b in range(n):
            if host_only[b]:
                res.append(None)
            else:
                res.append(
                    (
                        StrandScore(int(fb[b]), int(fa[b])),
                        StrandScore(int(rb[b]), int(ra[b])),
                    )
                )
        return res

    def score_batch(self, reads, fw_masks, rc_masks):
        """reads: list[str] (already trimmed); masks: per-read bool arrays.
        Returns list of (fw StrandScore | None, rc StrandScore | None); None
        entries mean 'score on host' (mask too fragmented)."""
        return self.collect(self.dispatch(reads, fw_masks, rc_masks))


def windowed_exact_dp(a: Alignment, device_best: int, device_aec: int) -> None:
    """Run the exact host DP for ``a`` restricted to a score-bounded window
    ending at the device-reported end column; falls back to the full width
    when the window result disagrees."""
    from ..ops.dp_numpy import find_align_begin

    len2 = a.len2
    max_sub = int(np.max(a.submat))
    slack = (
        max(0, (len2 * max_sub - device_best) // GEP)
        if device_best < len2 * max_sub
        else 0
    )
    margin = len2 + slack + 16

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
