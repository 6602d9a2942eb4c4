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

SCORE_BATCH = 2048
MAX_INTERVALS = 16
_L_BUCKETS = (32, 64, 96, 128, 192, 256)
# per-read reference window for the banded scorer; strands whose k-mer band
# spans more than WIN_W columns fall back to the full-width scorer
WIN_W = 384
FULL_BATCH = 128


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

        from ..utils.jaxcfg import setup_jax_cache

        setup_jax_cache()

        self.len1 = len1
        # pad the reference width to the lane quantum; padded columns stay
        # masked (HIM) so results are unchanged
        self.W = -(-len1 // 128) * 128
        self.batch = batch
        self.submat = np.asarray(submat, dtype=np.int32)
        # extra WIN_W of padding so per-read window gathers never run off the
        # end (gathered junk columns are masked)
        fw = np.full(self.W + WIN_W, 4, np.int32)
        fw[:len1] = np.asarray(fw_s1c[:len1], dtype=np.int32)
        rc = np.full(self.W + WIN_W, 4, np.int32)
        rc[:len1] = np.asarray(rc_s1c[:len1], dtype=np.int32)
        self._fw_pad = jnp.asarray(fw)
        self._rc_pad = jnp.asarray(rc)
        self._fw = self._fw_pad[: self.W]
        self._rc = self._rc_pad[: self.W]
        self._sm = jnp.asarray(self.submat)
        self._use_pallas = jax.devices()[0].platform != "cpu"
        self._score_fn = self._build()
        self._score_win_fn = self._build_win()

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

    def _build_win(self):
        """Windowed scorer: each (read, strand) gets a WIN_W-column slice of
        the reference around its k-mer band, so device work per read is
        O(read_len * WIN_W) instead of O(read_len * ref_len).

        Exactness: every open (unmasked) column lies inside the window, the
        window's local columns 0-1 are masked stand-ins for the whole masked
        left context unless the window starts at true column 0 (the same
        construction dp_numpy.dyn_prog uses for its host band), masked cells
        hold HIM and can never win or influence an open cell, and the gap
        cost terms are shift-invariant — so (best, aec) equal the full-width
        values exactly."""
        import jax
        import jax.numpy as jnp

        from ..ops.dp_jax import batch_last_row

        use_pallas = self._use_pallas

        def expand_mask_local(iv):  # [B, K, 2] window-local -> [B, WIN_W]
            cols = jnp.arange(WIN_W, dtype=jnp.int32)[None, None, :]
            lo = iv[:, :, 0][:, :, None]
            hi = iv[:, :, 1][:, :, None]
            return ((cols >= lo) & (cols < hi)).any(axis=1)

        # NOTE: the padded reference strands are jit ARGUMENTS, not closure
        # captures — a closure-captured device array becomes an HLO constant,
        # which lowering materialises on the HOST; over a tunneled device
        # link that fetch dominated the whole assembly (~145 s per strand).
        @functools.partial(jax.jit, static_argnames=())
        def score_win(fw_pad, rc_pad, fw_starts, rc_starts, fw_ivl, rc_ivl, payload, lengths):
            def gather(ref, starts):
                # one fused gather: [B, WIN_W] indices into the padded ref
                idx = starts[:, None] + jnp.arange(WIN_W, dtype=jnp.int32)[None, :]
                return ref[idx]

            wins = jnp.concatenate(
                [gather(fw_pad, fw_starts), gather(rc_pad, rc_starts)]
            )
            maskw = jnp.concatenate(
                [expand_mask_local(fw_ivl), expand_mask_local(rc_ivl)]
            )
            ln2 = jnp.concatenate([lengths, lengths])
            if use_pallas:
                from ..ops.dp_pallas import pallas_last_row

                payload2 = jnp.concatenate([payload, payload])
                last = pallas_last_row(
                    wins, maskw, payload2, ln2, sg5=True, block_b=8
                )
            else:
                s2c, depths = payload
                last = batch_last_row(
                    wins,
                    maskw,
                    jnp.concatenate([s2c, s2c]),
                    ln2,
                    jnp.concatenate([depths, depths]),
                    self._sm,
                    sg5=True,
                )
            aec = jnp.argmax(last, axis=1).astype(jnp.int32)
            best = jnp.take_along_axis(last, aec[:, None], axis=1)[:, 0]
            return jnp.stack([best, aec])  # [2, 2B]: fw rows 0..B-1, rc B..

        return score_win

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
            return (None, None, None, None, None, 0)
        B = self.batch
        assert n <= B

        L = max(max((len(r) for r in reads), default=1), 1)
        for bucket in _L_BUCKETS:
            if L <= bucket:
                L = bucket
                break

        K = MAX_INTERVALS
        s2c = np.full((B, L), 4, np.int32)
        lengths = np.ones(B, np.int32)
        fw_iv = np.zeros((B, K, 2), np.int32)
        rc_iv = np.zeros((B, K, 2), np.int32)
        fw_ivl = np.zeros((B, K, 2), np.int32)
        rc_ivl = np.zeros((B, K, 2), np.int32)
        fw_starts = np.zeros(B, np.int32)
        rc_starts = np.zeros(B, np.int32)
        host_only = np.zeros(n, bool)
        wide: list[int] = []
        for b, r in enumerate(reads):
            if r:
                lengths[b] = len(r)
                s2c[b, : len(r)] = encode_seq(r)
            fiv = mask_intervals(fw_masks[b][: self.len1])
            riv = mask_intervals(rc_masks[b][: self.len1])
            if fiv is None or riv is None:
                host_only[b] = True
                continue
            ok = True
            for iv, ivl, starts in (
                (fiv, fw_ivl, fw_starts),
                (riv, rc_ivl, rc_starts),
            ):
                used = iv[:, 1] > 0
                if not used.any():
                    continue  # fully masked strand: empty window, HIM result
                lo = int(iv[used, 0].min())
                hi = int(iv[used, 1].max())
                ws = max(0, lo - 2)
                if hi - ws > WIN_W:
                    ok = False
                    break
                starts[b] = ws
                ivl[b] = np.where(used[:, None], iv - ws, 0)
            if not ok:
                wide.append(b)
                fw_iv[b] = fiv
                rc_iv[b] = riv
                fw_starts[b] = rc_starts[b] = 0
                fw_ivl[b] = 0
                rc_ivl[b] = 0

        depths = depths_for(lengths, L)
        if self._use_pallas:
            row_sm = make_row_sm(self.submat, s2c, depths).astype(np.int32)
            payload = jnp.asarray(row_sm)
        else:
            payload = (jnp.asarray(s2c), jnp.asarray(depths))
        outs_win = self._score_win_fn(
            self._fw_pad,
            self._rc_pad,
            jnp.asarray(fw_starts),
            jnp.asarray(rc_starts),
            jnp.asarray(fw_ivl),
            jnp.asarray(rc_ivl),
            payload,
            jnp.asarray(lengths),
        )
        wide_handles = []
        for i in range(0, len(wide), FULL_BATCH):
            chunk = wide[i : i + FULL_BATCH]
            m = len(chunk)
            fwi = np.zeros((FULL_BATCH, K, 2), np.int32)
            rci = np.zeros((FULL_BATCH, K, 2), np.int32)
            fwi[:m] = fw_iv[chunk]
            rci[:m] = rc_iv[chunk]
            ln_w = np.ones(FULL_BATCH, np.int32)
            ln_w[:m] = lengths[chunk]
            if self._use_pallas:
                pay_w = np.full((FULL_BATCH,) + row_sm.shape[1:], 0, np.int32)
                pay_w[:m] = row_sm[chunk]
                pay_w = jnp.asarray(pay_w)
            else:
                s2c_w = np.full((FULL_BATCH, L), 4, np.int32)
                s2c_w[:m] = s2c[chunk]
                d_w = depths_for(ln_w, L)
                pay_w = (jnp.asarray(s2c_w), jnp.asarray(d_w))
            outs = self._score_fn(
                self._fw,
                self._rc,
                jnp.asarray(fwi),
                jnp.asarray(rci),
                pay_w,
                jnp.asarray(ln_w),
            )
            wide_handles.append((outs, chunk))
        return (outs_win, fw_starts, rc_starts, wide_handles, host_only, n)

    def dispatch_packed(self, s2c, lens, fw_ws, rc_ws, fw_ivg, rc_ivg, flags):
        """Enqueue a batch already packed by the native host engine
        (core/hostbatch.py: BatchHost.prepare).  Same double-buffer contract
        as :meth:`dispatch`; results come back via :meth:`collect_arrays`.

        flags: per-read FLAG_SKIP / FLAG_HOST_ONLY / FLAG_WIDE bits (reads
        flagged skip/host-only get garbage scores the caller must ignore)."""
        import jax.numpy as jnp

        from ..ops.dp_jax import depths_for
        from ..ops.dp_pallas import make_row_sm
        from .hostbatch import FLAG_HOST_ONLY, FLAG_SKIP, FLAG_WIDE

        n = len(lens)
        if n == 0:
            return (None, None, None, None, None, 0)
        B = self.batch
        assert n <= B
        L = s2c.shape[1]

        def pad(a, fill=0):
            if n == B:
                return np.ascontiguousarray(a)
            out = np.full((B,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        s2c_p = pad(s2c, 4)
        lengths = pad(np.maximum(lens.astype(np.int32), 1), 1)
        fw_ws_p = pad(fw_ws.astype(np.int32))
        rc_ws_p = pad(rc_ws.astype(np.int32))

        inactive = (flags & (FLAG_SKIP | FLAG_HOST_ONLY)) != 0
        wide_m = ((flags & FLAG_WIDE) != 0) & ~inactive
        windowed = ~(wide_m | inactive)

        def local_iv(ivg, ws):
            used = ivg[:, :, 1] > 0
            loc = np.where(
                (used & windowed[:n, None])[:, :, None], ivg - ws[:n, None, None], 0
            ).astype(np.int32)
            return pad(loc)

        fw_ivl = local_iv(fw_ivg, fw_ws)
        rc_ivl = local_iv(rc_ivg, rc_ws)
        # windowed dispatch ignores starts of wide/inactive reads
        fw_ws_p[:n][~windowed[:n]] = 0
        rc_ws_p[:n][~windowed[:n]] = 0

        depths = depths_for(lengths, L)
        if self._use_pallas:
            row_sm = make_row_sm(self.submat, s2c_p, depths).astype(np.int32)
            payload = jnp.asarray(row_sm)
        else:
            payload = (jnp.asarray(s2c_p), jnp.asarray(depths))
        outs_win = self._score_win_fn(
            self._fw_pad,
            self._rc_pad,
            jnp.asarray(fw_ws_p),
            jnp.asarray(rc_ws_p),
            jnp.asarray(fw_ivl),
            jnp.asarray(rc_ivl),
            payload,
            jnp.asarray(lengths),
        )
        wide = list(np.flatnonzero(wide_m[:n]))
        K = fw_ivg.shape[1]
        wide_handles = []
        for i in range(0, len(wide), FULL_BATCH):
            chunk = wide[i : i + FULL_BATCH]
            m = len(chunk)
            fwi = np.zeros((FULL_BATCH, K, 2), np.int32)
            rci = np.zeros((FULL_BATCH, K, 2), np.int32)
            fwi[:m] = fw_ivg[chunk]
            rci[:m] = rc_ivg[chunk]
            ln_w = np.ones(FULL_BATCH, np.int32)
            ln_w[:m] = lengths[chunk]
            if self._use_pallas:
                pay_w = np.zeros((FULL_BATCH,) + row_sm.shape[1:], np.int32)
                pay_w[:m] = row_sm[chunk]
                pay_w = jnp.asarray(pay_w)
            else:
                s2c_w = np.full((FULL_BATCH, L), 4, np.int32)
                s2c_w[:m] = s2c_p[chunk]
                d_w = depths_for(ln_w, L)
                pay_w = (jnp.asarray(s2c_w), jnp.asarray(d_w))
            outs = self._score_fn(
                self._fw,
                self._rc,
                jnp.asarray(fwi),
                jnp.asarray(rci),
                pay_w,
                jnp.asarray(ln_w),
            )
            wide_handles.append((outs, chunk))
        return (outs_win, fw_ws_p, rc_ws_p, wide_handles, None, n)

    @staticmethod
    def collect_arrays(handle):
        """Materialise a packed batch: (fb, fa, rb, ra) int64 arrays [n]."""
        outs_win, fw_starts, rc_starts, wide_handles, _, n = handle
        arr = np.asarray(outs_win)  # [2, 2B]
        B = len(fw_starts)
        fb = arr[0, :B].astype(np.int64)
        fa = (arr[1, :B] + fw_starts).astype(np.int64)
        rb = arr[0, B:].astype(np.int64)
        ra = (arr[1, B:] + rc_starts).astype(np.int64)
        for outs, chunk in wide_handles:
            w = np.asarray(outs)  # [4, FULL_BATCH]
            m = len(chunk)
            fb[chunk] = w[0, :m]
            fa[chunk] = w[1, :m]
            rb[chunk] = w[2, :m]
            ra[chunk] = w[3, :m]
        return fb[:n], fa[:n], rb[:n], ra[:n]

    @staticmethod
    def collect(handle):
        """Materialise a dispatched batch into per-read StrandScore pairs."""
        outs_win, fw_starts, rc_starts, wide_handles, host_only, n = handle
        if n == 0:
            return []
        arr = np.asarray(outs_win)  # [2, 2B]
        B = len(fw_starts)
        fb = arr[0, :B].copy()
        fa = arr[1, :B] + fw_starts
        rb = arr[0, B:].copy()
        ra = arr[1, B:] + rc_starts
        for outs, chunk in wide_handles:
            w = np.asarray(outs)  # [4, FULL_BATCH]
            for k, b in enumerate(chunk):
                fb[b], fa[b], rb[b], ra[b] = w[0, k], w[1, k], w[2, k], w[3, k]
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
    when the window result disagrees.  On return a.pw holds the winning
    traceback strings (solve_sg)."""
    from ..ops.dp_numpy import solve_sg

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
        solve_sg(a)
        a.align_mask[: a.len1] = full_mask
        if a.best_score == device_best and a.aec == device_aec:
            if lo == 0 or a.abc > lo + 2:
                return
        # fall back: recompute over the full (kmer-banded) width
    solve_sg(a)
