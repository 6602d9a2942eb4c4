"""Benchmark: banded semi-global DP throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C implementation's single-core scalar DP measured at
~49 Mcells/s (gcc -O2, mpieva/mapping-iterative-assembler dyn_prog on the
sim200 circular-mtDNA workload: 0.400 Gcells pass-1 in 8.2s).

The run asserts Pallas-kernel vs exact-host-engine score equality on a
sub-batch before timing, so the number is for the bit-exact kernel.
"""
import json
import sys
import time

import numpy as np

C_BASELINE_GCELLS = 0.049  # single-core C reference (see module docstring)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import functools

    from mia_tpu.ops.dp_jax import batch_best_and_aec, depths_for
    from mia_tpu.ops.dp_pallas import make_row_sm, pallas_last_row
    from mia_tpu.ops.pssm import init_flatsubmat
    from mia_tpu.utils.encoding import encode_seq

    rng = np.random.default_rng(0)
    W, L, B = 17024, 256, 512  # wrapped-mtDNA-scale reference, max read len
    n_batches = 4

    ref = "".join(rng.choice(list("ACGT")) for _ in range(W))
    sm = init_flatsubmat().astype(np.int32)
    s1c_np = encode_seq(ref).astype(np.int32)
    s1c = jnp.asarray(s1c_np)
    mask = jnp.asarray(np.ones((B, W), dtype=bool))

    @functools.partial(jax.jit, static_argnames=("sg5", "block_b"))
    def best_fn(s1c, mask, row_sm, lengths, sg5=True, block_b=8):
        last = pallas_last_row(s1c, mask, row_sm, lengths, sg5=sg5, block_b=block_b)
        return batch_best_and_aec(last)

    batches = []
    reads_all = []
    for _ in range(n_batches):
        lengths = rng.integers(30, 120, B).astype(np.int32)
        starts = rng.integers(0, W - 200, B)
        s2c = np.full((B, L), 4, np.int32)
        reads = []
        for b in range(B):
            n = int(lengths[b])
            r = ref[starts[b] : starts[b] + n]
            r = "".join(
                c if rng.random() > 0.03 else rng.choice(list("ACGT")) for c in r
            )
            reads.append(r)
            s2c[b, :n] = encode_seq(r)
        depths = depths_for(lengths, L)
        row_sm = make_row_sm(sm, s2c, depths)
        batches.append(
            (jnp.asarray(row_sm.astype(np.int32)), jnp.asarray(lengths))
        )
        reads_all.append((reads, lengths))

    # correctness gate: kernel last row == exact host engine on 3 reads
    from mia_tpu.constants import HIM
    from mia_tpu.core.driver import init_alignment, set_seq1, set_seq2
    from mia_tpu.ops import dp_numpy as dpn

    last_full = pallas_last_row(
        s1c, mask, batches[0][0], batches[0][1], sg5=True, block_b=8
    )
    last_np = np.asarray(last_full[:3])
    for b in range(3):
        read = reads_all[0][0][b]
        a = init_alignment(256, W + 16, False, False)
        a.submat = sm
        set_seq1(a, ref)
        set_seq2(a, read)
        a.sg5 = a.sg3 = True
        dpn.dyn_prog(a)
        host = np.full(W, HIM, np.int64)
        w = a.score.shape[1]
        host[a.col_off : a.col_off + w] = a.score[a.len2 - 1]
        if not np.array_equal(last_np[b], host):
            print(
                json.dumps(
                    {
                        "metric": "banded_sw_gcells_per_s_per_chip",
                        "value": 0.0,
                        "unit": "Gcells/s",
                        "vs_baseline": 0.0,
                        "error": "kernel mismatch vs exact host engine",
                    }
                )
            )
            return 1

    # warmup
    b0, a0 = best_fn(s1c, mask, *batches[0])
    np.asarray(b0)

    t0 = time.time()
    outs = [best_fn(s1c, mask, rs, ln) for rs, ln in batches]
    for b_, a_ in outs:
        np.asarray(b_)
    dt = time.time() - t0

    cells = n_batches * B * W * L
    gcells = cells / dt / 1e9
    reads_per_s = n_batches * B / dt

    print(
        json.dumps(
            {
                "metric": "banded_sw_gcells_per_s_per_chip",
                "value": round(gcells, 2),
                "unit": "Gcells/s",
                "vs_baseline": round(gcells / C_BASELINE_GCELLS, 1),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "batch": B,
                    "ref_width": W,
                    "rows": L,
                    "full_width_read_scores_per_s": round(reads_per_s, 1),
                    "c_baseline_gcells_per_s": C_BASELINE_GCELLS,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
