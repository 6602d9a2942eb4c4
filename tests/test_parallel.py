"""Sharded assembly step on the virtual 8-device CPU mesh: psum-merged
consensus must equal the single-device computation."""
import numpy as np

import jax
import jax.numpy as jnp

from mia_tpu.ops.dp_jax import batch_best_and_aec, batch_last_row, depths_for
from mia_tpu.ops.pssm import init_flatsubmat, revcom_submat
from mia_tpu.parallel.sharded import (
    consensus_from_counts,
    make_assembly_step,
    make_mesh,
)
from mia_tpu.utils.encoding import encode_seq


def _mk_inputs(B=16, W=384, L=32, seed=0):
    rng = np.random.default_rng(seed)
    ref = "".join(rng.choice(list("ACGT")) for _ in range(W))
    reads = []
    for _ in range(B):
        n = int(rng.integers(8, L))
        s = int(rng.integers(0, W - n))
        reads.append(
            "".join(
                c if rng.random() > 0.05 else rng.choice(list("ACGT"))
                for c in ref[s : s + n]
            )
        )
    lengths = np.array([len(r) for r in reads], np.int32)
    s2c = np.full((B, L), 4, np.int32)
    for b, r in enumerate(reads):
        s2c[b, : len(r)] = encode_seq(r)
    s1c = encode_seq(ref).astype(np.int32)
    return s1c, s2c, lengths


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    B, W, L = 16, 384, 32
    s1c, s2c, lengths = _mk_inputs(B, W, L)
    depths = depths_for(lengths, L)
    fpsm = init_flatsubmat()
    rpsm = revcom_submat(fpsm)
    mask = np.ones((B, W), bool)

    mesh = make_mesh(n_dp=4, n_sp=2)
    step = make_assembly_step(mesh)
    best_s, aec_s, cons_s = step(
        jnp.asarray(s1c),
        jnp.asarray(mask),
        jnp.asarray(s2c),
        jnp.asarray(lengths),
        jnp.asarray(depths),
        jnp.asarray(fpsm.astype(np.int32)),
        jnp.asarray(rpsm.astype(np.int32)),
    )

    # single-device reference
    last = batch_last_row(
        jnp.asarray(s1c),
        jnp.asarray(mask),
        jnp.asarray(s2c),
        jnp.asarray(lengths),
        jnp.asarray(depths),
        jnp.asarray(fpsm.astype(np.int32)),
        sg5=True,
    )
    best1, aec1 = batch_best_and_aec(last)
    np.testing.assert_array_equal(np.asarray(best_s), np.asarray(best1))
    np.testing.assert_array_equal(np.asarray(aec_s), np.asarray(aec1))

    # rebuild the consensus with plain numpy scatter-adds
    starts = np.asarray(aec1) - lengths + 1
    counts = np.zeros((W, 5), np.int64)
    scores = np.zeros((W, 4), np.int64)
    for b in range(B):
        for r in range(int(lengths[b])):
            c = starts[b] + r
            if 0 <= c < W:
                base = s2c[b, r]
                counts[c, base] += 1
                scores[c] += fpsm[depths[b, r], :4, base]
    cons1 = np.asarray(
        consensus_from_counts(jnp.asarray(counts.astype(np.int32)),
                              jnp.asarray(scores.astype(np.int32)))
    )
    np.testing.assert_array_equal(np.asarray(cons_s), cons1)


def test_mesh_uses_all_devices():
    mesh = make_mesh(n_dp=8, n_sp=1)
    assert mesh.shape == {"dp": 8, "sp": 1}
