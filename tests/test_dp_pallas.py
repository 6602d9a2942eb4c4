"""Pallas kernel correctness in interpreter mode (small shapes; the real-TPU
path is exercised by bench.py, which asserts kernel-vs-XLA equality before
timing).

Interpreter-mode pallas is pathologically slow under this environment's CPU
backend (minutes for a trivial kernel), so this test is opt-in via
MIA_TPU_SLOW_TESTS=1.
"""
import functools
import os

import numpy as np
import pytest


@pytest.mark.skipif(
    os.environ.get("MIA_TPU_SLOW_TESTS") != "1",
    reason="pallas interpret mode is extremely slow on this CPU backend; "
    "set MIA_TPU_SLOW_TESTS=1 to run (bench.py covers the real-TPU path)",
)
def test_pallas_kernel_matches_xla_interpret():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mia_tpu.ops.dp_jax import batch_last_row, depths_for
    from mia_tpu.ops.dp_pallas import _dp_kernel, make_row_sm
    from mia_tpu.ops.pssm import init_flatsubmat
    from mia_tpu.utils.encoding import encode_seq

    rng = np.random.default_rng(1)
    W, L, B = 64, 8, 8
    ref = "".join(rng.choice(list("ACGT")) for _ in range(W))
    sm = (init_flatsubmat() + rng.integers(-40, 40, (31, 5, 5))).astype(np.int32)
    reads, masks = [], []
    for b in range(B):
        n = int(rng.integers(3, L))
        s = int(rng.integers(0, W - n))
        reads.append(
            "".join(
                c if rng.random() > 0.1 else rng.choice(list("ACGT"))
                for c in ref[s : s + n]
            )
        )
        m = np.ones(W, bool) if b % 2 == 0 else np.zeros(W, bool)
        if b % 2:
            m[max(s - 10, 0) : s + n + 10] = True
        masks.append(m)
    lengths = np.array([len(r) for r in reads], np.int32)
    s2c = np.full((B, L), 4, np.int32)
    for b, r in enumerate(reads):
        s2c[b, : len(r)] = encode_seq(r)
    s1c = encode_seq(ref).astype(np.int32)
    depths = depths_for(lengths, L)
    row_sm = make_row_sm(sm, s2c, depths)

    want = np.asarray(
        batch_last_row(
            jnp.asarray(s1c),
            jnp.asarray(np.stack(masks)),
            jnp.asarray(s2c),
            jnp.asarray(lengths),
            jnp.asarray(depths),
            jnp.asarray(sm),
            sg5=True,
        )
    )
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_dp_kernel, W=W, L=L, sg5=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((B, W), lambda i, *_: (i, 0)),
            pl.BlockSpec((L, B, 5), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((B, 1), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((B, W), lambda i, *_: (i, 0)),
    )
    got = np.asarray(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
            grid_spec=grid_spec,
            interpret=True,
        )(
            np.array([int(lengths.max())], np.int32),
            s1c.reshape(1, W),
            np.stack(masks).astype(np.int32),
            row_sm.astype(np.int32).transpose(1, 0, 2),
            lengths.reshape(B, 1),
        )
    )
    np.testing.assert_array_equal(got, want)
