"""On-TPU parity gate (VERDICT r2 item 7): when real TPU hardware is
reachable, the full --engine jax assembly must reproduce the golden maln
bytes ON HARDWARE (not just under the CPU-backend stand-in), and the Pallas
kernel must agree with the exact scalar engine on hardware.

The suite's conftest pins the in-process backend to the virtual CPU mesh, so
these tests run everything in subprocesses that keep the ambient (axon/TPU)
platform.  Skips when no TPU answers within the probe timeout — on TPU
machines this is a real gate, not a perpetual skip.
"""
import os
import subprocess
import sys

import pytest

from .conftest import FIXTURES, GOLDEN

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("MIA_JAX_PLATFORM", None)
    env.pop("JAX_PLATFORMS", None)
    # strip the virtual-mesh flag the conftest sets for in-process tests
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _have_tpu() -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            env=_tpu_env(), capture_output=True, timeout=180,
        )
        plat = r.stdout.decode().strip().splitlines()[-1] if r.returncode == 0 else ""
        return plat not in ("", "cpu")
    except Exception:
        return False


_HAS_TPU = _have_tpu()
pytestmark = pytest.mark.skipif(
    not _HAS_TPU, reason="no TPU backend reachable (probe timeout/cpu-only)"
)


def test_jax_engine_golden_on_tpu(tmp_path):
    """Full fixture assembly with --engine jax ON HARDWARE == golden bytes.
    Uses the kmer config so the windowed device program is the path taken."""
    subprocess.run(
        [sys.executable, "-m", "mia_tpu.cli.mia",
         "-r", os.path.join(FIXTURES, "tr1.fna"),
         "-f", os.path.join(FIXTURES, "tf.fna"),
         "-k", "12", "-m", "out.maln", "--engine", "jax"],
        cwd=tmp_path, env=_tpu_env(), check=True, capture_output=True,
        timeout=900,
    )
    golden = os.path.join(GOLDEN, "kmer")
    produced = sorted(p for p in os.listdir(tmp_path) if p.startswith("out.maln."))
    assert produced == sorted(os.listdir(golden))
    for fn in produced:
        with open(tmp_path / fn, "rb") as a, open(os.path.join(golden, fn), "rb") as b:
            assert a.read().split(b"\n")[1:] == b.read().split(b"\n")[1:], fn


PALLAS_CHECK = r"""
import numpy as np
import jax
assert jax.devices()[0].platform != "cpu"
import mia_tpu.core.jax_engine as je
from mia_tpu.core.driver import init_alignment, set_seq1, set_seq2
from mia_tpu.ops import dp_numpy as dpn
from mia_tpu.ops.pssm import init_flatsubmat

rng = np.random.default_rng(3)
len1 = 2400
chars = np.array(list("ACGTN"))
ref_codes = rng.integers(0, 4, len1).astype(np.int8)
sm = (init_flatsubmat() + rng.integers(-40, 40, (31, 5, 5))).astype(np.int32)
sc = je.Pass1Scorer(ref_codes, ref_codes, len1, sm, batch=32, warm=False)
n = 16
lens = rng.integers(8, 100, n).astype(np.int32)
ws = rng.integers(0, len1 - je.WIN_W, n).astype(np.int32)
ivl = np.zeros((n, je.MAX_INTERVALS, 2), np.int32)
ivl[:, 0, 0] = 2
ivl[:, 0, 1] = rng.integers(60, je.WIN_W, n)
s2c = rng.integers(0, 5, (n, je.L_MAX)).astype(np.int8)
b_dev, a_dev = sc.collect_entries(sc.dispatch_entries(
    np.zeros(n, np.int8), ws, ivl, s2c, lens, np.zeros(n, np.int8)))
ref_str = "".join(chars[ref_codes])
for b in range(n):
    a = init_alignment(je.L_MAX, len1 + 16, False, False)
    a.submat = sm
    set_seq1(a, ref_str)
    set_seq2(a, "".join(chars[s2c[b, :lens[b]]]))
    a.sg5 = a.sg3 = True
    a.align_mask[:a.len1] = 0
    a.align_mask[ws[b] + 2 : ws[b] + ivl[b, 0, 1]] = 1
    dpn.solve_sg(a, do_trace=False)
    assert a.best_score == b_dev[b], (b, a.best_score, b_dev[b])
    assert a.aec == a_dev[b] + ws[b], (b, a.aec, a_dev[b] + ws[b])
print("PALLAS_PARITY_OK")
"""


def test_pallas_kernel_vs_scalar_oracle_on_tpu(tmp_path):
    """The production Pallas program on hardware == the exact scalar engine
    (scores AND earliest-tie end columns) on random banded entries."""
    script = tmp_path / "pallas_check.py"
    script.write_text(PALLAS_CHECK)
    r = subprocess.run(
        [sys.executable, str(script)], env=_tpu_env(), capture_output=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert "PALLAS_PARITY_OK" in r.stdout.decode()
