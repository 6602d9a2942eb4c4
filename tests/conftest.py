"""Test harness config: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths run everywhere (SURVEY §4: multi-host tests via
xla_force_host_platform_device_count)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend explicitly
# so the virtual 8-device mesh is what every test sees.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# never let tests silently use a developer's running scoring server
os.environ.setdefault("MIA_TPU_SERVER", "0")

import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture
def fixtures_dir() -> str:
    return FIXTURES


@pytest.fixture
def golden_dir() -> str:
    return GOLDEN
