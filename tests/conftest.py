"""Test configuration: CPU backend with 8 virtual devices, f64 precision.

Parity / gradient tests need complex128 (<=1e-10 targets, BASELINE.md), which
is slow-emulated on TPU, and the sharding tests need a multi-device mesh that
the single tunneled TPU chip cannot provide.  Both are solved by forcing the
CPU backend with 8 virtual devices BEFORE jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("AQC_TPU_PRECISION", "high")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU via
# the config API, which wins over the plugin's registration.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _seed_numpy():
    """Deterministic NumPy seed per test (reference tests use 0x696969)."""
    np.random.seed(0x696969)
    yield
