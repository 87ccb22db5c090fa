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


# ---------------------------------------------------------------------------
# Fast-gate subset (VERDICT r4 weak #9): the full suite takes 60-90 min on a
# 1-core host, which pushes rounds onto ad-hoc subsets.  Modules whose tests
# are dominated by large compiles / long optimizations are auto-marked
# "slow"; the curated fast gate is
#
#     python -m pytest tests/ -q -n 4 -m "not slow"      (~5-15 min)
#
# and covers every engine/IR/optimizer/driver surface at small shapes; the
# slow set re-verifies the same surfaces at production shapes and the heavy
# parity/golden pins.  Full suite (no -m) remains the merge gate.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_mps",
    "test_mps_fast_dot_gradient",
    "test_mps_chain",
    "test_rand_svd",
    "test_truncation",
    "test_fused_pair",
    "test_fused_rand",
    "test_jacobi_svd",
    "test_blocked_jacobi",
    "test_svd_tpu",
    "test_time_evol",
    "test_jit_asp",
    "test_parallel",
    "test_distributed",
    "test_native",
    "test_collective_model",
    "test_warm_cache",
    "test_bench_robust",
    "test_sketching_drivers",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # Path-derived module name (does not force a module import).
        if item.path is not None and item.path.stem in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
