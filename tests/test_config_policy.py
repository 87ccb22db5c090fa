"""Auto-policy routing contract (config.py): which SVD impl and which fused
route engage by default on each backend class.

Round-4 decision (RESULTS.md, on-chip A/B + 16q jitloop convergence checks):
TPU auto = "rand", routed through the FUSED megakernel at every eligible chi
— the unfused rand route has a TPU-only mid-optimization failure at 16q
chi=64, while fused-rand converges in the jacobi band and is at least as
fast at both production shapes.  These tests pin the policy functions
themselves (pure host logic); the engine-level routing is covered by
tests/test_fused_rand.py and the end-to-end goldens in
tests/test_truncation.py.
"""

from unittest import mock

from aqc_research_tpu import config


def _tpu(value: bool):
    return mock.patch.object(config, "is_tpu", lambda: value)


class TestSvdImplAuto:
    def test_tpu_auto_is_rand(self):
        with _tpu(True):
            assert config.svd_impl() == "rand"

    def test_cpu_auto_is_native(self):
        with _tpu(False):
            assert config.svd_impl() == "native"

    def test_explicit_choice_wins(self):
        config.set_svd_impl("jacobi")
        try:
            with _tpu(True):
                assert config.svd_impl() == "jacobi"
        finally:
            config.set_svd_impl(None)


class TestFusedRouting:
    def test_fused_rand_auto_engages_at_all_production_chis(self):
        with _tpu(True):
            for chi in (8, 16, 64, 128, 256):
                assert config.fused_rand_enabled(chi), chi

    def test_fused_rand_auto_off_below_kernel_minimum(self):
        with _tpu(True):
            assert not config.fused_rand_enabled(4)
            assert not config.fused_rand_enabled(None)

    def test_fused_rand_auto_off_on_cpu(self):
        with _tpu(False):
            assert not config.fused_rand_enabled(64)

    def test_fused_pair_keeps_the_chi96_floor(self):
        # The jacobi-impl fused kernel only pays at large chi (measured:
        # +9.5% at 128, a wash at 64) — its auto floor must NOT follow the
        # rand policy down to chi=8.
        with _tpu(True):
            assert not config.fused_pair_enabled(64)
            assert config.fused_pair_enabled(96)
            assert config.fused_pair_enabled(128)

    def test_explicit_override_gates_both_routes(self):
        config.set_fused_pair(False)
        try:
            with _tpu(True):
                assert not config.fused_rand_enabled(64)
                assert not config.fused_pair_enabled(128)
        finally:
            config.set_fused_pair(None)
        config.set_fused_pair(True)
        try:
            with _tpu(False):
                assert config.fused_rand_enabled(64)
                assert config.fused_pair_enabled(8)
        finally:
            config.set_fused_pair(None)
