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
        prior = config._SVD_IMPL  # may be env-derived; restore, don't clear
        config.set_svd_impl("jacobi")
        try:
            with _tpu(True):
                assert config.svd_impl() == "jacobi"
        finally:
            config.set_svd_impl(prior)


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

    def test_tpu_unfused_rand_falls_back_to_jacobi(self):
        # The engine dispatcher must NEVER route the unfused rand SVD on a
        # TPU-like backend (known mid-optimization failure, RESULTS.md
        # round-4): when svd_impl is "rand" and the fused kernel did not
        # take the update, the fallback is the plain jacobi kernel.  Off
        # TPU (or with the probe escape hatch set) unfused rand runs.
        import numpy as np

        from aqc_research_tpu.ops import mps as mps_mod
        from aqc_research_tpu.ops import rand_svd

        rng = np.random.default_rng(0)
        m = (rng.standard_normal((2, 32, 32))
             + 1j * rng.standard_normal((2, 32, 32))).astype(np.complex64)

        prior = config._SVD_IMPL
        config.set_svd_impl("rand")

        def _boom(*a, **k):
            raise AssertionError("unfused rand route taken")

        try:
            with mock.patch.object(rand_svd, "RAND_MIN_N", 32), \
                 mock.patch.object(rand_svd, "rand_svd_top_k", _boom):
                # On "TPU": jacobi fallback — the sentinel must NOT fire.
                # (_truncated_svd does `from ..config import is_tpu` at call
                # time, so patching the config module attribute is enough.)
                with _tpu(True):
                    u, s, vh, mask, total = mps_mod._truncated_svd(m, 16, 1e-6)
                    assert np.asarray(s).shape == (2, 16)
                # Off TPU: the unfused route runs (sentinel fires).
                with _tpu(False):
                    try:
                        mps_mod._truncated_svd(m, 16, 1e-6)
                    except AssertionError as e:
                        assert "unfused rand route taken" in str(e)
                    else:
                        raise AssertionError("unfused rand was not routed off-TPU")
        finally:
            config.set_svd_impl(prior)

    def test_explicit_override_gates_both_routes(self):
        prior = config._FUSED_PAIR  # may be env-derived; restore, don't clear
        config.set_fused_pair(False)
        try:
            with _tpu(True):
                assert not config.fused_rand_enabled(64)
                assert not config.fused_pair_enabled(128)
        finally:
            config.set_fused_pair(prior)
        config.set_fused_pair(True)
        try:
            with _tpu(False):
                assert config.fused_rand_enabled(64)
                assert config.fused_pair_enabled(8)
        finally:
            config.set_fused_pair(prior)


class TestNullsvdMeasurementRoute:
    """The measurement-only pass-through (benchmarks/probe_sweep_budget.py)
    must stay selectable and structurally sound: right shapes, all-keep
    mask, finite factors — it times everything AROUND the decomposition,
    so silently breaking it would corrupt future stage budgets."""

    def test_shapes_mask_and_finiteness(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from aqc_research_tpu.config import svd_impl_override
        from aqc_research_tpu.ops.mps import _truncated_svd

        rng = np.random.default_rng(0)
        m = jnp.asarray(
            rng.standard_normal((3, 16, 16)) + 1j * rng.standard_normal((3, 16, 16))
        )
        with svd_impl_override("nullsvd"):
            u, s, vh, mask, total = jax.jit(
                lambda m: _truncated_svd(m, 8, 1e-6)
            )(m)
        assert u.shape == (3, 16, 8) and s.shape == (3, 8)
        assert vh.shape == (3, 8, 16) and mask.shape == (3, 8)
        assert bool(jnp.all(mask))
        for arr in (u, s, vh, total):
            assert bool(jnp.all(jnp.isfinite(arr).ravel()))
        # total must be the true Frobenius norm (the scale normalization
        # downstream divides by it).
        np.testing.assert_allclose(
            np.asarray(total), np.linalg.norm(np.asarray(m), axis=(1, 2)),
            rtol=1e-12,
        )
