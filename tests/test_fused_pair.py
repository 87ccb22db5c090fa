"""Fused half-layer pair-update Pallas kernel (ops/fused_pair.py).

Parity strategy mirrors the Jacobi-kernel suite (tests/test_jacobi_svd.py):
the unfused `_pair_update` under the "jacobi" impl is the numerical
specification — the fused kernel runs the IDENTICAL sweep schedule and
truncation rule, so agreement is expected at the f32 accumulation floor
(~1e-5 rel), not merely statistically.  Coverage: random and graded-spectrum
pair tensors, batch padding (batch not a multiple of the kernel chunk),
active truncation, boundary lambdas (product-state columns), and the
engine-level gate (apply_pairs_mps / v_mul_mps with the flag on vs off).

Runs in Pallas interpreter mode on this CPU test backend — identical
numerics to the TPU compile (same convention as the plain Jacobi tests).
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp

from aqc_research_tpu.config import (
    set_fused_pair,
    set_precision,
    set_svd_impl,
)
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.ops.fused_pair import fused_pair_update


def _rand_c64(rng, *shape):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)


def _rand_lams(rng, batch, chi, graded=False):
    lam = rng.random((batch, chi)).astype(np.float32) + 0.05
    if graded:
        lam = lam * np.logspace(0, -6, chi, dtype=np.float32)[None, :]
    lam = np.sort(lam, axis=-1)[..., ::-1]
    return lam / np.linalg.norm(lam, axis=-1, keepdims=True)


class TestFusedPairParity(unittest.TestCase):
    """fused_pair_update vs the unfused jacobi-impl _pair_update."""

    def setUp(self):
        set_svd_impl("jacobi")
        set_fused_pair(False)  # reference path below must stay unfused
        jax.clear_caches()

    def tearDown(self):
        set_svd_impl(None)
        set_fused_pair(None)
        jax.clear_caches()

    def _check(self, rng, batch, chi, trunc_thr, graded=False, tol=2e-5):
        g1 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        g2 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        ll = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        lc = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        lr = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        g4 = jnp.asarray(_rand_c64(rng, batch, 4, 4))

        ref = mpsop._pair_update(
            ll, lc, lr, g1, g2, g4, chi, trunc_thr, jnp.complex64, jnp.float32
        )
        got = fused_pair_update(
            ll, lc, lr, g1, g2, g4, chi, trunc_thr, jnp.complex64,
            jnp.float32, 12,
        )
        for name, r, g in zip(("g1", "g2", "lam"), ref, got):
            r, g = np.asarray(r), np.asarray(g)
            scale = max(float(np.max(np.abs(r))), 1e-30)
            np.testing.assert_allclose(
                g, r, atol=tol * scale, err_msg=f"{name} mismatch"
            )

    def test_random_chi8(self):
        self._check(np.random.default_rng(0), 3, 8, 1e-5)

    def test_random_chi16_batch_padding(self):
        # batch 5 with chunk>1 exercises the pad-to-chunk path.
        self._check(np.random.default_rng(1), 5, 16, 1e-5)

    def test_single_matrix(self):
        self._check(np.random.default_rng(2), 1, 16, 1e-5)

    def test_active_truncation_graded_spectrum(self):
        # Graded lambdas push tail weight below the threshold: the
        # discarded-weight rule + rescale must agree with the unfused rule.
        self._check(np.random.default_rng(3), 4, 16, 1e-3, graded=True)

    def test_boundary_lambdas(self):
        # Product-state boundary: lam = e_0 (the apply_pairs_mps edge rows).
        rng = np.random.default_rng(4)
        chi, batch = 8, 2
        g1 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        g2 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        e0 = np.zeros((batch, chi), np.float32)
        e0[:, 0] = 1.0
        ll = jnp.asarray(e0)
        lc = jnp.asarray(_rand_lams(rng, batch, chi))
        lr = jnp.asarray(e0)
        g4 = jnp.asarray(_rand_c64(rng, batch, 4, 4))
        ref = mpsop._pair_update(
            ll, lc, lr, g1, g2, g4, chi, 1e-5, jnp.complex64, jnp.float32
        )
        got = fused_pair_update(
            ll, lc, lr, g1, g2, g4, chi, 1e-5, jnp.complex64, jnp.float32, 12
        )
        for name, r, g in zip(("g1", "g2", "lam"), ref, got):
            r, g = np.asarray(r), np.asarray(g)
            scale = max(float(np.max(np.abs(r))), 1e-30)
            np.testing.assert_allclose(
                g, r, atol=2e-5 * scale, err_msg=f"{name} mismatch"
            )


class TestFusedPairEngine(unittest.TestCase):
    """Engine-level gate: the config flag routes apply_pairs_mps / the full
    circuit sweep through the fused kernel, with state parity vs unfused."""

    def setUp(self):
        set_precision("fast")  # fused path is c64-only by design
        set_svd_impl("jacobi")
        jax.clear_caches()

    def tearDown(self):
        set_fused_pair(None)
        set_svd_impl(None)
        set_precision("high")
        jax.clear_caches()

    def _rand_state(self, n, chi, rng):
        mps = mpsop.mps_zero(n, chi)
        # Entangle: one half-layer of random 2q gates at even bonds.
        gates = _rand_c64(rng, len(range(0, n - 1, 2)), 4, 4)
        q, _ = np.linalg.qr(gates)
        return mps, jnp.asarray(q.astype(np.complex64))

    def test_apply_pairs_parity_incl_boundaries(self):
        n, chi = 6, 8
        rng = np.random.default_rng(7)
        mps, gates = self._rand_state(n, chi, rng)
        lo = tuple(range(0, n - 1, 2))  # includes site 0 and last pair

        set_fused_pair(False)
        jax.clear_caches()
        ref = mpsop.apply_pairs_mps(mps, gates, lo, trunc_thr=1e-5)
        ref_vec = np.asarray(mpsop.mps_to_vector(ref))

        set_fused_pair(True)
        jax.clear_caches()
        got = mpsop.apply_pairs_mps(mps, gates, lo, trunc_thr=1e-5)
        got_vec = np.asarray(mpsop.mps_to_vector(got))

        np.testing.assert_allclose(got_vec, ref_vec, atol=5e-6)

    def test_full_circuit_state_parity(self):
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import (
            make_trotter_like_circuit,
        )
        from aqc_research_tpu.utils import rand_thetas

        n, chi = 6, 8
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, chi)

        set_fused_pair(False)
        jax.clear_caches()
        ref = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
        set_fused_pair(True)
        jax.clear_caches()
        got = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_small_chi_falls_back(self):
        # chi < 8: the fused kernel is ineligible; the flag must be a no-op
        # (exercises the guard, result equals the unfused path bit-for-bit).
        n, chi = 4, 4
        rng = np.random.default_rng(9)
        mps, gates = self._rand_state(n, chi, rng)
        lo = tuple(range(0, n - 1, 2))
        set_fused_pair(False)
        jax.clear_caches()
        ref = np.asarray(
            mpsop.mps_to_vector(mpsop.apply_pairs_mps(mps, gates, lo))
        )
        set_fused_pair(True)
        jax.clear_caches()
        got = np.asarray(
            mpsop.mps_to_vector(mpsop.apply_pairs_mps(mps, gates, lo))
        )
        np.testing.assert_allclose(got, ref, atol=0.0)


if __name__ == "__main__":
    unittest.main()
