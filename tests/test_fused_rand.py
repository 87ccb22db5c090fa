"""Fused randomized-projection pair update (ops/fused_rand.py).

Parity strategy mirrors tests/test_fused_pair.py: the UNFUSED rand-impl
`_pair_update` (ops/rand_svd.py via XLA theta build) is the numerical
specification — the fused route runs the identical range-finder (same
deterministic Omega draws) and the identical reduced-Jacobi schedule and
truncation rule, so agreement is expected at the f32 accumulation floor,
not merely statistically.  Coverage: random and graded-spectrum tensors,
batch padding, active truncation, boundary lambdas, the engine-level gate
(v_mul_mps with the flag on vs the LAPACK-native reference), and the
RAND_MIN_N fallback guard.

Runs in Pallas interpreter mode on this CPU test backend — identical
numerics to the TPU compile (same convention as the other kernel suites).
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
from aqc_research_tpu.ops import rand_svd
from aqc_research_tpu.ops.fused_rand import fused_rand_pair_update


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


class _RandMinN:
    """Temporarily lowers rand_svd.RAND_MIN_N so small test shapes route
    through the rand / fused-rand paths."""

    def __init__(self, value):
        self.value = value

    def __enter__(self):
        self.saved = rand_svd.RAND_MIN_N
        rand_svd.RAND_MIN_N = self.value
        jax.clear_caches()

    def __exit__(self, *exc):
        rand_svd.RAND_MIN_N = self.saved
        jax.clear_caches()


class TestFusedRandParity(unittest.TestCase):
    """fused_rand_pair_update vs the unfused rand-impl _pair_update."""

    def setUp(self):
        set_svd_impl("rand")
        set_fused_pair(False)  # reference path below must stay unfused
        jax.clear_caches()

    def tearDown(self):
        set_svd_impl(None)
        set_fused_pair(None)
        jax.clear_caches()

    @staticmethod
    def _reconstruct(ll, lr, g1, g2, lam, chi):
        """The physical two-site tensor u diag(lam) vh the factors encode
        (undoes the Vidal gauge scalings) — the quantity the MPS represents.
        Raw factor comparison is over-strict for near-guard-floor junk
        directions (lam ~ 0), whose f32 direction is chaotic between two
        implementations but contributes nothing physically."""
        b = lam.shape[0]
        u = np.asarray(g1) * np.asarray(ll)[:, None, :, None]
        u = u.reshape(b, 2 * chi, chi)
        vh = np.swapaxes(np.asarray(g2) * np.asarray(lr)[:, None, None, :], 1, 2)
        vh = vh.reshape(b, chi, 2 * chi)
        return np.einsum("bik,bk,bkj->bij", u, np.asarray(lam), vh)

    def _check(self, rng, batch, chi, trunc_thr, graded=False, tol=3e-5):
        g1 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        g2 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        ll = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        lc = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        lr = jnp.asarray(_rand_lams(rng, batch, chi, graded))
        g4 = jnp.asarray(_rand_c64(rng, batch, 4, 4))

        with _RandMinN(2 * chi):
            ref = mpsop._pair_update(
                ll, lc, lr, g1, g2, g4, chi, trunc_thr, jnp.complex64,
                jnp.float32,
            )
            got = fused_rand_pair_update(
                ll, lc, lr, g1, g2, g4, chi, trunc_thr, jnp.complex64,
                jnp.float32, 12,
            )
        if not graded:
            # Exact regime: raw factor parity (same Omega draws -> same
            # reduced problem up to f32 op order).
            for name, r, g in zip(("g1", "g2", "lam"), ref, got):
                r, g = np.asarray(r), np.asarray(g)
                scale = max(float(np.max(np.abs(r))), 1e-30)
                np.testing.assert_allclose(
                    g, r, atol=tol * scale, err_msg=f"{name} mismatch"
                )
            return
        # Truncating regime: compare the PHYSICAL two-site tensor and the
        # spectrum (junk directions at the guard floor are chaotic in f32
        # but carry lam ~ 0).
        lam_r, lam_g = np.asarray(ref[2]), np.asarray(got[2])
        scale = max(float(lam_r.max()), 1e-30)
        np.testing.assert_allclose(
            lam_g, lam_r, atol=tol * scale, err_msg="lam mismatch"
        )
        th_r = self._reconstruct(ll, lr, ref[0], ref[1], lam_r, chi)
        th_g = self._reconstruct(ll, lr, got[0], got[1], lam_g, chi)
        scale = max(float(np.abs(th_r).max()), 1e-30)
        np.testing.assert_allclose(
            th_g, th_r, atol=tol * scale, err_msg="theta mismatch"
        )

    def test_random_chi16(self):
        self._check(np.random.default_rng(0), 3, 16, 1e-5)

    def test_random_chi24_batch_padding(self):
        # batch 5 with chunk>1 exercises the pad-to-chunk path of BOTH
        # passes; chi=24 -> l=40 < n=48 exercises a genuine reduction.
        self._check(np.random.default_rng(1), 5, 24, 1e-5)

    def test_single_matrix(self):
        self._check(np.random.default_rng(2), 1, 16, 1e-5)

    def test_active_truncation_graded_spectrum(self):
        # Graded lambdas push tail weight below the threshold: the
        # discarded-weight rule + FULL-weight rescale must agree with the
        # unfused rule (which sees all 2chi singular values' total via
        # ||theta||_F just like the fused route's pass-A reduction).
        # Tolerance budgets the threshold itself: a direction whose tail
        # sits EXACTLY at thr*total legitimately flips keep/drop between
        # two f32 implementations (observed: one 8.5e-4-relative lam), so
        # agreement is asserted to ~2.5x trunc_thr — still pinning the
        # rule/rescale at O(1) while allowing boundary flips.
        self._check(
            np.random.default_rng(3), 4, 16, 1e-3, graded=True, tol=2.5e-3
        )

    def test_boundary_lambdas(self):
        rng = np.random.default_rng(4)
        chi, batch = 16, 2
        g1 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        g2 = jnp.asarray(_rand_c64(rng, batch, 2, chi, chi))
        e0 = np.zeros((batch, chi), np.float32)
        e0[:, 0] = 1.0
        ll = jnp.asarray(e0)
        lc = jnp.asarray(_rand_lams(rng, batch, chi))
        lr = jnp.asarray(e0)
        g4 = jnp.asarray(_rand_c64(rng, batch, 4, 4))
        with _RandMinN(2 * chi):
            ref = mpsop._pair_update(
                ll, lc, lr, g1, g2, g4, chi, 1e-5, jnp.complex64, jnp.float32
            )
            got = fused_rand_pair_update(
                ll, lc, lr, g1, g2, g4, chi, 1e-5, jnp.complex64,
                jnp.float32, 12,
            )
        for name, r, g in zip(("g1", "g2", "lam"), ref, got):
            r, g = np.asarray(r), np.asarray(g)
            scale = max(float(np.max(np.abs(r))), 1e-30)
            np.testing.assert_allclose(
                g, r, atol=3e-5 * scale, err_msg=f"{name} mismatch"
            )


class TestFusedRandEngine(unittest.TestCase):
    """Engine-level gate: svd_impl='rand' + fused_pair on routes the batched
    pair updates through fused_rand, with state parity vs the exact native
    (LAPACK) impl at no-truncation-pressure chi."""

    def setUp(self):
        set_precision("fast")  # fused paths are c64-only by design
        jax.clear_caches()

    def tearDown(self):
        set_fused_pair(None)
        set_svd_impl(None)
        set_precision("high")
        jax.clear_caches()

    def test_full_circuit_state_parity_vs_native(self):
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import (
            make_trotter_like_circuit,
        )
        from aqc_research_tpu.utils import rand_thetas

        n, chi = 6, 16  # rank (<= 16 after 2 layers) fits: exact regime
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, chi)

        set_svd_impl("native")
        jax.clear_caches()
        ref = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))

        with _RandMinN(2 * chi):
            set_svd_impl("rand")
            set_fused_pair(True)
            got = np.asarray(
                mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
            )
        got = got.astype(np.complex128)
        ref = ref.astype(np.complex128)
        err = float(np.max(np.abs(np.abs(got) - np.abs(ref))))
        # Global-phase-insensitive amplitude check first (rand factors may
        # gauge differently) ...
        self.assertLess(err, 5e-5)
        # ... then the physical check: same state up to global phase
        # (f64 accumulation — an f32 overlap rounds to exactly 1.0).
        overlap = float(
            abs(np.vdot(got, ref))
            / (np.linalg.norm(got) * np.linalg.norm(ref))
        )
        self.assertGreater(overlap, 1.0 - 1e-8)

    def test_below_min_n_falls_back_to_plain_jacobi(self):
        # 2*chi < RAND_MIN_N: the fused-rand branch must not fire; result
        # equals the plain (unfused) rand path, which itself falls back to
        # the jacobi kernel — bit-for-bit.
        n, chi = 6, 8
        rng = np.random.default_rng(9)
        mps = mpsop.mps_zero(n, chi)
        gates = _rand_c64(rng, len(range(0, n - 1, 2)), 4, 4)
        q, _ = np.linalg.qr(gates)
        gates = jnp.asarray(q.astype(np.complex64))
        lo = tuple(range(0, n - 1, 2))

        set_svd_impl("rand")
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
