"""Blocked one-sided Jacobi SVD (ops/blocked_jacobi.py) — the MXU-friendly
decomposition prototype of VERDICT r2 item 1(c).

Parity coverage mirrors tests/test_jacobi_svd.py (truncated factors vs
LAPACK, clustered spectra, rank deficiency) plus the property that
motivates the design: the returned vh is EXACTLY unitary (V is accumulated
through the block rotations, never recovered via diag(1/s) u^H m), so the
rank-deficiency noise-direction trap of the recovery path cannot occur.
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp

from aqc_research_tpu.config import set_svd_impl
from aqc_research_tpu.ops.blocked_jacobi import (
    blocked_jacobi_svd,
    blocked_jacobi_svd_top_k,
    blocked_jacobi_sweeps_used,
)


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _with_spectrum(rng, n, spectrum):
    q1, _ = np.linalg.qr(_rand_c(rng, n, n))
    q2, _ = np.linalg.qr(_rand_c(rng, n, n))
    return (q1 * np.asarray(spectrum)[None, :]) @ q2.conj().T


def _best_rank_k(m, k):
    u, s, vh = np.linalg.svd(m)
    return (u[..., :k] * s[..., None, :k]) @ vh[..., :k, :]


class TestBlockedJacobiXla(unittest.TestCase):
    def test_random_batch_f64(self):
        rng = np.random.default_rng(0)
        m = _rand_c(rng, 4, 32, 32)
        u, s, vh = blocked_jacobi_svd(jnp.asarray(m), nb=8, sweeps=24)
        u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
        ss = np.linalg.svd(m, compute_uv=False)
        np.testing.assert_allclose(s, ss, rtol=1e-11, atol=1e-11)
        rec = (u * s[..., None, :]) @ vh
        np.testing.assert_allclose(rec, m, atol=1e-11)
        eye = np.eye(32)
        for x in (u, np.swapaxes(vh.conj(), -1, -2)):
            gram = np.einsum("bji,bjk->bik", x.conj(), x)
            np.testing.assert_allclose(
                gram, np.broadcast_to(eye, gram.shape), atol=1e-11
            )

    def test_clustered_spectrum(self):
        rng = np.random.default_rng(1)
        n = 32
        spec = np.array(
            [3.0, 3.0 - 1e-9, 3.0 - 2e-9, 1.0]
            + [1e-3] * 8
            + [1e-9] * 20
        )
        m = _with_spectrum(rng, n, spec)
        u, s, vh = blocked_jacobi_svd(jnp.asarray(m), nb=8, sweeps=30)
        np.testing.assert_allclose(np.asarray(s), spec, rtol=1e-9, atol=1e-11)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(vh)
        np.testing.assert_allclose(rec, m, atol=1e-9)

    def test_rank_deficient_vh_stays_unitary(self):
        """The prototype's selling point: rank deficiency cannot poison vh
        because V is accumulated, not recovered.  (The Pallas kernel needs a
        noise-floor guard for the same input class.)"""
        rng = np.random.default_rng(7)
        n, k = 32, 16
        m = np.zeros((n, n), np.complex64)
        m[0, :] = _rand_c(rng, n).astype(np.complex64)
        m[n // 2, :] = _rand_c(rng, n).astype(np.complex64)
        m /= np.linalg.norm(m)
        u, s, vh = blocked_jacobi_svd(jnp.asarray(m), nb=8)
        v = np.asarray(vh).conj().T
        np.testing.assert_allclose(v.conj().T @ v, np.eye(n), atol=1e-5)
        rec = np.asarray(u)[:, :k] * np.asarray(s)[None, :k] @ np.asarray(vh)[:k]
        np.testing.assert_allclose(rec, _best_rank_k(m, k), atol=5e-6)

    def test_top_k_f32_default_nb(self):
        """The production pair-update entry shape class (n multiple of 32,
        DEFAULT_NB=16) in f32."""
        rng = np.random.default_rng(3)
        n, k = 64, 32
        spec = np.exp(-0.2 * np.arange(n))
        m = np.stack(
            [_with_spectrum(rng, n, spec) for _ in range(3)]
        ).astype(np.complex64)
        u, s, vh = blocked_jacobi_svd_top_k(jnp.asarray(m), k)
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        best = _best_rank_k(m, k)
        err = np.max(np.abs(rec - best)) / np.max(np.abs(best))
        self.assertLess(err, 1e-4)
        np.testing.assert_allclose(
            np.asarray(s), np.linalg.svd(m, compute_uv=False)[..., :k],
            rtol=5e-4, atol=5e-6,
        )

    def test_adaptive_outer_sweeps(self):
        """Orthogonal-column input converges in one outer sweep; a random
        one needs more (the probe's cost model relies on this counter)."""
        rng = np.random.default_rng(4)
        q, _ = np.linalg.qr(_rand_c(rng, 32, 32))
        k_easy = int(blocked_jacobi_sweeps_used(jnp.asarray(q), nb=8))
        k_hard = int(
            blocked_jacobi_sweeps_used(jnp.asarray(_rand_c(rng, 32, 32)), nb=8)
        )
        self.assertLessEqual(k_easy, 1)
        self.assertGreater(k_hard, 1)


class TestMpsBlockedImpl(unittest.TestCase):
    """svd_impl="blocked" through the MPS engine (chi=32 so the 64-sized
    pair matrices take the blocked path; smaller chi-growth heads fall back
    to the jacobi path by design)."""

    def _trotter_setup(self, n=4, chi=32):
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.utils import rand_thetas

        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, chi)
        return circ, thetas, ini

    def test_truncated_svd_fallback_below_blocking_size(self):
        """svd_impl="blocked" must fall back to the jacobi path for
        matrices below the blocking size (the chi-growth head phases)."""
        import jax.numpy as jnp

        from aqc_research_tpu.ops.mps import _truncated_svd

        rng = np.random.default_rng(9)
        try:
            set_svd_impl("blocked")
            jax.clear_caches()
            for n, chi in ((4, 2), (16, 8), (64, 32)):
                m = jnp.asarray(
                    _rand_c(rng, 3, n, n).astype(np.complex64)
                )
                u, s, vh, mask, total = _truncated_svd(m, chi, 1e-6)
                self.assertEqual(u.shape, (3, n, chi))
                self.assertEqual(s.shape, (3, chi))
                self.assertEqual(vh.shape, (3, chi, n))
                rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
                best = _best_rank_k(np.asarray(m), chi)
                err = np.max(np.abs(rec - best)) / np.max(np.abs(best))
                self.assertLess(err, 1e-3)
        finally:
            set_svd_impl(None)
            jax.clear_caches()

    def test_mps_engine_parity_blocked(self):
        from aqc_research_tpu.ops import mps as mpsop

        circ, thetas, ini = self._trotter_setup()
        try:
            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(
                mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
            )
            set_svd_impl("blocked")
            jax.clear_caches()
            got = np.asarray(
                mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
            )
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        np.testing.assert_allclose(got, ref, atol=5e-6)


if __name__ == "__main__":
    unittest.main()
