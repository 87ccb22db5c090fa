"""Batched one-sided Jacobi SVD: pure-XLA spec + Pallas kernel + MPS impl.

The Jacobi pair is the round-2 replacement for the serial eigh in the MPS
pair update (VERDICT #1): ops/jacobi_svd.py is the numerical specification,
ops/pallas_jacobi.py the TPU kernel (interpreter mode on this CPU test
backend — identical numerics).  Coverage mirrors the reference's SVD-parity
strategy (truncated factors vs LAPACK) plus the failure modes found during
integration: clustered spectra, rank deficiency, and the padded MPS pair
matrices whose below-rank noise directions lie INSIDE the true column space.
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp

from aqc_research_tpu.config import set_precision, set_svd_impl
from aqc_research_tpu.ops.jacobi_svd import jacobi_svd, jacobi_svd_top_k
from aqc_research_tpu.ops.pallas_jacobi import (
    jacobi_svd_pallas,
    jacobi_svd_pallas_top_k,
)


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _with_spectrum(rng, n, spectrum):
    """Random matrix with a prescribed singular spectrum."""
    q1, _ = np.linalg.qr(_rand_c(rng, n, n))
    q2, _ = np.linalg.qr(_rand_c(rng, n, n))
    return (q1 * np.asarray(spectrum)[None, :]) @ q2.conj().T


def _best_rank_k(m, k):
    u, s, vh = np.linalg.svd(m)
    return (u[..., :k] * s[..., None, :k]) @ vh[..., :k, :]


class TestJacobiSvdXla(unittest.TestCase):
    """Pure-XLA batched Jacobi vs LAPACK (f64: full parity)."""

    def test_random_batch_f64(self):
        rng = np.random.default_rng(0)
        m = _rand_c(rng, 4, 16, 16)
        u, s, vh = jacobi_svd(jnp.asarray(m), sweeps=24)
        u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
        ss = np.linalg.svd(m, compute_uv=False)
        np.testing.assert_allclose(s, ss, rtol=1e-12, atol=1e-12)
        rec = (u * s[..., None, :]) @ vh
        np.testing.assert_allclose(rec, m, atol=1e-12)
        eye = np.eye(16)
        for x in (u, np.swapaxes(vh.conj(), -1, -2)):
            gram = np.einsum("bji,bjk->bik", x.conj(), x)
            np.testing.assert_allclose(gram, np.broadcast_to(eye, gram.shape), atol=1e-12)

    def test_clustered_spectrum(self):
        """Near-degenerate clusters — the hard case for duplicate rejection
        in svd_top_k (VERDICT weak #7) must be a non-issue for Jacobi."""
        rng = np.random.default_rng(1)
        n = 16
        spec = np.array([3.0, 3.0 - 1e-9, 3.0 - 2e-9, 1.0] + [1e-3] * 4 + [1e-9] * 8)
        m = _with_spectrum(rng, n, spec)
        u, s, vh = jacobi_svd(jnp.asarray(m), sweeps=30)
        np.testing.assert_allclose(np.asarray(s), spec, rtol=1e-10, atol=1e-12)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(vh)
        np.testing.assert_allclose(rec, m, atol=1e-10)

    def test_rank_deficient_padded(self):
        """Zero-padded embedding (the padded-chi MPS layout)."""
        rng = np.random.default_rng(2)
        n, r, k = 16, 3, 8
        m = np.zeros((2, n, n), complex)
        m[:, :r, :r] = _rand_c(rng, 2, r, r)
        u, s, vh = jacobi_svd_top_k(jnp.asarray(m), k, sweeps=24)
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        np.testing.assert_allclose(rec, _best_rank_k(m, k), atol=1e-12)
        self.assertTrue(np.all(np.asarray(s)[:, r:] < 1e-12))


class TestJacobiSvdPallas(unittest.TestCase):
    """Pallas kernel (f32 arithmetic) vs LAPACK, at f32 tolerances."""

    def _check_top_k(self, m, k, tol):
        u, s, vh = jacobi_svd_pallas_top_k(jnp.asarray(m), k)
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        best = _best_rank_k(m, k)
        scale = max(np.max(np.abs(best)), 1e-12)
        self.assertLess(np.max(np.abs(rec - best)) / scale, tol)

    def test_random_full(self):
        rng = np.random.default_rng(3)
        m = _rand_c(rng, 3, 32, 32).astype(np.complex64)
        u, s, vh = jacobi_svd_pallas(jnp.asarray(m))
        ss = np.linalg.svd(m, compute_uv=False)
        np.testing.assert_allclose(np.asarray(s), ss, rtol=2e-5, atol=2e-5)
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        np.testing.assert_allclose(rec, m, atol=2e-5)

    def test_top_k_random(self):
        rng = np.random.default_rng(4)
        self._check_top_k(_rand_c(rng, 2, 32, 32).astype(np.complex64), 16, 5e-5)

    def test_top_k_batch_padding(self):
        """Batch sizes around the kernel's grid chunk (pad path)."""
        rng = np.random.default_rng(5)
        for b in (1, 3, 9):
            self._check_top_k(
                _rand_c(rng, b, 16, 16).astype(np.complex64), 8, 5e-5
            )

    def test_svd_chunk_override_parity(self):
        """config.set_svd_chunk caps the kernel's VMEM chunk (smaller chunks
        pay per-matrix-closer adaptive sweep counts, probe_chunk_schedule);
        the factorization contract must be unchanged under any cap."""
        from aqc_research_tpu.config import set_svd_chunk

        rng = np.random.default_rng(11)
        m = _rand_c(rng, 10, 16, 16).astype(np.complex64)
        ref = jacobi_svd_pallas_top_k(jnp.asarray(m), 8)
        try:
            for cap in (1, 2, 5):
                set_svd_chunk(cap)
                jax.clear_caches()
                self._check_top_k(m, 8, 5e-5)
                got = jacobi_svd_pallas_top_k(jnp.asarray(m), 8)
                np.testing.assert_allclose(
                    np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-5, atol=2e-6
                )
        finally:
            set_svd_chunk(None)
            jax.clear_caches()

    def test_pick_chunk_small_cap_at_large_n(self):
        """n >= 128 caps the grid chunk at _SMALL_CHUNK (default 1): the
        adaptive while_loop is shared per chunk, so small chunks pay
        per-matrix-closer sweep counts — measured +7-17% at 20q chi=64
        over the uncapped VMEM chunk (RESULTS.md).  Small n keeps
        VMEM-derived chunks (chi-growth head phases have uniform low
        counts; splitting is pure overhead)."""
        from aqc_research_tpu.ops.pallas_jacobi import _pick_chunk, _SMALL_CHUNK

        assert _pick_chunk(10, 128) <= _SMALL_CHUNK
        assert _pick_chunk(10, 256) <= _SMALL_CHUNK
        # below the threshold the VMEM rule still applies (16 at n=16)
        assert _pick_chunk(10, 16) > _SMALL_CHUNK

    def test_clustered_spectrum(self):
        rng = np.random.default_rng(6)
        n = 32
        spec = np.concatenate(
            [[2.0, 2.0 - 1e-7, 2.0 - 2e-7], np.full(5, 0.5), np.full(24, 1e-4)]
        )
        m = _with_spectrum(rng, n, spec).astype(np.complex64)
        u, s, vh = jacobi_svd_pallas_top_k(jnp.asarray(m), 16)
        np.testing.assert_allclose(np.asarray(s), spec[:16], rtol=5e-4, atol=5e-6)
        # The truncation cuts INSIDE the 24-fold degenerate 1e-4 cluster:
        # which 8 degenerate directions are kept is arbitrary (for LAPACK
        # too), so comparing factors against LAPACK's particular choice is
        # ill-posed — any two equally good picks differ from each other at
        # the cluster scale.  The well-posed truncation-semantics check is
        # the approximation error TO m.  This point is adversarial for the
        # adaptive entry-absolute stopping criterion: the cut sits at
        # condition s_max/s_cut = 2e4 (production trunc_thr=1e-6 cuts at
        # ~1e3), where the diag(1/s) recovery amplifies residual mixing —
        # measured excess is ~1.4x the optimal discarded weight, pinned
        # here at 1.6x (an unconverged sweep budget fails this by orders
        # of magnitude; the truncation goldens pin production semantics).
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        err = np.linalg.norm(m - rec)
        best_err = np.linalg.norm(m - _best_rank_k(m, 16))
        self.assertLess(err, best_err * 1.6)

    def test_entry_criterion_ignores_junk_tail(self):
        """The round-3 speedup's contract: a matrix whose spectrum has a
        junk tail (values far below s_max, mutual angles O(1) after any
        perturbation) must converge in FEWER adaptive sweeps under the f32
        entry-absolute criterion than under the relative one, with the
        retained factors still accurate vs LAPACK."""
        from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used

        rng = np.random.default_rng(11)
        n, k = 32, 16
        spec = np.concatenate(
            [np.exp(-0.5 * np.arange(16)), np.full(16, 3e-7)]
        )
        m = _with_spectrum(rng, n, spec).astype(np.complex64)
        # decorrelate the tail (the mid-optimization situation)
        m = m + 1e-6 * _rand_c(rng, n, n).astype(np.complex64)
        k_entry = int(jacobi_sweeps_used(jnp.asarray(m), 12, "entry"))
        k_rel = int(jacobi_sweeps_used(jnp.asarray(m), 12, "relative"))
        self.assertLess(k_entry, k_rel)
        u, s, vh = jacobi_svd_pallas_top_k(jnp.asarray(m), k)
        np.testing.assert_allclose(
            np.asarray(s)[:8],
            np.linalg.svd(m, compute_uv=False)[:8],
            rtol=1e-4, atol=1e-6,
        )
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        best = _best_rank_k(m, k)
        self.assertLess(
            np.max(np.abs(rec - best)) / np.max(np.abs(best)), 1e-4
        )

    def test_rank_deficient_noise_directions(self):
        """Regression: rank-2 matrix whose nonzero content lives in two rows
        (a padded MPS pair tensor).  Below-rank f32 rotation residue then
        lies ENTIRELY inside the true 2D column space; without the relative
        noise floor in _jacobi_u_s the vh recovery keeps O(1) garbage."""
        rng = np.random.default_rng(7)
        n, k = 32, 16
        m = np.zeros((n, n), np.complex64)
        m[0, :] = _rand_c(rng, n).astype(np.complex64)
        m[n // 2, :] = _rand_c(rng, n).astype(np.complex64)
        m /= np.linalg.norm(m)
        self._check_top_k(m, k, 5e-5)


class TestMpsJacobiImpl(unittest.TestCase):
    """svd_impl="jacobi" through the MPS engine: state + gradient parity."""

    def _trotter_setup(self, n=4, chi=8):
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.utils import rand_thetas

        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, chi)
        return circ, thetas, ini

    def test_mps_engine_parity_jacobi(self):
        """Full v_mul_mps state parity: jacobi impl vs LAPACK (f32 floor)."""
        from aqc_research_tpu.ops import mps as mpsop

        circ, thetas, ini = self._trotter_setup()
        try:
            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
            set_svd_impl("jacobi")
            jax.clear_caches()
            got = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_gradient_parity_jacobi(self):
        """MPS co-sweep gradient under the jacobi impl vs the gram path:
        VERDICT #1's done-criterion is grad-norm parity <= 1e-5."""
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient

        circ, thetas, _ = self._trotter_setup()
        n = circ.num_qubits
        phi = mpsop.rand_mps_vec(n, num_layers=1, chi_max=8)
        target = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        lvec = mpsop.mps_zero(n, 8)

        grads = {}
        try:
            for impl in ("gram", "jacobi"):
                set_svd_impl(impl)
                jax.clear_caches()
                grads[impl] = np.asarray(
                    fast_dot_gradient(circ, thetas, lvec, target)
                )
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        ref_norm = np.linalg.norm(grads["gram"])
        self.assertGreater(ref_norm, 1e-8)
        rel = abs(np.linalg.norm(grads["jacobi"]) - ref_norm) / ref_norm
        self.assertLess(rel, 1e-5)
        np.testing.assert_allclose(grads["jacobi"], grads["gram"], atol=1e-5)


if __name__ == "__main__":
    unittest.main()
