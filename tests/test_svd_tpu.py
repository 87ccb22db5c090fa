"""Tests of the real-eigh-based complex SVD and the MPS engine running on it."""

import numpy as np
import pytest

from aqc_research_tpu.config import set_eigh_svd, set_svd_impl
from aqc_research_tpu.ops.svd_tpu import svd_gram_top_k, svd_top_k


def _make_matrix(s_values, rng, rows=None, cols=None):
    k = len(s_values)
    rows = rows or k
    cols = cols or k
    u, _ = np.linalg.qr(rng.normal(size=(rows, k)) + 1j * rng.normal(size=(rows, k)))
    v, _ = np.linalg.qr(rng.normal(size=(cols, k)) + 1j * rng.normal(size=(cols, k)))
    return (u * np.asarray(s_values)) @ v.conj().T


class TestSvdTopK:
    def test_random_matrix(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))
        k = 8
        u, s, vh = (np.asarray(x) for x in svd_top_k(m, k))
        s_ref = np.linalg.svd(m, compute_uv=False)[:k]
        np.testing.assert_allclose(s, s_ref, rtol=1e-8)
        # Orthonormality and reconstruction of the top-k subspace.
        np.testing.assert_allclose(u.conj().T @ u, np.eye(k), atol=1e-8)
        np.testing.assert_allclose(vh @ vh.conj().T, np.eye(k), atol=1e-8)
        proj = (u * s) @ vh
        # proj must agree with the best rank-k approximation of m.
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        np.testing.assert_allclose(proj, best, atol=1e-7)

    def test_degenerate_spectrum(self):
        """Repeated singular values — the hard case for the real embedding."""
        rng = np.random.default_rng(1)
        m = _make_matrix([3.0, 3.0, 3.0, 2.0, 2.0, 1.0, 0.5, 1e-9], rng)
        k = 6
        u, s, vh = (np.asarray(x) for x in svd_top_k(m, k))
        np.testing.assert_allclose(s, [3, 3, 3, 2, 2, 1], rtol=1e-7)
        np.testing.assert_allclose(u.conj().T @ u, np.eye(k), atol=1e-7)
        np.testing.assert_allclose(vh @ vh.conj().T, np.eye(k), atol=1e-7)
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        np.testing.assert_allclose((u * s) @ vh, best, atol=1e-6)

    def test_rank_deficient(self):
        rng = np.random.default_rng(2)
        m = _make_matrix([2.0, 1.0, 0.0, 0.0], rng, rows=8, cols=4)
        u, s, vh = (np.asarray(x) for x in svd_top_k(m, 4))
        np.testing.assert_allclose(s[:2], [2, 1], rtol=1e-7)
        assert np.all(s[2:] < 1e-6)
        np.testing.assert_allclose((u * s) @ vh, m, atol=1e-7)


class TestSvdTopKFloat32:
    def test_f32_no_duplicate_directions(self):
        """In f32 the squared conditioning makes duplicate candidates noisy;
        the dtype-aware MGS tolerance must still reject all of them (a kept
        duplicate double-counts a singular value)."""
        rng = np.random.default_rng(6)
        m = (rng.normal(size=(128, 128)) + 1j * rng.normal(size=(128, 128))).astype(
            np.complex64
        )
        k = 64
        u, s, vh = (np.asarray(x) for x in svd_top_k(m, k))
        s_ref = np.linalg.svd(m, compute_uv=False)[:k]
        np.testing.assert_allclose(s, s_ref, rtol=2e-2)
        np.testing.assert_allclose(
            u.conj().T @ u, np.eye(k), atol=2e-2
        )
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        err = np.max(np.abs((u * s) @ vh - best)) / np.max(np.abs(best))
        assert err < 5e-2, err


class TestSvdGramTopK:
    """Gram-matrix complex-eigh truncated SVD (the TPU fast path)."""

    def test_random_matrix(self):
        rng = np.random.default_rng(3)
        m = rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))
        k = 8
        u, s, vh = (np.asarray(x) for x in svd_gram_top_k(m, k))
        np.testing.assert_allclose(s, np.linalg.svd(m, compute_uv=False)[:k], rtol=1e-8)
        np.testing.assert_allclose(u.conj().T @ u, np.eye(k), atol=1e-8)
        np.testing.assert_allclose(vh @ vh.conj().T, np.eye(k), atol=1e-8)
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        np.testing.assert_allclose((u * s) @ vh, best, atol=1e-7)

    @pytest.mark.parametrize("shape", [(12, 6), (6, 12)])
    def test_rectangular(self, shape):
        """Both orientations (the Gram side is chosen as the smaller one)."""
        rng = np.random.default_rng(4)
        m = rng.normal(size=shape) + 1j * rng.normal(size=shape)
        k = 4
        u, s, vh = (np.asarray(x) for x in svd_gram_top_k(m, k))
        np.testing.assert_allclose(s, np.linalg.svd(m, compute_uv=False)[:k], rtol=1e-8)
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        np.testing.assert_allclose((u * s) @ vh, best, atol=1e-7)

    def test_degenerate_and_rank_deficient(self):
        rng = np.random.default_rng(5)
        m = _make_matrix([3.0, 3.0, 2.0, 2.0, 1.0, 0.0, 0.0, 0.0], rng)
        k = 6
        u, s, vh = (np.asarray(x) for x in svd_gram_top_k(m, k))
        np.testing.assert_allclose(s[:5], [3, 3, 2, 2, 1], rtol=1e-6)
        assert np.all(s[5:] < 1e-6)
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :5] * ss[:5]) @ vv[:5]
        np.testing.assert_allclose((u * s) @ vh, best, atol=1e-6)

    def test_f32_pair_update_size(self):
        """f32 at the production pair-update size (the TPU fast path)."""
        rng = np.random.default_rng(7)
        m = (rng.normal(size=(128, 128)) + 1j * rng.normal(size=(128, 128))).astype(
            np.complex64
        )
        k = 64
        u, s, vh = (np.asarray(x) for x in svd_gram_top_k(m, k))
        s_ref = np.linalg.svd(m, compute_uv=False)[:k]
        np.testing.assert_allclose(s, s_ref, rtol=2e-2)
        uu, ss, vv = np.linalg.svd(m)
        best = (uu[:, :k] * ss[:k]) @ vv[:k]
        err = np.max(np.abs((u * s) @ vh - best)) / np.max(np.abs(best))
        assert err < 5e-2, err


class TestMpsWithEighSvd:
    def test_mps_engine_parity(self):
        """The whole MPS stack reproduces its LAPACK-SVD results when forced
        onto the eigh-based SVD (state-level comparison)."""
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.utils import rand_thetas

        n = 4
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, 8)

        import jax

        try:
            set_eigh_svd(False)
            jax.clear_caches()  # the flag is read at trace time
            ref = np.asarray(
                mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
            )
            set_eigh_svd(True)
            jax.clear_caches()
            got = np.asarray(
                mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
            )
        finally:
            set_eigh_svd(None)
            jax.clear_caches()
        np.testing.assert_allclose(got, ref, atol=1e-8)

    def test_mps_engine_parity_gram(self):
        """MPS stack state parity: gram SVD vs LAPACK SVD."""
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.utils import rand_thetas

        import jax

        n = 4
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, 8)
        try:
            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
            set_svd_impl("gram")
            jax.clear_caches()
            got = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        np.testing.assert_allclose(got, ref, atol=1e-8)

    def test_gradient_with_eigh_svd(self):
        """MPS co-sweep gradient parity vs dense under the eigh-based SVD."""
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.ops.gradients import grad_of_dot_product
        from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient
        from aqc_research_tpu.ops.statevector import v_dagger_mul_vec
        from aqc_research_tpu.utils import rand_thetas

        import jax

        n = 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), True)
        thetas = rand_thetas(circ.num_thetas)
        try:
            set_eigh_svd(True)
            jax.clear_caches()  # the flag is read at trace time
            phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=8)
            phi_dense = np.asarray(mpsop.mps_to_vector(phi))
            vh = mpsop.v_dagger_mul_mps(circ, thetas, phi)
            vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
            x = np.zeros(2**n, complex)
            x[0] = 1
            x_mps = mpsop.mps_zero(n, 8)
            g_mps = np.asarray(fast_dot_gradient(circ, thetas, x_mps, vh))
            g_dense = np.asarray(grad_of_dot_product(circ, thetas, x, vh_dense))
        finally:
            set_eigh_svd(None)
            jax.clear_caches()
        assert np.max(np.abs(g_mps - g_dense)) < 1e-7
