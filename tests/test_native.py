"""Parity of the native C++ MPS kernels vs NumPy/JAX references."""

import numpy as np
import pytest

from aqc_research_tpu.io import native
from aqc_research_tpu.ops import mps as mpsop


class TestNativeSvd:
    @pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 8)])
    def test_svd_reconstruction(self, shape):
        rng = np.random.default_rng(1)
        a = rng.normal(size=shape) + 1j * rng.normal(size=shape)
        u, s, vh = native.svd_c128(a)
        np.testing.assert_allclose(u @ np.diag(s) @ vh, a, atol=1e-10)
        # singular values match NumPy's
        np.testing.assert_allclose(s, np.linalg.svd(a, compute_uv=False), atol=1e-10)
        # descending order, orthonormal columns of U
        assert np.all(np.diff(s) <= 1e-12)
        np.testing.assert_allclose(u.conj().T @ u, np.eye(shape[1]), atol=1e-10)


class TestNativePairUpdate:
    def test_pair_update_vs_jax(self):
        """The native Vidal update matches ops/mps.py::apply_2q_mps."""
        import jax.numpy as jnp

        n, chi = 4, 8
        mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        rng = np.random.default_rng(2)
        # Random unitary 4x4 gate.
        q, _ = np.linalg.qr(rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))

        for site in range(n - 1):
            out_jax = mpsop.apply_2q_mps(mps, jnp.asarray(q), site, trunc_thr=1e-10)
            lam_l = (
                np.asarray(mps.lambdas[site - 1])
                if site > 0
                else np.eye(1, chi, dtype=np.float64)[0]
            )
            lam_r = (
                np.asarray(mps.lambdas[site + 1])
                if site + 2 < n
                else np.eye(1, chi, dtype=np.float64)[0]
            )
            g1n, g2n, lamn = native.mps_pair_update(
                lam_l,
                np.asarray(mps.lambdas[site]),
                lam_r,
                np.asarray(mps.gammas[site]),
                np.asarray(mps.gammas[site + 1]),
                q,
                1e-10,
            )
            np.testing.assert_allclose(
                lamn, np.asarray(out_jax.lambdas[site]), atol=1e-8
            )
            # Gauge freedom makes Gammas non-unique; compare the physical
            # state instead.
            import jax.numpy as jnp2

            native_mps = mpsop.MPS(
                jnp2.asarray(
                    np.stack(
                        [np.asarray(mps.gammas[k]) for k in range(site)]
                        + [g1n, g2n]
                        + [np.asarray(mps.gammas[k]) for k in range(site + 2, n)]
                    )
                ),
                jnp2.asarray(
                    np.stack(
                        [np.asarray(mps.lambdas[k]) for k in range(site)]
                        + [lamn]
                        + [np.asarray(mps.lambdas[k]) for k in range(site + 1, n - 1)]
                    )
                ),
            )
            v_native = np.asarray(mpsop.mps_to_vector(native_mps))
            v_jax = np.asarray(mpsop.mps_to_vector(out_jax))
            np.testing.assert_allclose(v_native, v_jax, atol=1e-8)
