"""Randomized-projection truncated SVD (ops/rand_svd.py).

The "rand" impl shrinks the MPS pair update's Jacobi problem with the HMT
range-finder (the workload of the reference's Aer C++ truncated SVD,
/root/reference/aqc_research/mps_operations.py:251-257).  Coverage mirrors
the Jacobi-kernel suite: truncated-factor quality vs LAPACK on the graded
spectra class real pair matrices live in (production cuts at s_cut/s_max
~ 1e-3 — between the 0.05 and 0.15 decay rates here), the rank-deficiency
noise-direction trap, and the dispatcher's small-matrix fallback.  Runs in
Pallas interpreter mode on the CPU test backend (identical numerics).
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp

from aqc_research_tpu.ops.rand_svd import RAND_MIN_N, rand_ell, rand_svd_top_k


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _graded(rng, batch, n, rate):
    """Graded singular spectra — the real MPS pair-matrix class."""
    spec = np.exp(-rate * np.arange(n))
    out = np.empty((batch, n, n), complex)
    for b in range(batch):
        q1, _ = np.linalg.qr(_rand_c(rng, n, n))
        q2, _ = np.linalg.qr(_rand_c(rng, n, n))
        out[b] = (q1 * spec[None, :]) @ q2.conj().T
    return out


def _best_rank_k(m, k):
    u, s, vh = np.linalg.svd(m)
    return (u[..., :k] * s[..., None, :k]) @ vh[..., :k, :]


class TestRandSvd(unittest.TestCase):
    def _check(self, m_np, k, dw_slack, s_rtol, u_atol=2e-2):
        """Factor contract: near-optimal discarded weight (the quantity the
        MPS truncation commits), accurate kept singular values, orthonormal
        vh rows (they come straight from the kernel), consistent u."""
        m = jnp.asarray(m_np.astype(np.complex64))
        u, s, vh = rand_svd_top_k(m, k)
        u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
        b, n = m_np.shape[0], m_np.shape[-1]
        self.assertEqual(u.shape, (b, n, k))
        self.assertEqual(s.shape, (b, k))
        self.assertEqual(vh.shape, (b, k, n))

        ss = np.linalg.svd(m_np, compute_uv=False)
        # HMT sketch theory bounds kept-sigma error by O(s_{l+1}) — tight
        # for s_j >> s_{l+1}, degrading as s_j approaches the sketch tail.
        # Assert the theory-backed tight tolerance away from the cut and a
        # loose one (5%) for the columns within 3x of the tail level (the
        # MPS contract for those is the near-optimal discarded weight
        # below, not per-sigma accuracy).  At the default oversample=8 the
        # graded(0.05) spectrum puts the last ~3 kept columns in the loose
        # band (measured rel err <= 3.6e-2, results/r4 round-4).
        ell = rand_ell(m_np.shape[-1], k)
        tail_lvl = ss[..., min(ell, m_np.shape[-1] - 1)]
        near_cut = ss[..., :k] < 4.0 * tail_lvl[..., None]
        tol = np.where(near_cut, max(8e-2, s_rtol), s_rtol)
        err = np.abs(s - ss[..., :k]) / np.maximum(np.abs(ss[..., :k]), 1e-12)
        self.assertTrue(
            bool(np.all(err <= tol)),
            f"sigma err {np.max(err / tol):.3f}x of band tolerance",
        )

        best = _best_rank_k(m_np, k)
        rec = (u * s[..., None, :]) @ vh
        dw_opt = np.linalg.norm(m_np - best, axis=(1, 2))
        dw = np.linalg.norm(m_np - rec, axis=(1, 2))
        denom = np.maximum(dw_opt, 1e-6 * np.linalg.norm(m_np, axis=(1, 2)))
        self.assertLess(float(np.max(dw / denom)), dw_slack)

        eye = np.eye(k)
        for i in range(b):
            live = s[i] > 0
            g_vh = vh[i] @ vh[i].conj().T
            np.testing.assert_allclose(
                g_vh[np.ix_(live, live)], eye[np.ix_(live, live)], atol=5e-6
            )
            # u is the recovered factor (one MXU matmul); its orthonormality
            # deviation is bounded by the projection error amplified at the
            # near-cut columns — same order as the plain kernel's recovered
            # vh at the mirrored spectra (see RESULTS.md).
            g_u = u[i].conj().T @ u[i]
            np.testing.assert_allclose(
                g_u[np.ix_(live, live)], eye[np.ix_(live, live)], atol=u_atol
            )

    def test_graded_mid(self):
        # u_atol 5e-2: the recovered u's orthonormality deviation at the
        # near-cut columns scales with the sketch tail error; measured
        # 3.4e-2 worst-element at the default oversample=8 (2e-2 at 16).
        # The MPS-relevant contract — near-optimal discarded weight — stays
        # pinned at 1.02x.
        rng = np.random.default_rng(0)
        self._check(_graded(rng, 3, 128, 0.05), 64, 1.02, 1e-3, u_atol=5e-2)

    def test_graded_steep(self):
        rng = np.random.default_rng(1)
        self._check(_graded(rng, 2, 128, 0.15), 64, 1.02, 1e-3, u_atol=5e-2)

    def test_random_full_rank(self):
        """Flat spectra are the adversarial case for randomized projection:
        the kept/discarded gap is O(1/n) and the sketch attenuates even top
        singular values by a few percent (q=1).  The contract that matters
        for the MPS truncation — near-optimal discarded weight — must still
        hold; production pair matrices are graded, where the tight
        tolerances above apply."""
        rng = np.random.default_rng(2)
        self._check(_rand_c(rng, 2, 128, 128), 64, 1.10, 8e-2, u_atol=8e-2)

    def test_rank_deficient_junk_tail(self):
        """The pallas_jacobi noise-direction trap, via the rand path: below-
        rank directions must come back as exact zeros, not garbage."""
        rng = np.random.default_rng(3)
        n, r, k = 128, 40, 64
        spec = np.concatenate([np.exp(-0.1 * np.arange(r)), np.zeros(n - r)])
        q1, _ = np.linalg.qr(_rand_c(rng, n, n))
        q2, _ = np.linalg.qr(_rand_c(rng, n, n))
        m_np = ((q1 * spec[None, :]) @ q2.conj().T)[None].astype(np.complex64)
        u, s, vh = rand_svd_top_k(jnp.asarray(m_np), k)
        u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
        self.assertTrue(np.all(np.isfinite(u)) and np.all(np.isfinite(vh)))
        # everything below rank is masked to exact zero
        self.assertTrue(np.all(s[0, r:] == 0.0))
        np.testing.assert_allclose(u[0, :, r:], 0.0, atol=0)
        rec = (u * s[..., None, :]) @ vh
        np.testing.assert_allclose(rec, m_np, atol=5e-5)

    def test_power_iter_knob(self):
        """q=2 sharpens kept singular values on slow-decay spectra."""
        rng = np.random.default_rng(4)
        m_np = _graded(rng, 2, 128, 0.02).astype(np.complex64)
        ss = np.linalg.svd(m_np, compute_uv=False)[..., :64]
        _, s1, _ = rand_svd_top_k(jnp.asarray(m_np), 64, 12, None, 1)
        _, s2, _ = rand_svd_top_k(jnp.asarray(m_np), 64, 12, None, 2)
        e1 = np.max(np.abs(np.asarray(s1) - ss) / ss[..., :1])
        e2 = np.max(np.abs(np.asarray(s2) - ss) / ss[..., :1])
        self.assertLess(e2, e1)

    def test_lu_stab_span_and_bound(self):
        """The LU power-iteration normalizer (P@L of the partial-pivot LU;
        scikit-learn randomized_svd's default) must span exactly the input
        columns with an O(1)-conditioned factor, even on the squared-
        spectrum column grading that disqualified the unstabilized (qrlite)
        z-leg."""
        from aqc_research_tpu.ops.rand_svd import _lu_stab

        rng = np.random.default_rng(6)
        n, ell = 64, 24
        y_np = _rand_c(rng, 3, n, ell) * np.logspace(0, -6, ell)[None, None, :]
        y_np = y_np.astype(np.complex64)
        pl = np.asarray(_lu_stab(jnp.asarray(y_np)))
        # bounded unit-trapezoid entries (complex partial pivoting compares
        # |re|+|im|, so true-modulus multipliers reach sqrt(2)), O(1) cond
        self.assertLessEqual(float(np.max(np.abs(pl))), np.sqrt(2.0) + 1e-5)
        self.assertLess(float(np.max(np.linalg.cond(pl))), 50.0)
        # span(P L) contains span(y) down to the graded column scales:
        # project each column of y onto span(PL) and compare PER COLUMN
        q, _ = np.linalg.qr(pl)
        res = y_np - q @ (np.conj(np.swapaxes(q, -1, -2)) @ y_np)
        col = np.linalg.norm(y_np, axis=-2)
        rel = np.linalg.norm(res, axis=-2) / np.maximum(col, 1e-30)
        # columns above the f32 noise floor of the LARGEST column are
        # captured; the 1e-6-scaled tail is allowed f32-level leakage
        big = col > 1e-4 * col.max()
        self.assertLess(float(np.max(rel[big])), 1e-3)

    def test_lu_intermediate_graded_parity(self):
        """rand_svd_top_k(intermediate="lu"/"cholqr") matches the qr
        normalizer's factor contract on the graded+junk production model
        (the mode is selected per-call here; production selects it via
        AQC_TPU_RAND_INTERMEDIATE)."""
        rng = np.random.default_rng(7)
        m_np = _graded(rng, 3, 128, 0.05).astype(np.complex64)
        k = 64
        ss = np.linalg.svd(m_np, compute_uv=False)
        out = {}
        for mode in ("qr", "lu", "cholqr"):
            u, s, vh = rand_svd_top_k(jnp.asarray(m_np), k, 12, None, None, mode)
            u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
            rec = (u * s[..., None, :]) @ vh
            dw = np.linalg.norm(m_np - rec, axis=(1, 2))
            out[mode] = (s, dw)
            # kept sigmas vs LAPACK, away-from-cut tolerance
            err = np.abs(s[..., :32] - ss[..., :32]) / ss[..., :32]
            self.assertLess(float(np.max(err)), 2e-3, mode)
        # discarded weight: lu/cholqr within 5% of the optimal rank-k
        dw_opt = np.linalg.norm(
            m_np - _best_rank_k(m_np, k), axis=(1, 2)
        )
        self.assertLess(float(np.max(out["lu"][1] / dw_opt)), 1.05)
        self.assertLess(float(np.max(out["cholqr"][1] / dw_opt)), 1.05)

    def test_cholqr_stab_span_and_conditioning(self):
        """The shifted-CholeskyQR intermediate stabilizer must (a) stay
        finite on gradings whose squared-spectrum gram exceeds f32 (the
        regime that NaNs UNSHIFTED CholeskyQR), (b) preserve the span of
        the input columns, and (c) bound the output condition so the next
        power leg sees an O(1/sqrt(shift))-conditioned basis."""
        from aqc_research_tpu.ops.rand_svd import _cholqr_stab

        rng = np.random.default_rng(8)
        n, ell = 64, 24
        y_np = _rand_c(rng, 3, n, ell) * np.logspace(0, -6, ell)[None, None, :]
        y_np = y_np.astype(np.complex64)
        q_out = np.asarray(_cholqr_stab(jnp.asarray(y_np)))
        self.assertTrue(np.all(np.isfinite(q_out)))
        # bounded condition: directions below sqrt(shift) come out
        # attenuated (not unit), everything else ~orthonormal
        self.assertLess(float(np.max(np.linalg.cond(q_out))), 1e4)
        # span(Q) contains span(y) down to the graded column scales
        q, _ = np.linalg.qr(q_out)
        res = y_np - q @ (np.conj(np.swapaxes(q, -1, -2)) @ y_np)
        col = np.linalg.norm(y_np, axis=-2)
        rel = np.linalg.norm(res, axis=-2) / np.maximum(col, 1e-30)
        big = col > 1e-4 * col.max()
        self.assertLess(float(np.max(rel[big])), 1e-3)

    def test_final_cholqr_graded_parity(self):
        """rand_svd_top_k(final="cholqr2"/"cholqr3") — the all-MXU
        range-finder with repeated shifted-CholeskyQR in place of the
        FINAL Householder basis — must match qr's factor contract on the
        graded+junk production model (per-call selection here; production
        selects via AQC_TPU_RAND_FINAL)."""
        rng = np.random.default_rng(11)
        m_np = _graded(rng, 3, 128, 0.05).astype(np.complex64)
        k = 64
        ss = np.linalg.svd(m_np, compute_uv=False)
        dw_opt = np.linalg.norm(m_np - _best_rank_k(m_np, k), axis=(1, 2))
        for final in ("cholqr2", "cholqr3"):
            u, s, vh = rand_svd_top_k(
                jnp.asarray(m_np), k, 12, None, None, "cholqr", final
            )
            u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
            err = np.abs(s[..., :32] - ss[..., :32]) / ss[..., :32]
            self.assertLess(float(np.max(err)), 2e-3, final)
            rec = (u * s[..., None, :]) @ vh
            dw = np.linalg.norm(m_np - rec, axis=(1, 2))
            self.assertLess(float(np.max(dw / dw_opt)), 1.05, final)

    def test_final_basis_orthonormality(self):
        """Repeated shifted-CholeskyQR passes must drive the basis toward
        orthonormality (each pass squares the deviation down): on a
        1e3-conditioned graded input — the class the final basis sees
        after one stabilized power leg — cholqr2 must land within 1e-2 of
        orthonormal and cholqr3 within 1e-3 (Householder is eps-class)."""
        from aqc_research_tpu.ops.rand_svd import _final_basis

        rng = np.random.default_rng(12)
        n, ell = 128, 24
        y_np = _rand_c(rng, 3, n, ell) * np.logspace(0, -3, ell)[None, None, :]
        y_np = y_np.astype(np.complex64)
        devs = {}
        for fm in ("qr", "cholqr2", "cholqr3"):
            q = np.asarray(_final_basis(jnp.asarray(y_np), fm))
            gram = np.einsum("bji,bjk->bik", q.conj(), q)
            eye = np.eye(ell)
            devs[fm] = float(np.max(np.abs(gram - eye)))
            # span preserved (the stabilizer contract)
            qq, _ = np.linalg.qr(q)
            res = y_np - qq @ (np.conj(np.swapaxes(qq, -1, -2)) @ y_np)
            col = np.linalg.norm(y_np, axis=-2)
            rel = np.linalg.norm(res, axis=-2) / np.maximum(col, 1e-30)
            big = col > 1e-4 * col.max()
            self.assertLess(float(np.max(rel[big])), 1e-3, fm)
        self.assertLess(devs["qr"], 1e-5)
        self.assertLess(devs["cholqr2"], 1e-2)
        self.assertLess(devs["cholqr3"], 1e-3)

    def test_blocked_chol_matches_xla(self):
        """The static-unrolled blocked Cholesky + blocked trisolve
        (AQC_TPU_CHOLQR_CHOL=blocked) must reproduce XLA's potrf route
        inside _cholqr_stab to f32 accuracy on the graded stabilizer
        input class."""
        from aqc_research_tpu.ops import rand_svd as rs

        rng = np.random.default_rng(13)
        n, ell = 64, 24
        y_np = _rand_c(rng, 3, n, ell) * np.logspace(0, -5, ell)[None, None, :]
        y_np = y_np.astype(np.complex64)
        old = rs._CHOLQR_CHOL
        try:
            rs._CHOLQR_CHOL = "xla"
            q_xla = np.asarray(rs._cholqr_stab(jnp.asarray(y_np)))
            rs._CHOLQR_CHOL = "blocked"
            q_blk = np.asarray(rs._cholqr_stab(jnp.asarray(y_np)))
        finally:
            rs._CHOLQR_CHOL = old
        self.assertTrue(np.all(np.isfinite(q_blk)))
        np.testing.assert_allclose(q_blk, q_xla, atol=5e-4)

    def test_cholqr_nan_guard_falls_back(self):
        """A failed (indefinite) Cholesky must degrade to the bounded
        column-normalization fallback instead of poisoning the sweep: a
        NEGATIVE shift guarantees an indefinite gram, and the guard must
        return finite column-normalized output."""
        from aqc_research_tpu.ops import rand_svd as rs

        rng = np.random.default_rng(9)
        y_np = (_rand_c(rng, 2, 32, 8) * np.logspace(0, -4, 8)[None, None, :]
                ).astype(np.complex64)
        old = rs._CHOLQR_SHIFT
        try:
            rs._CHOLQR_SHIFT = -1.0e6  # force an indefinite shifted gram
            q_out = np.asarray(rs._cholqr_stab(jnp.asarray(y_np)))
        finally:
            rs._CHOLQR_SHIFT = old
        self.assertTrue(np.all(np.isfinite(q_out)))
        # fallback = column-normalized input
        col = np.linalg.norm(q_out, axis=-2)
        np.testing.assert_allclose(col, 1.0, rtol=1e-5)

    def test_dispatcher_rand_and_fallback(self):
        """ops/mps._truncated_svd routes impl="rand" through rand_svd_top_k
        at n >= RAND_MIN_N and falls back to the plain Jacobi kernel below
        (the chi-growth head phases) — both with the truncation-mask
        contract intact."""
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.ops.mps import _truncated_svd

        rng = np.random.default_rng(5)
        self.assertGreaterEqual(RAND_MIN_N, 16)
        try:
            set_svd_impl("rand")
            for n, k in ((128, 64), (16, 8)):  # rand path / fallback path
                m_np = _graded(rng, 2, n, 0.05).astype(np.complex64)
                u, s, vh, mask, total = _truncated_svd(
                    jnp.asarray(m_np), k, 1e-6
                )
                u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
                np.testing.assert_allclose(
                    np.asarray(total),
                    np.linalg.norm(m_np, axis=(1, 2)),
                    rtol=1e-5,
                )
                ss = np.linalg.svd(m_np, compute_uv=False)
                np.testing.assert_allclose(
                    s, ss[..., :k], rtol=2e-3, atol=2e-3 * ss[0, 0]
                )
                self.assertTrue(np.all(np.asarray(mask)[:, 0]))
        finally:
            set_svd_impl(None)


class TestMpsRandImpl(unittest.TestCase):
    """svd_impl="rand" through the MPS engine: state + gradient parity.

    RAND_MIN_N is patched down so the chi=8 (n=16) pair matrices of the
    small test circuit take the randomized-projection path — the same
    trick the sweep-level convergence probe uses
    (benchmarks/run_rand_ab.sh runs the production shapes on TPU)."""

    def _trotter_setup(self, n=4, chi=8):
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.utils import rand_thetas

        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        ini = mpsop.mps_zero(n, chi)
        return circ, thetas, ini

    def _patched(self):
        from unittest import mock

        from aqc_research_tpu.ops import rand_svd

        return mock.patch.object(rand_svd, "RAND_MIN_N", 16)

    def test_mps_engine_parity_rand(self):
        """Full v_mul_mps state parity: rand impl vs LAPACK (f32 floor —
        the rand path computes in c64 regardless of the precision mode)."""
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.ops import mps as mpsop

        circ, thetas, ini = self._trotter_setup()
        try:
            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini)))
            set_svd_impl("rand")
            with self._patched():
                jax.clear_caches()
                got = np.asarray(
                    mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, ini))
                )
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_gradient_parity_rand(self):
        """MPS co-sweep gradient under the rand impl vs the gram path —
        the same contract the jacobi impl is held to (<= 1e-5)."""
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient

        circ, thetas, _ = self._trotter_setup()
        n = circ.num_qubits
        phi = mpsop.rand_mps_vec(n, num_layers=1, chi_max=8)
        target = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        lvec = mpsop.mps_zero(n, 8)

        grads = {}
        try:
            set_svd_impl("gram")
            jax.clear_caches()
            grads["gram"] = np.asarray(
                fast_dot_gradient(circ, thetas, lvec, target)
            )
            set_svd_impl("rand")
            with self._patched():
                jax.clear_caches()
                grads["rand"] = np.asarray(
                    fast_dot_gradient(circ, thetas, lvec, target)
                )
        finally:
            set_svd_impl(None)
            jax.clear_caches()
        ref_norm = np.linalg.norm(grads["gram"])
        self.assertGreater(ref_norm, 1e-8)
        rel = abs(np.linalg.norm(grads["rand"]) - ref_norm) / ref_norm
        self.assertLess(rel, 1e-5)
        np.testing.assert_allclose(grads["rand"], grads["gram"], atol=1e-5)


if __name__ == "__main__":
    unittest.main()
