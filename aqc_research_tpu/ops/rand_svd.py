"""Randomized-projection truncated SVD: MXU range-finder + reduced Jacobi.

The MPS pair update (ops/mps.py `_pair_update`; the workload Aer's C++
truncated SVD serves in the reference,
/root/reference/aqc_research/mps_operations.py:251-257) decomposes a
(2chi, 2chi) matrix but KEEPS only the top chi singular triplets.  The
production Jacobi kernel (ops/pallas_jacobi.py) orthogonalizes all 2chi
columns — including the chi-sized about-to-be-truncated tail.  This module
shrinks the VPU-bound Jacobi problem with the Halko-Martinsson-Tropp
randomized range-finder, whose heavy ops are batched complex matmuls —
exactly what the MXU does for free at these sizes (orthonormalization is
batched Householder QR — see ``_orth`` for why not CholeskyQR):

    1. sample       Y = A @ Omega                (n x l, l = k + oversample)
    2. power iters  Y <- A (A^H Y), QR between     [sharpen the subspace]
    3. orthobasis   Q = QR(Y).Q                  (n x l isometry)
    4. project      B = Q^H A                    (l x n)
    5. reduced SVD  one-sided Jacobi on B^H      (l columns of length n)
    6. recover      vh = U_M^H ;  u = A vh^H / s (one MXU matmul)

Step 5 reuses the SAME Pallas kernel (`_jacobi_pallas_raw` runs rectangular
working arrays natively): at the 20q chi=64 shape the kernel's work drops
from 64 column pairs x 127 phases to (l=72)/2 = 36 pairs x 71 phases —
0.39x the VPU flops — while steps 1-4 + 6 ride the MXU/batched-cholesky
paths that were measured ~free at these sizes
(benchmarks/probe_decomp_primitives.py).  A second structural win: the
junk tail (singular values < eps * s_max with O(1) mutual angles — the
round-3 convergence-criterion problem) is projected OUT before the kernel
ever sees it.

Accuracy: the kept-subspace error of the HMT sketch is O(s_{l+1}) with
power iterations sharpening the constant — i.e. bounded by the tail the
truncation is ALREADY discarding (l > k).  The factor W = (B^H) V' comes
out of the kernel with orthonormal rows (same residual ~5e-7 as the plain
path); u is recovered by one matmul like the gram path's vh.  f32/c64
production path only — f64 parity work keeps the exact impls.

Selected via ``config.set_svd_impl("rand")`` (env AQC_TPU_SVD_IMPL=rand);
matrices below _RAND_MIN_N fall back to the plain Jacobi kernel (the
chi-growth head phases, where the projection overhead cannot pay).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)

from .jacobi_svd import DEFAULT_SWEEPS
from .pallas_jacobi import _jacobi_pallas_raw, _pick_chunk, _sort_guard_top_k

# l = k + _OVERSAMPLE sampled columns (rounded up to even for the kernel's
# seat pairing).  8 keeps l sublane-tile-aligned at the production shapes
# (chi=64 -> l=72, chi=128 -> l=136) and is the measured round-4 default:
# +5-9% sweeps/s over 16 at both production shapes (20q init 36.17 vs
# 33.09, perturbed 35.68 vs 33.23; 28q perturbed 10.55 vs 10.09 —
# results/r4/batch2.log) with accuracy pinned on real captured matrices
# (leak/sigma parity, RESULTS.md) and the 16q jitloop canary in band
# (2.455e-3 vs jacobi 2.438e-3).  Raise via AQC_TPU_RAND_OVERSAMPLE for
# extra sketch margin (the fixed-key reuse argument scales with it).
_OVERSAMPLE = int(os.environ.get("AQC_TPU_RAND_OVERSAMPLE", "8"))
# Subspace-sharpening power iterations (Y <- A A^H Y with re-orthonormal-
# ization).  1 is the measured-safe default on the graded pair spectra.
_POWER_ITERS = int(os.environ.get("AQC_TPU_RAND_POWER_ITERS", "1"))
# Intermediate stabilization inside the power iteration: "qr" (full
# Householder re-orthonormalization, the HMT textbook form), "lu"
# (partial-pivot LU between the power legs — P@L is a bounded
# unit-lower-trapezoidal basis of the same span, cond ~5 on graded
# spectra vs ~1e6 raw; the scheme scikit-learn's randomized_svd ships as
# its default power_iteration_normalizer — with Householder QR kept for
# the FINAL basis only), "qrlite" (skip ONLY the z-side
# re-orthonormalization — 2 QRs instead of 3 at q=1; the y-side and
# final bases stay Householder), or "colnorm" (column normalization
# only — one cheap reduction instead of a QR; the FINAL basis is always
# Householder).  Measured trade-offs (RESULTS.md "Rand-route stage
# budget" + the round-4 A/B): the 3 QRs are ~95% of the range-finder's
# in-jit cost, so qrlite cuts the middle by ~1/3; its numerical
# exposure is the unstabilized z = A^H y leg, whose squared spectrum
# puts ~eps*(s_max/s_i)^2 relative noise on a boundary direction
# (~6e-2 at the thr=1e-6 keep boundary vs qr's 6e-5).  qrlite is
# DISQUALIFIED as a default: +15-19% sweeps/s on chip but a TPU-only
# 10% grad_norm deviation at the 20q point AND a 16q jitloop collapse
# to fobj=1.0 (results/r4/qrlite2.log) — the unfused-rand failure
# signature.  colnorm is DISQUALIFIED too (jitloop out of band,
# results/r4/rand_ab.log).  lu is SAFE (no squared-spectrum leg; grad
# parity with qr to 5 digits on chip) but a measured WASH: batched
# getrf costs what blocked Householder QR costs on this TPU (0.38 vs
# 0.38 ms at 20q shapes, 1.05 vs 0.92 at 28q — results/r4/lu_ab.log),
# so 2 LUs + 1 QR cannot beat 3 QRs.  "cholqr" (shifted CholeskyQR for
# the intermediate legs only — gram on the MXU + small (l, l) Cholesky
# + blocked triangular solve; the FINAL basis stays Householder) is the
# only variant whose flops leave the VPU: XLA's Householder QR is
# already AT the VPU roofline (~35 MFLOP/matrix incl. Q formation), so
# no same-algorithm kernel can beat it — the MXU is the only headroom.
# Unshifted CholeskyQR NaNs on graded spectra (see _orth's note); the
# shift keeps the gram numerically PD and the pass span-preserving at
# any f32 cond (see _cholqr_stab).  cholqr is DISQUALIFIED as a default
# after TWO on-chip gauntlets (results/r4/cholqr.log, cholqr_v2.log):
# +14-18% sweeps/s at both production shapes, but the 16q chi=64 jitloop
# canary lands OUT OF BAND under both shift keyings (trace-keyed v1:
# fobj 1.8e-2; max-diagonal v2 with unit-scale re-entry: 3.43e-3 vs band
# 2.42-2.46e-3), with a systematic -0.93% grad_norm deviation at both
# 20q evidence points (28q exact; 10q CPU jitloop in band) — the
# shifted pass's keep-boundary attenuation is margin-unsafe exactly
# where it is fast.  The QR-count/implementation lever is hereby CLOSED:
# qrlite (unsafe), colnorm (unsafe), lu (wash), cholqr v1/v2 (unsafe),
# blocked-chol (slower), final-basis cholqr2/3 (wash + unsafe) are all
# measured.  The default stays "qr"; lu is the safe alternate knob.
_INTERMEDIATE = os.environ.get("AQC_TPU_RAND_INTERMEDIATE", "qr")
# Final range-basis orthonormalization: "qr" (Householder — backward-
# stable at any condition, the default) or "cholqrK" for K >= 2 repeated
# shifted-CholeskyQR passes ("cholqr2"/"cholqr3").  Where the INTERMEDIATE
# cholqr knob removes 2 of the 3 Householder QRs at q=1, this removes the
# LAST one, making the whole range-finder MXU-resident.  The numerical
# exposure is different from the intermediates': the final basis Q enters
# the projection B = Q^H A, so any residual non-orthonormality of Q
# distorts the reduced problem's singular values (and with them the
# keep/drop boundary).  One shifted pass bounds the output condition at
# ~1/sqrt(shift) (see _cholqr_stab); each further pass squares down the
# deviation, so cholqr2 lands ~eps*cond(pass1-output)^2 and cholqr3 is
# eps-class orthonormal for any input the shift admits.  MEASURED A WASH
# on chip (results/r4/cholqr_prim_chip.log): cholqr2 0.252 vs qr 0.279 ms
# at b=10 n=128 l=72 and 1.22 vs 1.20 at n=256 l=144 — two gram+chol+
# trisolve passes cost what one Householder QR costs, so removing the
# final QR buys ~1% of the route at 20q and nothing at 28q.  AND UNSAFE:
# BOTH cholqr2 and cholqr3 pass the point-probe parity tests (graded+junk
# sigma/discarded-weight, tests/test_rand_svd.py) yet COLLAPSE the 10q
# chi=16 CPU jitloop to fobj=1.0 (the qrlite/unfused failure signature),
# while the same jitloop with the cholqr INTERMEDIATE + Householder final
# stays in band (7.80e-4) — final-basis distortion at the keep boundary
# is a mid-optimization hazard no point probe sees.  Experiment-only
# knob; the default keeps Householder.
_FINAL = os.environ.get("AQC_TPU_RAND_FINAL", "qr")
# Below this matrix size the projection overhead cannot pay; the dispatcher
# (ops/mps._truncated_svd) falls back to the plain Jacobi kernel.
RAND_MIN_N = int(os.environ.get("AQC_TPU_RAND_MIN_N", "128"))

def _orth(y: jax.Array) -> jax.Array:
    """Batched orthonormal basis of the columns of ``y`` (..., n, l).

    Householder QR (batches well on this backend, unlike eigh —
    benchmarks/probe_decomp_primitives.py).  NOT CholeskyQR: the sample
    matrix's condition is ~s_max/s_l of the pair matrix — up to ~1e7 on
    production graded spectra — and the Gram squares it past f32
    (measured: cholesky NaNs at graded rate 0.15).  Householder is
    backward-stable at any condition; rank-deficient trailing columns come
    out as arbitrary-but-orthonormal directions, which merely sample extra
    subspace (the reduced SVD sorts the weight out afterwards).
    """
    return jnp.linalg.qr(y, mode="reduced")[0]


def _lu_stab(y: jax.Array) -> jax.Array:
    """P @ L of the partial-pivot LU of ``y`` (..., n, l): a bounded
    unit-lower-trapezoidal matrix with span(P L) = span(y).

    Cheaper than Householder QR (no orthogonal factor is formed) while
    avoiding the squared-spectrum column collapse of an unstabilized power
    leg: L's entries are <= 1 with a unit diagonal, so the re-scaled basis
    has O(1) condition regardless of y's grading.  This is exactly
    scikit-learn randomized_svd's default ``power_iteration_normalizer``
    ("LU"); only the FINAL range basis needs a real QR.
    """
    n, ell = y.shape[-2], y.shape[-1]
    lu, _, perm = jax.lax.linalg.lu(y)
    l_fac = jnp.tril(lu, -1)[..., :, :ell] + jnp.eye(n, ell, dtype=lu.dtype)
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(l_fac, inv[..., None].astype(jnp.int32), axis=-2)


# The (l, l) Cholesky implementation inside _cholqr_stab.  XLA's native
# cholesky lowers to a while_loop with dynamic-slice panel updates and was
# measured at ~7% of VPU peak (0.128/0.333 ms at the production shapes —
# ~70% of the whole cholqr pass, results/r4/cholqr.log).  "blocked" is a
# STATIC fully-unrolled right-looking blocked factorization (8-wide
# panels): every slice is compile-time constant, so XLA fuses the panel
# recurrences and runs the trailing updates as plain MXU matmuls — no
# while_loop, no dynamic slices.  The paired blocked forward substitution
# replaces solve_triangular (same trick) so the whole stabilizer becomes
# matmuls + O(l/8) fused vector steps.
# MEASURED NEGATIVE on chip (results/r4/cholqr_prim_chip.log): the
# unrolled panel recurrences compile to scalar-shaped VPU soup that costs
# 2x XLA's potrf (chol 0.276 vs 0.137 ms, full pass 0.343 vs 0.179 at
# b=10 n=128 l=72) — the dynamic-slice while_loop was not the bottleneck
# this toolchain.  Kept as a parity-tested knob; the default stays "xla".
_CHOLQR_CHOL = os.environ.get("AQC_TPU_CHOLQR_CHOL", "xla")
_CHOL_BLOCK = 8


def _tri_inv_block(d: jax.Array) -> jax.Array:
    """Explicit inverse of a batched small lower-triangular block
    (..., m, m), m = _CHOL_BLOCK, by unrolled forward substitution on the
    identity.  m is tiny and static, so this compiles to m fused vector
    steps; conditioning is bounded by the shifted gram's (see
    _cholqr_stab), far inside f32 range."""
    m = d.shape[-1]
    eye = jnp.eye(m, dtype=d.dtype)
    cols = []
    for j in range(m):
        # Solve d @ x = e_j: x[i] = (e_j[i] - sum_{k<i} d[i,k] x[k]) / d[i,i].
        x = [jnp.zeros(d.shape[:-2], d.dtype)] * m
        for i in range(j, m):
            acc = eye[i, j]
            for k in range(j, i):
                acc = acc - d[..., i, k] * x[k]
            x[i] = acc / d[..., i, i]
        cols.append(jnp.stack(x, axis=-1))
    return jnp.stack(cols, axis=-1)


def _chol_blocked(g: jax.Array) -> jax.Array:
    """Batched complex Cholesky of (..., l, l) PD ``g`` with l % 8 == 0,
    right-looking blocked, statically unrolled (see _CHOLQR_CHOL)."""
    m = _CHOL_BLOCK
    ell = g.shape[-1]
    assert ell % m == 0, ell
    nb = ell // m
    a = g
    diag_blocks = []  # (..., m, m) lower-tri factors of each panel
    col_panels = []  # (..., ell - (j+1)*m, m) sub-diagonal column panels
    for j in range(nb):
        d = a[..., :m, :m]
        # Unblocked Cholesky of the (m, m) panel: m static rank-1 steps.
        ld_cols = []
        for k in range(m):
            dk = jnp.sqrt(d[..., k, k].real)
            c = d[..., :, k] / dk.astype(d.dtype)[..., None]
            # Zero above the diagonal (the input's upper part is garbage
            # from previous updates; the factor is lower-triangular).
            c = jnp.where(jnp.arange(m) >= k, c, 0.0)
            ld_cols.append(c)
            d = d - c[..., :, None] * jnp.conj(c)[..., None, :]
        ld = jnp.stack(ld_cols, axis=-1)
        diag_blocks.append(ld)
        if j < nb - 1:
            a21 = a[..., m:, :m]
            # Column panel: C = A21 @ inv(Ld)^H (one MXU matmul).
            inv_ld = _tri_inv_block(ld)
            c_panel = jnp.einsum(
                "...ik,...jk->...ij", a21, jnp.conj(inv_ld)
            )
            col_panels.append(c_panel)
            # Trailing update: A22 -= C @ C^H (MXU).
            a = a[..., m:, m:] - jnp.einsum(
                "...ik,...jk->...ij", c_panel, jnp.conj(c_panel)
            )
    # Assemble L from the static panels.
    rows = []
    for i in range(nb):
        row = []
        for j in range(nb):
            if j > i:
                row.append(
                    jnp.zeros(g.shape[:-2] + (m, m), g.dtype)
                )
            elif j == i:
                row.append(diag_blocks[i])
            else:
                row.append(col_panels[j][..., (i - j - 1) * m : (i - j) * m, :])
        rows.append(jnp.concatenate(row, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def _tri_solve_blocked(l_fac: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``l_fac @ x = b`` (lower-triangular l_fac (..., l, l),
    rhs (..., l, n)), blocked forward substitution, statically unrolled:
    per row block, one accumulated MXU matmul + one small inverse apply."""
    m = _CHOL_BLOCK
    ell = l_fac.shape[-1]
    assert ell % m == 0, ell
    nb = ell // m
    x_blocks = []
    for i in range(nb):
        rhs = b[..., i * m : (i + 1) * m, :]
        if i > 0:
            done = jnp.concatenate(x_blocks, axis=-2)  # (..., i*m, n)
            lrow = l_fac[..., i * m : (i + 1) * m, : i * m]
            rhs = rhs - lrow @ done
        inv_d = _tri_inv_block(
            l_fac[..., i * m : (i + 1) * m, i * m : (i + 1) * m]
        )
        x_blocks.append(inv_d @ rhs)
    return jnp.concatenate(x_blocks, axis=-2)


# Shift scale for the cholqr intermediate: shift = C * eps32 * sqrt(n)
# * max_j G_jj.  The max DIAGONAL (~s_max^2) — NOT tr(G) — keys the
# shift: on flat mid-optimization spectra tr(G) reaches l * s_max^2,
# and a tr-keyed shift attenuated thr=1e-6 keep-boundary directions so
# hard the 16q on-chip jitloop landed fobj=1.8e-2, 7x out of band
# (results/r4/cholqr.log, first gauntlet).  sqrt(n) tracks the
# stochastic rounding noise of the f32 gram accumulation (~sqrt(n) *
# eps * s_max^2 per entry); C = 16 gives ~16x PD margin over it
# independent of spectrum shape.
_CHOLQR_SHIFT = float(os.environ.get("AQC_TPU_CHOLQR_SHIFT", "16.0"))


def _cholqr_stab(y: jax.Array) -> jax.Array:
    """One SHIFTED CholeskyQR pass: Q = normcols(Y L^{-H}),
    L = chol(Y^H Y + s I).

    The MXU-resident stabilizer: the gram and the (right) triangular
    solve are matmul-shaped, and only the small (l, l) Cholesky runs
    sequentially — measured 1.9x cheaper than Householder QR at the
    production shapes (results/r4/cholqr.log).  Span-preserving for any
    f32-representable cond (right-multiplication by an invertible
    factor); the shift keeps the gram numerically PD where the UNSHIFTED
    CholeskyQR NaNs (see _orth's note).  Directions below sqrt(shift)
    come out of the solve attenuated; the closing COLUMN NORMALIZATION
    re-enters them at unit scale — the same contract Householder QR
    gives rank-deficient trailing columns (arbitrary-but-unit
    directions that merely sample extra subspace) — so repeated passes
    cannot compound attenuation into subspace loss (the failure the
    tr-keyed shift produced, see above).  The result is orthonormal for
    the well-separated directions and merely bounded-conditioned inside
    the sqrt(shift) cluster, which is all an INTERMEDIATE power-leg
    stabilization needs; the final range basis stays Householder.  A
    per-matrix finiteness guard falls back to plain column
    normalization on a failed factorization (bounded, always finite),
    so a pathological draw degrades conditioning instead of poisoning
    the sweep.
    """
    n, ell = y.shape[-2], y.shape[-1]
    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    gd = jnp.diagonal(g, axis1=-2, axis2=-1).real
    smax2 = jnp.max(gd, axis=-1)[..., None, None]
    shift = _CHOLQR_SHIFT * _F32_EPS * math.sqrt(n) * smax2
    g_shifted = g + shift.astype(g.dtype) * jnp.eye(ell, dtype=g.dtype)
    yh = jnp.conj(jnp.swapaxes(y, -1, -2))
    if _CHOLQR_CHOL == "blocked" and ell % _CHOL_BLOCK == 0:
        l_fac = _chol_blocked(g_shifted)
        sol = _tri_solve_blocked(l_fac, yh)
    else:
        l_fac = jnp.linalg.cholesky(g_shifted)
        sol = jax.scipy.linalg.solve_triangular(l_fac, yh, lower=True)
    q = jnp.conj(jnp.swapaxes(sol, -1, -2))
    ok = jnp.all(jnp.isfinite(sol.real) & jnp.isfinite(sol.imag),
                 axis=(-2, -1), keepdims=True)
    tiny = jnp.finfo(jnp.float32).tiny
    qn = jnp.sqrt(jnp.sum(jnp.abs(q) ** 2, axis=-2, keepdims=True))
    q = q / jnp.maximum(qn, tiny).astype(q.dtype)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(y) ** 2, axis=-2, keepdims=True))
    fallback = y / jnp.maximum(nrm, tiny).astype(y.dtype)
    return jnp.where(ok, q, fallback)


def _final_basis(y: jax.Array, final: str | None = None) -> jax.Array:
    """The FINAL range-basis orthonormalization (see _FINAL): Householder
    QR by default, or K repeated shifted-CholeskyQR passes ("cholqrK")."""
    fm = _FINAL if final is None else final
    if fm.startswith("cholqr"):
        passes = int(fm[len("cholqr"):] or "2")
        for _ in range(passes):
            y = _cholqr_stab(y)
        return y
    return _orth(y)


def _range_project(
    a: jax.Array,
    ell: int,
    q_iters: int,
    intermediate: str | None = None,
    final: str | None = None,
) -> jax.Array:
    """HMT range-finder + projection: returns B = Q^H A of shape (B, l, n)
    for ``a`` (B, n, n) complex, where Q is an orthonormal basis of the
    sketched (power-iterated) range of A.  Shared by :func:`rand_svd_top_k`
    and the fused_rand pair-update route (ops/fused_rand.py).
    ``intermediate`` overrides the module-level normalizer selection (qr /
    lu / qrlite / colnorm); None reads AQC_TPU_RAND_INTERMEDIATE.
    ``final`` overrides the final-basis selection (qr / cholqrK); None
    reads AQC_TPU_RAND_FINAL."""
    im = _INTERMEDIATE if intermediate is None else intermediate
    b, n = a.shape[0], a.shape[-1]
    # Test matrices are drawn INDEPENDENTLY per batch element (HMT failure
    # bounds are per-draw, so a shared Omega would make any poorly-aligned
    # draw fail systematically across all pair matrices of a half-layer).
    # The key is deliberately FIXED per (n, ell): every call — including
    # every optimizer iteration on the same slowly-evolving pair matrix —
    # reuses the same Omega.  This is a conscious trade: a per-call
    # data-dependent key was tried and breaks cross-implementation parity
    # (the fused/unfused routes build theta with 1-ulp differences, so any
    # bit-exact tag diverges and the routes draw different sketches).  The
    # deterministic-reuse risk (one position keeping a poorly-aligned draw
    # forever) is covered by the oversample margin (l = k + 8 by default;
    # raise AQC_TPU_RAND_OVERSAMPLE for more margin)
    # plus one power iteration, which together drive the worst-case
    # captured-matrix truncation leak ~5 orders below the plain kernel's
    # (benchmarks/probe_rand_real_mats.py); convergence is additionally
    # pinned by the jitloop band checks.  A real Gaussian samples both
    # complex planes of A's row space.
    key = jax.random.PRNGKey(0x5EED ^ (n << 8) ^ ell)
    omega = jax.random.normal(key, (b, n, ell), jnp.float32).astype(a.dtype)

    def _stab(y):
        if im == "colnorm":
            nrm = jnp.sqrt(jnp.sum(jnp.abs(y) ** 2, axis=-2, keepdims=True))
            return y / jnp.maximum(nrm, jnp.finfo(jnp.float32).tiny)
        if im == "lu":
            return _lu_stab(y)
        if im == "cholqr":
            return _cholqr_stab(y)
        return _orth(y)

    y = jnp.einsum("...ij,...jk->...ik", a, omega)
    y = _final_basis(y, final) if q_iters == 0 else _stab(y)
    ah = jnp.conj(jnp.swapaxes(a, -1, -2))
    for i in range(q_iters):
        z = jnp.einsum("...ij,...jk->...ik", ah, y)
        if im != "qrlite":
            z = _stab(z)
        y = jnp.einsum("...ij,...jk->...ik", a, z)
        if i < q_iters - 1:
            y = _stab(y)
        else:
            # The last power leg goes straight into the final-basis
            # orthonormalization (for lu/cholqr intermediates this is what
            # makes them pay: 2 cheap stabilizations + 1 real basis at
            # q=1; for qr mode _final_basis("qr") IS the loop's closing
            # Householder pass, unchanged).
            y = _final_basis(y, final)
    return jnp.einsum("...ji,...jk->...ik", jnp.conj(y), a)  # (B, l, n)


def rand_ell(n: int, k: int, oversample: int | None = None) -> int:
    """The sketch width l = k + oversample, clamped to n and rounded up to
    even (the Jacobi kernel's seats pair the columns)."""
    ell = min(n, k + (_OVERSAMPLE if oversample is None else oversample))
    return ell + ell % 2


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def rand_svd_top_k(
    m: jax.Array,
    k: int,
    sweeps: int = DEFAULT_SWEEPS,
    oversample: int | None = None,
    power_iters: int | None = None,
    intermediate: str | None = None,
    final: str | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k truncated SVD via randomized projection + the reduced Jacobi
    kernel; same contract as
    :func:`aqc_research_tpu.ops.pallas_jacobi.jacobi_svd_pallas_top_k`
    (f32/c64 production path; singular values below the 32*eps relative
    noise floor come back as exact zeros with zeroed factor columns).

    ``m``: (..., n, n) complex64 (or float32), n even.
    """
    n = m.shape[-1]
    assert m.shape[-2] == n and n % 2 == 0
    batch_shape = m.shape[:-2]
    cdtype = m.dtype if jnp.iscomplexobj(m) else jnp.complex64
    a = m.reshape((-1, n, n)).astype(jnp.complex64)
    b = a.shape[0]
    ell = rand_ell(n, k, oversample)
    q_iters = _POWER_ITERS if power_iters is None else power_iters
    bm = _range_project(a, ell, q_iters, intermediate, final)  # (B, l, n)

    # Reduced one-sided Jacobi on M = B^H (n x l): the kernel's transposed
    # working layout (row j = column j of M) is exactly conj(bm) — l rows
    # of full lane width n, l/2 seat pairs, l-1 phases per sweep.
    chunk = _pick_chunk(max(b, 1), ell, rows=n)
    b_pad = -(-b // chunk) * chunk
    m_re = jnp.real(bm).astype(jnp.float32)
    m_im = -jnp.imag(bm).astype(jnp.float32)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        m_re, m_im = jnp.pad(m_re, pad), jnp.pad(m_im, pad)
    w_re, w_im = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
    w_re, w_im = w_re[:b], w_im[:b]

    # Row j of W is (s_j * u_j)^T of M = B^H: s = row norms; the rows of
    # conj(W)/s are U_M^H = Vh_B — the right factor of A, already
    # orthonormal to the kernel's residual (no recovery matmul needed).
    # Sort + noise-direction guard shared with the plain kernel path.
    w, s, inv = _sort_guard_top_k(w_re, w_im, k, cdtype)

    vh = jnp.conj(w) * inv[..., :, None].astype(cdtype)  # (B, k, n)
    # Left factor recovered on the MXU: u = A vh^H diag(1/s) — the mirror
    # of the gram/jacobi paths' vh recovery; zero columns for masked s.
    u = jnp.einsum("...ij,...kj->...ik", a.astype(cdtype), jnp.conj(vh))
    u = u * inv[..., None, :].astype(cdtype)
    return (
        u.reshape(batch_shape + (n, k)),
        s.reshape(batch_shape + (k,)),
        vh.reshape(batch_shape + (k, n)),
    )
