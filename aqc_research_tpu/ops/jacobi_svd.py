"""Batch-vectorized one-sided Jacobi SVD (Brent-Luk round-robin schedule).

Round-2 replacement for the serial eigh in the MPS pair update.  Measured on
the target TPU (benchmarks/probe_decomp_primitives.py): ``jnp.linalg.eigh``
does NOT batch-vectorize (b=10 costs ~10x b=1), while elementwise ops,
reductions, and matmuls batch essentially for free.  One-sided Jacobi is
composed ONLY of such ops — per phase, n/2 disjoint column pairs are
orthogonalized simultaneously by plane rotations, so the whole batch rides
the VPU in parallel.

Algorithm (cf. Brent & Luk 1985; Drmač-Veselić preconditioning omitted —
measured unnecessary at these sizes):

* columns live in two "seat" blocks L | R of n/2 columns each; phase p
  orthogonalizes column pair (L[j], R[j]) for all j at once;
* the round-robin tournament permutation (L[0] fixed, others cycle) visits
  every pair exactly once per sweep of n-1 phases;
* a fixed number of sweeps is used (static shapes; convergence is quadratic
  once nearly orthogonal — DEFAULT_SWEEPS is validated by tests against
  LAPACK on random AND clustered spectra);
* after the sweeps, column norms are the singular values; sorting descending
  and normalizing gives U, S, V^H.

This module is the pure-XLA implementation — the numerical specification
for (and fallback of) the Pallas kernel in ops/pallas_jacobi.py.  It
replaces the role of Aer's C++ truncated SVD in the reference
(/root/reference/aqc_research/mps_operations.py:251-257).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# MAXIMUM sweep budget (the loop is adaptive — it stops as soon as a full
# sweep's largest off-diagonal ratio drops below the dtype's convergence
# floor).  12 covers random AND near-degenerate-cluster f32 spectra; f64
# parity work should pass sweeps>=24 explicitly.  Real MPS pair-update
# matrices typically converge in far fewer sweeps, which the adaptive loop
# harvests automatically (fixed low budgets are unsafe: 4 sweeps produced
# garbage objectives mid-optimization while 6 converged).
DEFAULT_SWEEPS = 12


def _pair_rotation(a, b, c, eps):
    """Rotation diagonalizing the 2x2 Hermitian [[a, c], [conj(c), b]].

    Returns (cs, sn_r, phase) with cs real >= 0, sn_r real, and the complex
    unit ``phase`` = c / |c|; the unitary applied to the column pair is

        A_i' =  cs * A_i - sn_r * conj(phase) * A_j
        A_j' =  sn_r * phase * A_i + cs * A_j

    (the phase is absorbed into column j first, then a real rotation).
    Small |c| (relative to the column norms) yields the identity.
    """
    abs_c = jnp.abs(c)
    active = abs_c > eps * jnp.sqrt(jnp.maximum(a * b, 1e-30))
    safe_c = jnp.where(active, abs_c, 1.0)
    phase = c / safe_c  # c * conj(phase) = |c|
    tau = (b - a) / (2.0 * safe_c)
    # sign(0) must be +1 here: equal column norms (tau = 0) still need the
    # full pi/4 rotation when c != 0 — jnp.sign would freeze such pairs.
    sgn = jnp.where(tau >= 0, 1.0, -1.0)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    cs = 1.0 / jnp.sqrt(1.0 + t * t)
    sn_r = t * cs
    cs = jnp.where(active, cs, 1.0)
    sn_r = jnp.where(active, sn_r, 0.0)
    phase = jnp.where(active, phase, 1.0)
    return cs, sn_r, phase


def _phase_update(al, ar, vl, vr, eps, criterion="relative"):
    """One Brent-Luk phase: orthogonalize all (L[j], R[j]) column pairs.

    ``al, ar``: (..., n, p) column blocks of the working matrix;
    ``vl, vr``: the same column blocks of the accumulated V.
    Returns the updated blocks plus the largest pre-rotation off-diagonal
    residual — the adaptive-sweep convergence measure:

    * ``"relative"``: ``|c| / sqrt(a b)`` — every pair must be orthogonal
      RELATIVE to its own column norms, however tiny those are.
    * ``"entry"``: ``|c| / (s_max * max(|w_i|, |w_j|))`` — mixing is
      converged once its contribution to any reconstructed ENTRY is below
      tol * s_max.  Pairs of about-to-be-truncated junk columns (mutual
      angles O(1), values < eps * s_max) no longer gate convergence —
      measured on real mid-optimization pair matrices they are what forces
      the relative criterion to 10-12 sweeps.  CAVEAT (round-4 measurement):
      for a SMALL KEPT column this permits contamination by a large kept
      direction up to tol*s_max/|w_j| relative, which the diag(1/s) vh
      recovery amplifies back to O(tol*s_max*(s_i/s_j)) reconstruction
      error — a cut inside a high-condition degenerate cluster can see
      ~30x-optimal discarded weight (tests/test_truncation.py).
    * ``"hybrid"``: ``|c| / (s_max * max(min(|w_i|,|w_j|), 32*eps*s_max))``
      — relative-grade orthogonality for every column ABOVE the kernel's
      kill floor (32*eps*s_max, below which directions are zeroed anyway),
      entry-absolute against the floor for killed junk.  Fixes the "entry"
      caveat while keeping the junk-tail exemption that made "entry" fast.
    """
    a = jnp.sum(jnp.abs(al) ** 2, axis=-2)  # (..., p) real
    b = jnp.sum(jnp.abs(ar) ** 2, axis=-2)
    c = jnp.sum(jnp.conj(al) * ar, axis=-2)  # complex

    if criterion == "entry":
        smax2 = jnp.max(
            jnp.maximum(a.real, b.real), axis=-1, keepdims=True
        )
        denom2 = smax2 * jnp.maximum(a.real, b.real)
    elif criterion == "hybrid":
        smax2 = jnp.max(
            jnp.maximum(a.real, b.real), axis=-1, keepdims=True
        )
        floor2 = (32.0 * eps) ** 2 * smax2
        denom2 = smax2 * jnp.maximum(jnp.minimum(a.real, b.real), floor2)
    else:
        denom2 = a.real * b.real
    resid = jnp.max(jnp.abs(c) / jnp.sqrt(jnp.maximum(denom2, 1e-30)))

    cs, sn_r, phase = _pair_rotation(a.real, b.real, c, eps)
    cs = cs[..., None, :].astype(al.dtype)
    sn = (sn_r * phase)[..., None, :].astype(al.dtype)
    sn_c = (sn_r * jnp.conj(phase))[..., None, :].astype(al.dtype)

    new_al = cs * al - sn_c * ar
    new_ar = sn * al + cs * ar
    new_vl = cs * vl - sn_c * vr
    new_vr = sn * vl + cs * vr
    return new_al, new_ar, new_vl, new_vr, resid


def _rotate_seats(l, r):
    """Round-robin tournament seat rotation (L[0] stays fixed):

        L: [l0, l1, ..., l_{p-1}]  ->  [l0, r0, l1, ..., l_{p-2}]
        R: [r0, r1, ..., r_{p-1}]  ->  [r1, ..., r_{p-1}, l_{p-1}]
    """
    new_l = jnp.concatenate(
        [l[..., :, :1], r[..., :, :1], l[..., :, 1:-1]], axis=-1
    )
    new_r = jnp.concatenate([r[..., :, 1:], l[..., :, -1:]], axis=-1)
    return new_l, new_r


@partial(jax.jit, static_argnums=(1, 2))
def jacobi_svd(
    m: jax.Array,
    sweeps: int = DEFAULT_SWEEPS,
    sort: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full SVD of square matrices by one-sided Jacobi; batch-vectorized.

    Args:
        m: (..., n, n) complex or real, n even.
        sweeps: number of full Jacobi sweeps (n-1 phases each).
        sort: sort singular values descending (with matching U, Vh columns).

    Returns:
        (u, s, vh) with m = u @ diag(s) @ vh; u, vh unitary.
    """
    n = m.shape[-1]
    assert m.shape[-2] == n and n % 2 == 0, "square even-sized input expected"
    p = n // 2
    dtype = m.dtype
    rdtype = jnp.finfo(dtype).dtype
    eps = float(jnp.finfo(rdtype).eps)

    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), m.shape)
    al, ar = m[..., :, :p], m[..., :, p:]
    vl, vr = eye[..., :, :p], eye[..., :, p:]

    # Adaptive sweeps (mirrors the Pallas kernel): run full sweeps until the
    # largest pre-rotation off-diagonal residual of a sweep drops below the
    # dtype's convergence floor, bounded by ``sweeps``.  f32 (the production
    # kernel's dtype) uses the ENTRY-ABSOLUTE criterion the kernel uses;
    # f64 keeps the RELATIVE criterion — parity work pins tail singular
    # values to rtol 1e-10, which the entry criterion does not promise.
    is_f32 = rdtype == jnp.dtype(jnp.float32)
    conv_tol = 1e-6 if is_f32 else 1e-13
    from ..config import jacobi_criterion

    criterion = jacobi_criterion() if is_f32 else "relative"

    def one_phase(carry, _):
        al, ar, vl, vr, resid = carry
        al, ar, vl, vr, r = _phase_update(al, ar, vl, vr, eps, criterion)
        al, ar = _rotate_seats(al, ar)
        vl, vr = _rotate_seats(vl, vr)
        return (al, ar, vl, vr, jnp.maximum(resid, r)), None

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < sweeps, resid >= conv_tol)

    def sweep_body(state):
        k, _, al, ar, vl, vr = state
        (al, ar, vl, vr, resid), _ = jax.lax.scan(
            one_phase,
            (al, ar, vl, vr, jnp.zeros((), rdtype)),
            None,
            length=n - 1,
        )
        return (k + 1, resid, al, ar, vl, vr)

    state = (jnp.int32(0), jnp.asarray(jnp.inf, rdtype), al, ar, vl, vr)
    _, _, al, ar, vl, vr = jax.lax.while_loop(sweep_cond, sweep_body, state)

    a = jnp.concatenate([al, ar], axis=-1)
    v = jnp.concatenate([vl, vr], axis=-1)
    s = jnp.linalg.norm(a, axis=-2).astype(rdtype)  # column norms

    if sort:
        order = jnp.argsort(-s, axis=-1)
        s = jnp.take_along_axis(s, order, axis=-1)
        a = jnp.take_along_axis(a, order[..., None, :], axis=-1)
        v = jnp.take_along_axis(v, order[..., None, :], axis=-1)

    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    u = a * inv[..., None, :].astype(dtype)
    vh = jnp.conj(jnp.swapaxes(v, -1, -2))
    return u, s, vh


@partial(jax.jit, static_argnums=(1, 2))
def jacobi_sweeps_used(
    m: jax.Array, sweeps: int = DEFAULT_SWEEPS, criterion: str | None = None
) -> jax.Array:
    """Number of adaptive sweeps the Jacobi loop executes on ``m`` — the
    measurement behind the roofline's FLOP accounting (the Pallas kernel runs
    the identical schedule/tolerance, so this pure-XLA count transfers).

    ``m``: (..., rows, n) — n columns of length rows being orthogonalized
    (square for the plain kernel; the randomized-projection path counts on
    the reduced (n_full, l) problem).  Returns ONE i32 scalar for the whole
    batch: the adaptive loop is a single shared while_loop, so every batch
    element pays the count of the slowest-converging one.  One sweep is n-1
    phases — a full round-robin tour of the n COLUMNS (lane/row count does
    not enter the schedule)."""
    n = m.shape[-1]
    assert n % 2 == 0
    p = n // 2
    dtype = m.dtype
    rdtype = jnp.finfo(dtype).dtype
    eps = float(jnp.finfo(rdtype).eps)
    is_f32 = rdtype == jnp.dtype(jnp.float32)
    conv_tol = 1e-6 if is_f32 else 1e-13
    if criterion is None:  # match what jacobi_svd / the kernel would run
        from ..config import jacobi_criterion

        criterion = jacobi_criterion() if is_f32 else "relative"

    al, ar = m[..., :, :p], m[..., :, p:]

    def one_phase(carry, _):
        al, ar, resid = carry
        al, ar, _, _, r = _phase_update(al, ar, al, ar, eps, criterion)
        al, ar = _rotate_seats(al, ar)
        return (al, ar, jnp.maximum(resid, r)), None

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < sweeps, resid >= conv_tol)

    def sweep_body(state):
        k, _, al, ar = state
        (al, ar, resid), _ = jax.lax.scan(
            one_phase, (al, ar, jnp.zeros((), rdtype)), None, length=n - 1
        )
        return (k + 1, resid, al, ar)

    state = (jnp.int32(0), jnp.asarray(jnp.inf, rdtype), al, ar)
    k, _, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, state)
    return k


@partial(jax.jit, static_argnums=(1, 2))
def jacobi_svd_top_k(
    m: jax.Array, k: int, sweeps: int = DEFAULT_SWEEPS
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k truncated SVD via :func:`jacobi_svd` (the MPS pair-update shape:
    k = chi, n = 2*chi).  Returns (u[..., :, :k], s[..., :k], vh[..., :k, :])."""
    u, s, vh = jacobi_svd(m, sweeps=sweeps, sort=True)
    return u[..., :, :k], s[..., :k], vh[..., :k, :]
