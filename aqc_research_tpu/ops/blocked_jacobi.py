"""Blocked one-sided Jacobi SVD — the MXU-friendly decomposition prototype.

VERDICT r2 item 1(c) asks for one MXU-friendly decomposition measured
against the VPU Jacobi kernel at the MPS pair-update shapes (n = 2chi in
{128, 256}).  This module is that prototype: a BLOCK Brent-Luk one-sided
Jacobi whose expensive work is batched complex matmuls (MXU) instead of
length-n plane rotations (VPU):

* columns are grouped into ``nB = n/nb`` blocks; an outer Brent-Luk
  tournament visits every block pair once per outer sweep;
* per block pair, the 2nb x 2nb Gram of the panel is built by ONE batched
  matmul (MXU), a SMALL one-sided Jacobi solves the subproblem on the Gram
  (VPU, but on length-2nb columns with the batch riding the lane dimension),
  and the resulting 2nb x 2nb unitary is applied to the n-row panel by
  another batched matmul (MXU);
* the right factor V is accumulated through the same panel matmuls, so the
  returned ``vh`` is exactly unitary — no ``diag(1/s) u^H m`` recovery and
  therefore none of the rank-deficiency trap of that recovery
  (ops/pallas_jacobi.py notes).

The trade encoded here (and measured by benchmarks/probe_blocked_jacobi.py):
blocking shortens every rotation from n rows to 2nb rows (factor n/2nb on
the VPU) and moves the panel updates to the MXU, but multiplies the rotation
COUNT — every within-block column pair is re-solved in each of the nB-1
outer phases its block appears in.  Whether that trades profitably depends
on the measured adaptive sweep counts (outer and inner) on real spectra;
this is the prototype's point, not a foregone conclusion.

Replaces nothing by default: selected via ``config.set_svd_impl("blocked")``.
Workload anchor: the truncated SVD Aer's C++ MPS engine performs per
two-qubit gate (/root/reference/aqc_research/mps_operations.py:251-257).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .jacobi_svd import DEFAULT_SWEEPS

# Default column-block width.  2nb = 32 keeps the subproblem in the VPU's
# sweet spot while the panel matmuls (n x 32 @ 32 x 32) batch on the MXU.
DEFAULT_NB = 16


def _inner_jacobi_v(g: jax.Array, sweeps: int) -> jax.Array:
    """Unitary V with ``V^H g V`` ~ diagonal, for a batch of Hermitian PSD
    Grams ``g``: (B, m, m) -> (B, m, m).

    One-sided Jacobi on the COLUMNS of g (for Hermitian PSD g the
    orthogonalizing V is the eigenvector basis), with V accumulated through
    the rotations — always exactly unitary, also for rank-deficient g.

    Layout: the batch is moved to the MINOR-MOST axis so it rides the VPU
    lane dimension — at the prototype's shapes (m = 32, B ~ 10*pB) the
    standard batch-major layout would leave 7/8 of every lane idle.
    """
    m = g.shape[-1]
    assert g.shape[-2] == m and m % 2 == 0
    p = m // 2
    dtype = g.dtype
    rdtype = jnp.finfo(dtype).dtype
    eps = float(jnp.finfo(rdtype).eps)
    conv_tol = 1e-6 if rdtype == jnp.dtype(jnp.float32) else 1e-13

    gt = jnp.moveaxis(g, 0, -1)  # (m, m, B): gt[row, col, b]
    al, ar = gt[:, :p, :], gt[:, p:, :]
    b = gt.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype)[:, :, None], (m, m, b))
    vl, vr = eye[:, :p, :], eye[:, p:, :]

    def rotate_seats(l, r):
        if p == 1:
            return l, r
        new_l = jnp.concatenate([l[:, :1], r[:, :1], l[:, 1:-1]], axis=1)
        new_r = jnp.concatenate([r[:, 1:], l[:, -1:]], axis=1)
        return new_l, new_r

    def one_phase(carry, _):
        al, ar, vl, vr, resid = carry
        aa = jnp.sum(jnp.abs(al) ** 2, axis=0)  # (p, B) real
        bb = jnp.sum(jnp.abs(ar) ** 2, axis=0)
        c = jnp.sum(jnp.conj(al) * ar, axis=0)  # (p, B) complex

        abs_c = jnp.abs(c)
        norm_ab = jnp.sqrt(jnp.maximum(aa * bb, 1e-30))
        resid = jnp.maximum(resid, jnp.max(abs_c / jnp.maximum(norm_ab, 1e-30)))
        active = abs_c > eps * norm_ab
        safe_c = jnp.where(active, abs_c, 1.0)
        phase = c / safe_c
        tau = (bb - aa) / (2.0 * safe_c)
        sgn = jnp.where(tau >= 0, 1.0, -1.0)  # sign(0) must be +1
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        cs = 1.0 / jnp.sqrt(1.0 + t * t)
        sn_r = t * cs
        cs = jnp.where(active, cs, 1.0)[None].astype(dtype)
        sn = (jnp.where(active, sn_r, 0.0) * phase)[None].astype(dtype)
        sn_c = jnp.conj(sn)

        new_al = cs * al - sn_c * ar
        new_ar = sn * al + cs * ar
        new_vl = cs * vl - sn_c * vr
        new_vr = sn * vl + cs * vr
        al, ar = rotate_seats(new_al, new_ar)
        vl, vr = rotate_seats(new_vl, new_vr)
        return (al, ar, vl, vr, resid), None

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < sweeps, resid >= conv_tol)

    def sweep_body(state):
        k, _, al, ar, vl, vr = state
        (al, ar, vl, vr, resid), _ = jax.lax.scan(
            one_phase,
            (al, ar, vl, vr, jnp.zeros((), rdtype)),
            None,
            length=max(m - 1, 1),
        )
        return (k + 1, resid, al, ar, vl, vr)

    state = (jnp.int32(0), jnp.asarray(jnp.inf, rdtype), al, ar, vl, vr)
    _, _, _, _, vl, vr = jax.lax.while_loop(sweep_cond, sweep_body, state)
    return jnp.moveaxis(jnp.concatenate([vl, vr], axis=1), -1, 0)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def blocked_jacobi_svd(
    m: jax.Array,
    nb: int = DEFAULT_NB,
    sweeps: int = DEFAULT_SWEEPS,
    inner_sweeps: int = DEFAULT_SWEEPS,
    sort: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full SVD of square matrices by blocked one-sided Jacobi.

    Args:
        m: (..., n, n) complex or real; n a multiple of 2*nb.
        nb: column-block width (nB = n/nb blocks, nB even >= 2).
        sweeps: max outer block sweeps (adaptive: stops when a full outer
            sweep's largest pre-solve off-diagonal ratio < the dtype tol —
            the SAME convergence measure as ops/jacobi_svd.py, since the
            panel Grams expose exactly the |<w_i,w_j>| / |w_i||w_j| ratios).
        inner_sweeps: max sweeps of each 2nb-sized subproblem solve.
        sort: sort singular values descending.

    Returns:
        (u, s, vh) with m = u @ diag(s) @ vh; vh exactly unitary (V is
        accumulated, not recovered).
    """
    n = m.shape[-1]
    assert m.shape[-2] == n, "square input expected"
    nB = n // nb
    assert n == nB * nb and nB % 2 == 0 and nB >= 2, (n, nb)
    pB = nB // 2
    dtype = m.dtype
    rdtype = jnp.finfo(dtype).dtype
    conv_tol = 1e-6 if rdtype == jnp.dtype(jnp.float32) else 1e-13

    batch_shape = m.shape[:-2]
    w = m.reshape((-1, n, n))
    b = w.shape[0]
    # Seat blocks of columns: (B, n, pB, nb).
    w = w.reshape(b, n, nB, nb)
    wl, wr = w[:, :, :pB], w[:, :, pB:]
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=dtype).reshape(1, n, nB, nb), (b, n, nB, nb)
    )
    vl, vr = eye[:, :, :pB], eye[:, :, pB:]

    def rotate_seats(l, r):
        if pB == 1:
            return l, r
        new_l = jnp.concatenate(
            [l[:, :, :1], r[:, :, :1], l[:, :, 1:-1]], axis=2
        )
        new_r = jnp.concatenate([r[:, :, 1:], l[:, :, -1:]], axis=2)
        return new_l, new_r

    def one_phase(carry, _):
        wl, wr, vl, vr, resid = carry
        pan_w = jnp.concatenate([wl, wr], axis=-1)  # (B, n, pB, 2nb)
        pan_v = jnp.concatenate([vl, vr], axis=-1)

        # Panel Gram on the MXU: (B, pB, 2nb, 2nb).
        g = jnp.einsum("bnpc,bnpd->bpcd", jnp.conj(pan_w), pan_w)

        # Pre-solve convergence measure — identical quantity to the scalar
        # algorithm's |c| / sqrt(a b) over every column pair in the panel.
        d = jnp.real(jnp.diagonal(g, axis1=-2, axis2=-1))
        denom = jnp.sqrt(
            jnp.maximum(d[..., :, None] * d[..., None, :], 1e-30)
        )
        ratio = jnp.abs(g) / denom
        ratio = ratio - ratio * jnp.eye(2 * nb, dtype=rdtype)
        resid = jnp.maximum(resid, jnp.max(ratio))

        v_rot = _inner_jacobi_v(
            g.reshape(-1, 2 * nb, 2 * nb), inner_sweeps
        ).reshape(g.shape)

        # Panel updates on the MXU; V accumulated through the same rotation.
        pan_w = jnp.einsum("bnpc,bpcd->bnpd", pan_w, v_rot)
        pan_v = jnp.einsum("bnpc,bpcd->bnpd", pan_v, v_rot)
        wl, wr = rotate_seats(pan_w[..., :nb], pan_w[..., nb:])
        vl, vr = rotate_seats(pan_v[..., :nb], pan_v[..., nb:])
        return (wl, wr, vl, vr, resid), None

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < sweeps, resid >= conv_tol)

    def sweep_body(state):
        k, _, wl, wr, vl, vr = state
        (wl, wr, vl, vr, resid), _ = jax.lax.scan(
            one_phase,
            (wl, wr, vl, vr, jnp.zeros((), rdtype)),
            None,
            length=max(nB - 1, 1),
        )
        return (k + 1, resid, wl, wr, vl, vr)

    state = (jnp.int32(0), jnp.asarray(jnp.inf, rdtype), wl, wr, vl, vr)
    _, _, wl, wr, vl, vr = jax.lax.while_loop(sweep_cond, sweep_body, state)

    a = jnp.concatenate([wl, wr], axis=2).reshape(b, n, n)
    v = jnp.concatenate([vl, vr], axis=2).reshape(b, n, n)
    s = jnp.linalg.norm(a, axis=-2).astype(rdtype)

    if sort:
        order = jnp.argsort(-s, axis=-1)
        s = jnp.take_along_axis(s, order, axis=-1)
        a = jnp.take_along_axis(a, order[..., None, :], axis=-1)
        v = jnp.take_along_axis(v, order[..., None, :], axis=-1)

    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    u = a * inv[..., None, :].astype(dtype)
    vh = jnp.conj(jnp.swapaxes(v, -1, -2))
    return (
        u.reshape(batch_shape + (n, n)),
        s.reshape(batch_shape + (n,)),
        vh.reshape(batch_shape + (n, n)),
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def blocked_jacobi_svd_top_k(
    m: jax.Array,
    k: int,
    nb: int = DEFAULT_NB,
    sweeps: int = DEFAULT_SWEEPS,
    inner_sweeps: int = DEFAULT_SWEEPS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k truncated SVD via :func:`blocked_jacobi_svd` (the MPS
    pair-update shape: k = chi, n = 2*chi)."""
    u, s, vh = blocked_jacobi_svd(m, nb, sweeps, inner_sweeps, sort=True)
    return u[..., :, :k], s[..., :k], vh[..., :k, :]


@partial(jax.jit, static_argnums=(1, 2, 3))
def blocked_jacobi_sweeps_used(
    m: jax.Array,
    nb: int = DEFAULT_NB,
    sweeps: int = DEFAULT_SWEEPS,
    inner_sweeps: int = DEFAULT_SWEEPS,
) -> jax.Array:
    """Adaptive OUTER block-sweep count the loop executes on ``m`` (shared
    across the batch — the count the whole batch pays), for the probe's
    cost accounting."""
    n = m.shape[-1]
    nB = n // nb
    assert n == nB * nb and nB % 2 == 0 and nB >= 2
    pB = nB // 2
    dtype = m.dtype
    rdtype = jnp.finfo(dtype).dtype
    conv_tol = 1e-6 if rdtype == jnp.dtype(jnp.float32) else 1e-13

    w = m.reshape((-1, n, nB, nb))
    b = w.shape[0]
    wl, wr = w[:, :, :pB], w[:, :, pB:]

    def rotate_seats(l, r):
        if pB == 1:
            return l, r
        new_l = jnp.concatenate(
            [l[:, :, :1], r[:, :, :1], l[:, :, 1:-1]], axis=2
        )
        new_r = jnp.concatenate([r[:, :, 1:], l[:, :, -1:]], axis=2)
        return new_l, new_r

    def one_phase(carry, _):
        wl, wr, resid = carry
        pan_w = jnp.concatenate([wl, wr], axis=-1)
        g = jnp.einsum("bnpc,bnpd->bpcd", jnp.conj(pan_w), pan_w)
        d = jnp.real(jnp.diagonal(g, axis1=-2, axis2=-1))
        denom = jnp.sqrt(jnp.maximum(d[..., :, None] * d[..., None, :], 1e-30))
        ratio = jnp.abs(g) / denom
        ratio = ratio - ratio * jnp.eye(2 * nb, dtype=rdtype)
        resid = jnp.maximum(resid, jnp.max(ratio))
        v_rot = _inner_jacobi_v(
            g.reshape(-1, 2 * nb, 2 * nb), inner_sweeps
        ).reshape(g.shape)
        pan_w = jnp.einsum("bnpc,bpcd->bnpd", pan_w, v_rot)
        wl, wr = rotate_seats(pan_w[..., :nb], pan_w[..., nb:])
        return (wl, wr, resid), None

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < sweeps, resid >= conv_tol)

    def sweep_body(state):
        k, _, wl, wr = state
        (wl, wr, resid), _ = jax.lax.scan(
            one_phase,
            (wl, wr, jnp.zeros((), rdtype)),
            None,
            length=max(nB - 1, 1),
        )
        return (k + 1, resid, wl, wr)

    state = (jnp.int32(0), jnp.asarray(jnp.inf, rdtype), wl, wr)
    k, _, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, state)
    return k
