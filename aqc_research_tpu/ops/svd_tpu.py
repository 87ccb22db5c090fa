"""Complex SVD built from REAL symmetric eigendecomposition.

Some TPU runtimes (the tunneled axon toolchain used here) execute complex
``jnp.linalg.svd`` / ``eigh`` programs that fail lazily at synchronization —
only REAL dense linear algebra is reliable.  This module provides the MPS
engine's truncated SVD on such platforms:

    M (m x n complex)  ->  H = M^H M  ->  E = [[Re H, -Im H], [Im H, Re H]]
    (real symmetric)   ->  real eigh  ->  complex eigenvectors of H
    ->  s = sqrt(eigvals),  V = eigvecs,  U = M V / s.

Every complex eigenvector v = x + i y of H corresponds to the embedded real
eigenvector (x; y) of E (and its partner (-y; x)), so E's spectrum holds each
eigenvalue of H twice.  For degenerate eigenvalues the real basis returned by
eigh mixes the pair subspaces arbitrarily; the candidates are therefore
re-orthonormalized by a masked modified Gram-Schmidt in eigenvalue-descending
order (pure matmuls — TPU-safe), which provably recovers an orthonormal
complex basis because the candidates span each eigenspace.

Accuracy note: going through ``M^H M`` squares the condition number, so
singular values below ~sqrt(eps) * s_max are inaccurate — in f32 that is
~3e-4 relative.  The MPS pair update only KEEPS the largest values (the tail
is truncated), so the kept factors are accurate; this is the documented
trade-off of the ``fast`` precision mode on these runtimes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _complex_mgs(cands: jax.Array, num_steps: int, tol: float):
    """Masked modified Gram-Schmidt over candidate columns (dim, K).

    Processes the first ``num_steps`` columns in order; returns (Q, valid)
    where Q holds orthonormalized columns (zero where dropped) and ``valid``
    marks survivors (residual norm > tol)."""
    dim, K = cands.shape
    q0 = jnp.zeros_like(cands)
    valid0 = jnp.zeros((K,), bool)

    def body(j, carry):
        q, valid = carry
        v = jax.lax.dynamic_slice_in_dim(cands, j, 1, axis=1)[:, 0]
        # Project out ALL previously kept columns (zeros contribute nothing).
        coeffs = jnp.einsum("dk,d->k", jnp.conj(q), v)
        v = v - q @ coeffs
        # Second pass for numerical robustness (classic MGS re-orthogonalize).
        coeffs = jnp.einsum("dk,d->k", jnp.conj(q), v)
        v = v - q @ coeffs
        nrm = jnp.linalg.norm(v)
        keep = nrm > tol
        col = jnp.where(keep, v / jnp.maximum(nrm, 1e-30), jnp.zeros_like(v))
        q = jax.lax.dynamic_update_slice_in_dim(q, col[:, None], j, axis=1)
        valid = valid.at[j].set(keep)
        return q, valid

    return jax.lax.fori_loop(0, num_steps, body, (q0, valid0))


@partial(jax.jit, static_argnums=(1,))
def svd_top_k(m: jax.Array, top_k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-``top_k`` SVD factors of a complex matrix via real eigh.

    Returns (U (rows, k), s (k,) descending, Vh (k, cols)); columns beyond
    the (numerical) rank come back as zeros.
    """
    rows, cols = m.shape
    dtype = m.dtype
    h = jnp.conj(m.T) @ m  # (cols, cols) Hermitian PSD
    a, b = jnp.real(h), jnp.imag(h)
    emb = jnp.block([[a, -b], [b, a]])  # real symmetric (2 cols, 2 cols)
    w, q = jnp.linalg.eigh(emb)  # ascending, REAL — safe on this runtime

    # Candidates in eigenvalue-descending order.
    order = jnp.argsort(-w)
    w_desc = w[order]
    q_desc = q[:, order]
    cand = q_desc[:cols, :] + 1j * q_desc[cols:, :]  # (cols, 2 cols) complex
    cand = cand.astype(dtype)

    # Each complex direction appears twice among the candidates; MGS over the
    # first 2*top_k (+ margin) recovers top_k orthonormal complex vectors.
    num_steps = min(2 * cols, 2 * top_k + 16)
    # Candidates are unit-norm; a duplicate's residual after projecting out
    # its twin is O(eps * cond(M^H M)) — in f32 the squared conditioning
    # pushes that to ~1e-2, so the keep/drop tolerance must be dtype-aware
    # (a too-tight tol keeps duplicates and double-counts singular values).
    tol = 1e-5 if jnp.finfo(w.dtype).bits >= 64 else 5e-2
    q_ortho, valid = _complex_mgs(cand, num_steps, tol)

    # Select the first top_k VALID columns (stable order by candidate index).
    rank_key = jnp.where(valid, jnp.arange(2 * cols), 2 * cols + jnp.arange(2 * cols))
    sel = jnp.argsort(rank_key)[:top_k]
    v = q_ortho[:, sel]  # (cols, k)
    lam = jnp.maximum(w_desc[sel], 0.0)
    s = jnp.sqrt(lam).astype(jnp.real(m).dtype)

    inv_s = jnp.where(s > 1e-30, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    u = (m @ v) * inv_s[None, :].astype(dtype)
    return u, s, jnp.conj(v.T)


@partial(jax.jit, static_argnums=(1,))
def svd_gram_top_k(m: jax.Array, top_k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-``top_k`` SVD factors via NATIVE complex eigh of the Gram matrix.

    One Hermitian eigendecomposition of the smaller Gram side plus matmuls —
    much friendlier to the TPU (matmuls tile onto the MXU; eigh is half the
    work of QDWH-SVD) than ``jnp.linalg.svd``.  Same squared-condition-number
    caveat as :func:`svd_top_k`: singular values below ~sqrt(eps)*s_max lose
    relative accuracy, which only affects directions the pair update is about
    to truncate anyway.

    Returns (U (rows, k), s (k,) descending, Vh (k, cols)); directions beyond
    the numerical rank come back as zeros.
    """
    rows, cols = m.shape
    dtype = m.dtype
    rdtype = jnp.real(m).dtype
    if cols <= rows:
        h = jnp.conj(m.T) @ m  # (cols, cols)
        w, v = jnp.linalg.eigh(h)  # ascending
        v_k = v[:, ::-1][:, :top_k]
        lam = jnp.maximum(w[::-1][:top_k], 0.0)
        s = jnp.sqrt(lam).astype(rdtype)
        inv_s = jnp.where(s > 1e-30, 1.0 / jnp.maximum(s, 1e-30), 0.0)
        u = (m @ v_k) * inv_s[None, :].astype(dtype)
        vh = jnp.conj(v_k.T)
        vh = jnp.where((s > 1e-30)[:, None], vh, 0.0)
    else:
        g = m @ jnp.conj(m.T)  # (rows, rows)
        w, u_full = jnp.linalg.eigh(g)
        u = u_full[:, ::-1][:, :top_k]
        lam = jnp.maximum(w[::-1][:top_k], 0.0)
        s = jnp.sqrt(lam).astype(rdtype)
        inv_s = jnp.where(s > 1e-30, 1.0 / jnp.maximum(s, 1e-30), 0.0)
        vh = inv_s[:, None].astype(dtype) * (jnp.conj(u.T) @ m)
        u = jnp.where((s > 1e-30)[None, :], u, 0.0)
    return u, s, vh
