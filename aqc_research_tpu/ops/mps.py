"""Matrix-product-state engine (pure JAX, static shapes, jit/scan-friendly).

This module replaces the reference's single biggest native dependency — the
Qiskit Aer C++ MPS simulator that the reference calls through circuit
re-simulation for every gate (``/root/reference/aqc_research/
mps_operations.py:216-371`` and ``mps_dot_objective.py:245-516``).  Here every
MPS operation is an on-device tensor contraction:

* Vidal canonical form ``c_{s1..sn} = Γ_1^{s1} λ_1 Γ_2^{s2} λ_2 ... Γ_n^{sn}``
  — the same (Γ, λ) structure Qiskit Aer emits (mps_operations.py:33), so
  concepts map 1:1.
* **Static shapes**: all bond dimensions are padded to a fixed ``chi_max``;
  truncation keeps shapes constant by masking singular values, so the whole
  engine jits and scans (no dynamic-shape recompilation, XLA-friendly).
* A two-qubit gate costs one pair contraction + one ``(2 chi, 2 chi)`` SVD +
  rank-chi re-split — O(chi^3) on the MXU, versus the reference's full
  circuit re-simulation per gate.
* Truncation semantics: after each two-qubit gate, discard the smallest
  singular values whose cumulative tail norm is ``<= trunc_thr * ||S||`` and
  cap the rank at ``chi_max``; kept values are rescaled to preserve the state
  norm.  ``no_truncation_threshold() = 1e-16`` mirrors the reference default
  (mps_operations.py:30).

Sites are qubits in little-endian order (site j = bit j), matching the rest
of the framework and Qiskit's convention.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.program import GateProgram, gate_matrix
from ..config import complex_dtype

_NO_TRUNCATION_THR = 1e-16


def no_truncation_threshold() -> float:
    """Threshold value that effectively disables truncation."""
    return _NO_TRUNCATION_THR


# -----------------------------------------------------------------------------
# Pair-sharding policy: when set, every batched half-layer pair update in the
# engine (V† objective sweep, layered gradient, forward value sweeps, Trotter
# target evolution) routes through the explicit shard_map engine
# (parallel/mps_sharded.py) — the BASELINE config-5 multi-chip path.
# -----------------------------------------------------------------------------

_PAIR_SHARDING = None  # None or (Mesh, axis_name)


def set_pair_sharding(mesh, axis: str = "tp") -> None:
    """Enables (mesh != None) or disables sharded batched pair updates.

    Clears jit caches: traces taken under a different sharding policy would
    otherwise be silently reused (the policy is read at trace time)."""
    global _PAIR_SHARDING
    _PAIR_SHARDING = None if mesh is None else (mesh, str(axis))
    jax.clear_caches()


def pair_sharding():
    return _PAIR_SHARDING


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MPS:
    """Vidal-form MPS with padded, static bond dimensions.

    Attributes:
        gammas: (n, 2, chi, chi) complex — Γ tensors; unused bond rows/cols
            are zero.  Γ_1 uses left bond 0 only; Γ_n uses right bond 0 only.
        lambdas: (n-1, chi) real — bond singular values, descending, padded
            with zeros.
    """

    gammas: jax.Array
    lambdas: jax.Array

    @property
    def num_sites(self) -> int:
        return self.gammas.shape[0]

    @property
    def chi(self) -> int:
        return self.gammas.shape[-1]

    def tree_flatten(self):
        return (self.gammas, self.lambdas), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _mps_basis_state_jit(bits: Tuple[int, ...], chi_max: int, dtype) -> MPS:
    n = len(bits)
    gammas = jnp.zeros((n, 2, chi_max, chi_max), dtype)
    for q, b in enumerate(bits):
        gammas = gammas.at[q, int(b), 0, 0].set(1.0)
    lambdas = jnp.zeros((max(n - 1, 0), chi_max), jnp.real(gammas).dtype)
    lambdas = lambdas.at[:, 0].set(1.0)
    return MPS(gammas, lambdas)


def mps_zero(num_qubits: int, chi_max: int, dtype=None) -> MPS:
    """|0...0> as an MPS with bond dimension padded to ``chi_max``.

    Built INSIDE jit: eager complex array creation produces lazily-invalid
    buffers on some TPU runtimes (see CLAUDE.md)."""
    dtype = complex_dtype() if dtype is None else dtype
    return _mps_basis_state_jit((0,) * num_qubits, chi_max, dtype)


def mps_basis_state(bits: Tuple[int, ...], chi_max: int, dtype=None) -> MPS:
    """Computational basis state |b_{n-1} ... b_0> as an MPS (bit q = site q)."""
    dtype = complex_dtype() if dtype is None else dtype
    return _mps_basis_state_jit(tuple(int(b) for b in bits), chi_max, dtype)


def check_mps(mps: MPS) -> bool:
    """Structural validation (cf. reference check_mps, mps_operations.py:87-123):
    shapes consistent, lambdas non-negative and descending."""
    if not isinstance(mps, MPS):
        return False
    n, chi = mps.num_sites, mps.chi
    if mps.gammas.shape != (n, 2, chi, chi):
        return False
    if mps.lambdas.shape != (max(n - 1, 0), chi):
        return False
    lam = np.asarray(mps.lambdas)
    if np.any(lam < -1e-12):
        return False
    if np.any(lam[:, :-1] < lam[:, 1:] - 1e-9):
        return False  # expects descending order
    return True


# -----------------------------------------------------------------------------
# Gate application.
# -----------------------------------------------------------------------------


def apply_1q_mps(mps: MPS, gate2x2: jax.Array, site: int) -> MPS:
    """1-qubit gate: Γ_site <- G Γ_site (bond dimensions unchanged)."""
    g = jnp.asarray(gate2x2, mps.gammas.dtype)
    new_gamma = jnp.einsum("ij,jab->iab", g, mps.gammas[site])
    return MPS(mps.gammas.at[site].set(new_gamma), mps.lambdas)


def apply_1q_many(mps: MPS, gates: jax.Array, sites: Tuple[int, ...]) -> MPS:
    """Applies DISTINCT 1-qubit gates at distinct sites in one batched einsum.

    ``gates``: (P, 2, 2); ``sites``: P distinct site indices (static)."""
    idx = np.asarray(sites, dtype=int)
    assert len(set(sites)) == len(sites)
    g = jnp.asarray(gates, mps.gammas.dtype)
    new = jnp.einsum("pij,pjab->piab", g, mps.gammas[idx])
    return MPS(mps.gammas.at[idx].set(new), mps.lambdas)


def _safe_inv(lam: jax.Array, cutoff: float = 1e-12) -> jax.Array:
    scale = jnp.max(lam, axis=-1, keepdims=True)
    # dtype-aware floor: a literal like 1e-300 underflows to 0 in f32,
    # killing the guard in the production (fast-precision) path.
    thr = cutoff * jnp.maximum(scale, jnp.finfo(lam.dtype).tiny)
    return jnp.where(lam > thr, 1.0 / jnp.where(lam > thr, lam, 1.0), 0.0)


def _truncation_mask(s: jax.Array, chi: int, trunc_thr: float):
    """Keep mask for singular values: discard the largest tail whose norm is
    <= trunc_thr * ||S||, and cap the rank at chi.  Batched over leading axes."""
    s2 = s * s
    total = jnp.sqrt(jnp.sum(s2, axis=-1))
    # tail_norm[i] = sqrt(sum_{j >= i} s_j^2)
    tail = jnp.sqrt(jnp.cumsum(s2[..., ::-1], axis=-1)[..., ::-1])
    keep = tail > (trunc_thr * total[..., None])
    idx = jnp.arange(s.shape[-1])
    return jnp.logical_and(keep, idx < chi), total


def apply_2q_mps(
    mps: MPS,
    gate4: jax.Array,
    site: int,
    *,
    trunc_thr: float = _NO_TRUNCATION_THR,
) -> MPS:
    """2-qubit gate on adjacent (site, site+1); ``gate4`` is 4x4 in
    (site, site+1) index order.

    Standard Vidal/TEBD update: contract λΓλΓλ into the pair tensor, apply the
    gate, SVD, truncate by the discarded-weight rule, re-split with safe
    λ-inverses.  One O(chi^3) kernel — the operation the reference delegates
    to Aer's C++ (mps_operations.py:251-257) per full-circuit re-simulation.
    """
    n, chi = mps.num_sites, mps.chi
    assert 0 <= site < n - 1
    dtype = mps.gammas.dtype
    rdtype = mps.lambdas.dtype

    lam_l = mps.lambdas[site - 1] if site > 0 else jnp.zeros(chi, rdtype).at[0].set(1.0)
    lam_c = mps.lambdas[site]
    lam_r = (
        mps.lambdas[site + 1]
        if site + 2 < n
        else jnp.zeros(chi, rdtype).at[0].set(1.0)
    )

    new_g1, new_g2, new_lam = _pair_update(
        lam_l,
        lam_c,
        lam_r,
        mps.gammas[site],
        mps.gammas[site + 1],
        gate4,
        chi,
        trunc_thr,
        dtype,
        rdtype,
    )
    gammas = mps.gammas.at[site].set(new_g1).at[site + 1].set(new_g2)
    lambdas = mps.lambdas.at[site].set(new_lam) if n > 1 else mps.lambdas
    return MPS(gammas, lambdas)


def _truncation_mask_topk(s: jax.Array, total: jax.Array, chi: int, trunc_thr: float):
    """Keep mask given only the top-chi singular values and the full Frobenius
    norm ``total`` of the matrix: discard value i when the tail norm
    (everything from i on, including the unseen remainder) is
    <= trunc_thr * total.  Batched over leading axes.

    NUMERICS (root cause of the round-4 "16q rand failure",
    results/r4/theta_analyze.log): the naive tail ``sqrt(total^2 - head_i)``
    is catastrophic f32 cancellation when the matrix is strongly
    rank-deficient — total^2 and head agree to within the norms' own
    rounding (~16 eps relative), so keep/drop beyond the true rank is a
    rounding COIN FLIP: one sign of the error keeps every slot (phantom
    3e-4-grade tail), the other clamps the subtraction at a REAL direction
    and drops it (a dead bond that zeroes the whole state).  Both failure
    directions were observed on captured production matrices, impl- and
    draw-dependent.  The robust form splits the tail into
      * the SEEN part — small-end cumsum of the known s^2, no cancellation,
        exact to f32 for any magnitude, and
      * the UNSEEN remainder — max(total^2 - sum s^2 - noise, 0) with a
        16*eps*total^2 noise floor (the f32 resolution of the two norm
        computations; pairwise-summed ||m||_F^2 carries ~log2(n)*eps).
    An unseen remainder below ~1.4e-3 * total is therefore treated as
    exactly zero: f32 norms cannot distinguish it from rounding, and any
    genuine mass in that band is already being discarded by the rank cap
    (the mask can only keep SEEN directions), so the discarded weight it
    contributes is unavoidable regardless of the mask."""
    s2 = s * s
    seen_tail = jnp.cumsum(s2[..., ::-1], axis=-1)[..., ::-1]
    head_all = jnp.sum(s2, axis=-1)
    t2 = total * total
    noise = (16.0 * jnp.finfo(s.dtype).eps) * t2
    unseen = jnp.maximum(t2 - head_all - noise, 0.0)
    tail = jnp.sqrt(seen_tail + unseen[..., None])
    return tail > (trunc_thr * total[..., None])


def _truncated_svd(m: jax.Array, chi: int, trunc_thr: float):
    """Top-chi SVD + discarded-weight keep mask, dispatched on the global
    ``svd_impl`` policy.  ``m``: (..., 2chi, 2chi); leading axes are batch.

    Returns (u (..., 2chi, chi), s (..., chi), vh (..., chi, 2chi),
    mask (..., chi) bool, total (...,) Frobenius norm of m).
    """
    from ..config import svd_impl

    impl = svd_impl()
    if impl == "nullsvd":
        # MEASUREMENT-ONLY stand-in (benchmarks/probe_sweep_budget.py):
        # skips the decomposition entirely so a sweep timed under this impl
        # measures everything AROUND the SVD (theta builds, environment
        # contractions, scatter/writeback, dispatch).  u/s/vh are NOT a
        # valid factorization — states computed under "nullsvd" are garbage.
        nb = m.shape[-1]
        u = jnp.broadcast_to(
            jnp.eye(nb, chi, dtype=m.dtype), m.shape[:-2] + (nb, chi)
        )
        vh = m[..., :chi, :]
        s = jnp.sqrt(jnp.sum(jnp.abs(vh) ** 2, axis=-1))
        total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
        mask = jnp.ones(s.shape, bool)
        return u, s, vh, mask, total
    if impl == "native":
        u, s, vh = jnp.linalg.svd(m, full_matrices=False)
        mask, total = _truncation_mask(s, chi, trunc_thr)
        u, s, vh = u[..., :, :chi], s[..., :chi], vh[..., :chi, :]
        mask = mask[..., :chi]
        return u, s, vh, mask, total
    if impl in ("jacobi", "blocked", "rand"):
        # Batched Pallas one-sided Jacobi kernel (ops/pallas_jacobi.py), or
        # the blocked MXU-friendly prototype (ops/blocked_jacobi.py) for
        # matrices large enough to block, or the randomized-projection
        # reduced Jacobi (ops/rand_svd.py) — small matrices (chi-growth
        # heads) fall back to the plain kernel in both variants.
        from ..config import jacobi_sweeps
        from .jacobi_svd import DEFAULT_SWEEPS, jacobi_svd_top_k
        from .pallas_jacobi import jacobi_svd_pallas_top_k, truncation_supported

        if jnp.dtype(m.dtype) == jnp.complex64 and not truncation_supported(
            trunc_thr
        ):
            import warnings

            warnings.warn(
                f"trunc_thr={trunc_thr:g} is finer than the f32 Jacobi "
                f"convergence tolerance resolves (supported: >= 1e-12, or "
                f"<= f32-eps^2 to disable truncation); keep/drop decisions "
                f"near the boundary are unreliable at this threshold",
                stacklevel=3,
            )

        sweeps = jacobi_sweeps() or DEFAULT_SWEEPS
        if impl == "rand":
            import os

            from ..config import is_tpu
            from .rand_svd import RAND_MIN_N, rand_svd_top_k

            # On TPU the UNFUSED rand route has a known mid-optimization
            # failure (RESULTS.md round-4: 16q chi=64 jitloop lands
            # fobj=1.0), so when the fused-rand kernel did not take the
            # pair update (alignment guards, set_fused_pair(False), or a
            # non-_pair_update caller) the SAFE fallback is the plain
            # jacobi kernel below — never unfused rand.  Probes that study
            # the broken route opt in via AQC_TPU_ALLOW_UNFUSED_RAND=1.
            unfused_ok = not is_tpu() or os.environ.get(
                "AQC_TPU_ALLOW_UNFUSED_RAND", ""
            ) == "1"
            if m.shape[-1] >= RAND_MIN_N and unfused_ok:
                u, s, vh = rand_svd_top_k(m, chi, sweeps)
                total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
                mask = _truncation_mask_topk(s, total, chi, trunc_thr)
                return u, s, vh, mask, total
        if impl == "blocked" and m.shape[-1] >= 64 and m.shape[-1] % 32 == 0:
            from .blocked_jacobi import blocked_jacobi_svd_top_k

            u, s, vh = blocked_jacobi_svd_top_k(m, chi, sweeps=sweeps)
            total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
            mask = _truncation_mask_topk(s, total, chi, trunc_thr)
            return u, s, vh, mask, total
        if m.shape[-1] < 8:
            # Tiny χ-growth head matrices: the Pallas kernel's round-robin
            # seat slices are empty below p=4 (and the VPU tile padding
            # dwarfs the work anyway) — the pure-XLA twin handles them.
            u, s, vh = jacobi_svd_top_k(m, chi, sweeps)
        else:
            u, s, vh = jacobi_svd_pallas_top_k(m, chi, sweeps)
        total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
        mask = _truncation_mask_topk(s, total, chi, trunc_thr)
        return u, s, vh, mask, total
    # Top-chi factors without QDWH-SVD: "gram" = native complex eigh of
    # the Gram matrix (MXU-friendly); "embed" = real-embedding eigh + MGS
    # for runtimes where complex decompositions fail (ops/svd_tpu.py).
    from .svd_tpu import svd_gram_top_k, svd_top_k

    top_k = svd_gram_top_k if impl == "gram" else svd_top_k
    if m.ndim > 2:
        batch_shape = m.shape[:-2]
        mb = m.reshape((-1,) + m.shape[-2:])
        u, s, vh = jax.vmap(lambda x: top_k(x, chi))(mb)
        u = u.reshape(batch_shape + u.shape[-2:])
        s = s.reshape(batch_shape + s.shape[-1:])
        vh = vh.reshape(batch_shape + vh.shape[-2:])
    else:
        u, s, vh = top_k(m, chi)  # (2chi, chi), (chi,), (chi, 2chi)
    total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
    mask = _truncation_mask_topk(s, total, chi, trunc_thr)
    return u, s, vh, mask, total


def _pair_theta(lam_l, lam_c, lam_r, g1, g2, gate4, chi, dtype):
    """The gated two-site tensor as a (..., 2chi, 2chi) matrix — the exact
    input of the pair update's truncated SVD (exposed for probes/roofline)."""
    t1 = g1 * lam_l[..., None, :, None].astype(dtype)
    t1 = t1 * lam_c[..., None, None, :].astype(dtype)
    theta = jnp.einsum("...sab,...tbc->...stac", t1, g2)
    theta = theta * lam_r[..., None, None, None, :].astype(dtype)

    g = jnp.asarray(gate4, dtype)
    g = g.reshape(g.shape[:-2] + (2, 2, 2, 2))
    theta = jnp.einsum("...stuv,...uvac->...stac", g, theta)

    batch_shape = theta.shape[:-4]
    return jnp.swapaxes(theta, -3, -2).reshape(batch_shape + (2 * chi, 2 * chi))


def pair_thetas(mps: "MPS", gates4, lo_sites) -> jax.Array:
    """Batched pair-update input matrices for disjoint pairs ``lo_sites`` —
    the (P, 2chi, 2chi) matrices :func:`apply_pairs_mps` decomposes (probe/
    roofline utility; same gather logic)."""
    n, chi = mps.num_sites, mps.chi
    rdtype = mps.lambdas.dtype
    lo = np.asarray(lo_sites, dtype=int)
    boundary = jnp.zeros((1, chi), rdtype).at[0, 0].set(1.0)
    lam_ext = jnp.concatenate([boundary, mps.lambdas, boundary], axis=0)
    return _pair_theta(
        lam_ext[lo], lam_ext[lo + 1], lam_ext[lo + 2],
        mps.gammas[lo], mps.gammas[lo + 1], jnp.asarray(gates4),
        chi, mps.gammas.dtype,
    )


def _pair_update(lam_l, lam_c, lam_r, g1, g2, gate4, chi, trunc_thr, dtype, rdtype):
    """Core Vidal pair update on raw tensors; returns (g1', g2', lam').

    Natively batched: every argument may carry identical leading batch axes
    (``lam_*``: (..., chi), ``g1/g2``: (..., 2, chi, chi), ``gate4``:
    (..., 4, 4)) — one call decomposes the whole batch, which is what lets
    the batched Jacobi kernel amortize a half-layer of pair updates into a
    single Pallas program instead of P serial decompositions.
    """
    from ..config import fused_pair_enabled, fused_rand_enabled, svd_impl

    if (
        fused_pair_enabled(chi)
        and svd_impl() == "jacobi"
        and chi >= 8
        and jnp.dtype(dtype) == jnp.complex64
        and isinstance(trunc_thr, (int, float))
    ):
        # Fused half-layer megakernel: theta build + adaptive Jacobi +
        # truncation + factor recovery in one Pallas program (ops/fused_pair).
        from ..config import jacobi_sweeps
        from .fused_pair import fused_pair_update
        from .jacobi_svd import DEFAULT_SWEEPS

        return fused_pair_update(
            lam_l, lam_c, lam_r, g1, g2, gate4, chi, float(trunc_thr),
            dtype, rdtype, jacobi_sweeps() or DEFAULT_SWEEPS,
        )

    if (
        fused_rand_enabled(chi)
        and svd_impl() == "rand"
        and chi >= 8
        and chi % 8 == 0
        and jnp.dtype(dtype) == jnp.complex64
        and isinstance(trunc_thr, (int, float))
    ):
        # Fused-rand route: fused theta build + XLA range-finder + fused
        # reduced Jacobi/truncation (ops/fused_rand) — only where the
        # projection pays (module attr read so tests can monkeypatch it).
        from ..config import jacobi_sweeps
        from . import rand_svd
        from .jacobi_svd import DEFAULT_SWEEPS

        # The fused kernel additionally needs a sublane-aligned sketch width
        # (ell % 8); a user-set AQC_TPU_RAND_OVERSAMPLE that breaks alignment
        # falls through to the unfused rand path, which handles any even ell.
        ell = rand_svd.rand_ell(2 * chi, chi)
        if 2 * chi >= rand_svd.RAND_MIN_N and ell % 8 == 0:
            from .fused_rand import fused_rand_pair_update

            return fused_rand_pair_update(
                lam_l, lam_c, lam_r, g1, g2, gate4, chi, float(trunc_thr),
                dtype, rdtype, jacobi_sweeps() or DEFAULT_SWEEPS,
            )

    m = _pair_theta(lam_l, lam_c, lam_r, g1, g2, gate4, chi, dtype)
    batch_shape = m.shape[:-2]

    u, s, vh, mask, total = _truncated_svd(m, chi, trunc_thr)

    s_kept = jnp.where(mask, s, 0.0)
    kept_norm = jnp.sqrt(jnp.sum(s_kept * s_kept, axis=-1))
    # finfo.tiny, not a literal: 1e-300 underflows to 0 in the f32
    # production path, making a zero kept_norm yield NaN lambdas (0/0).
    floor = jnp.finfo(s_kept.dtype).tiny
    s_kept = s_kept * (total / jnp.maximum(kept_norm, floor))[..., None]
    new_lam = s_kept.astype(rdtype)

    u = jnp.where(mask[..., None, :], u, 0.0)
    vh = jnp.where(mask[..., :, None], vh, 0.0)

    inv_l = _safe_inv(lam_l).astype(dtype)
    inv_r = _safe_inv(lam_r).astype(dtype)
    new_g1 = u.reshape(batch_shape + (2, chi, chi)) * inv_l[..., None, :, None]
    new_g2 = jnp.swapaxes(vh.reshape(batch_shape + (chi, 2, chi)), -3, -2)
    new_g2 = new_g2 * inv_r[..., None, None, :]
    return new_g1, new_g2, new_lam


def apply_pairs_mps(
    mps: MPS,
    gates4: jax.Array,
    lo_sites: Tuple[int, ...],
    *,
    trunc_thr: float = _NO_TRUNCATION_THR,
) -> MPS:
    """Applies DISJOINT adjacent-pair gates simultaneously — one **batched**
    pair update (one batched SVD) for a whole chessboard half-layer.

    ``gates4``: (P, 4, 4) in (site, site+1) index order; ``lo_sites``: the P
    disjoint pair positions (static).  Disjoint pair updates touch disjoint
    (Γ, λ) tensors, so the batch is exact, not an approximation — and it
    collapses P separate SVD subgraphs into one, which both compiles and runs
    an order of magnitude better than sequential updates on TPU.
    """
    n, chi = mps.num_sites, mps.chi
    rdtype = mps.lambdas.dtype
    dtype = mps.gammas.dtype
    lo = np.asarray(lo_sites, dtype=int)
    assert lo.size > 0 and np.all(np.diff(lo) >= 2), "pairs must be disjoint"
    assert lo.min() >= 0 and lo.max() + 1 < n

    if _PAIR_SHARDING is not None and lo.size > 1:
        from ..parallel.mps_sharded import apply_pairs_mps_sharded

        mesh, axis = _PAIR_SHARDING
        return apply_pairs_mps_sharded(
            mps, jnp.asarray(gates4), lo_sites, mesh, axis=axis,
            trunc_thr=trunc_thr,
        )

    boundary = jnp.zeros((1, chi), rdtype).at[0, 0].set(1.0)
    lam_ext = jnp.concatenate([boundary, mps.lambdas, boundary], axis=0)
    # lam_ext[i + 1] == lambda_i ;  lam_ext[0] / lam_ext[n] are boundaries.

    lam_l = lam_ext[lo]  # lambda_{lo-1}
    lam_c = lam_ext[lo + 1]  # lambda_{lo}
    lam_r = lam_ext[lo + 2]  # lambda_{lo+1}
    g1 = mps.gammas[lo]
    g2 = mps.gammas[lo + 1]

    # _pair_update is natively batched: the whole run of disjoint pairs is
    # ONE decomposition call (one Pallas program under the "jacobi" impl).
    new_g1, new_g2, new_lam = _pair_update(
        lam_l, lam_c, lam_r, g1, g2, jnp.asarray(gates4), chi, trunc_thr, dtype, rdtype
    )

    gammas = mps.gammas.at[lo].set(new_g1).at[lo + 1].set(new_g2)
    lambdas = mps.lambdas.at[lo].set(new_lam)
    return MPS(gammas, lambdas)


@partial(jax.jit, static_argnums=0)
def _swap_gate(dtype):
    # jitted so the complex constant is BORN inside jit: apply_2q_any_mps is
    # public API and may be called eagerly, where an eager complex zeros()
    # would be a lazily-invalid buffer on the axon backend (CLAUDE.md).
    sw = jnp.zeros((4, 4), dtype)
    return sw.at[0, 0].set(1).at[3, 3].set(1).at[1, 2].set(1).at[2, 1].set(1)


def apply_2q_any_mps(
    mps: MPS,
    gate4: jax.Array,
    lo: int,
    hi: int,
    *,
    trunc_thr: float = _NO_TRUNCATION_THR,
) -> MPS:
    """2-qubit gate on an ARBITRARY site pair lo < hi; ``gate4`` in (lo, hi)
    index order.  Non-adjacent pairs route through a swap network (swap ``hi``
    down to ``lo+1``, apply, swap back) — the same strategy Aer uses
    internally for the reference's any-layout ``v_mul_mps``
    (mps_operations.py:326-346)."""
    assert 0 <= lo < hi < mps.num_sites
    if hi == lo + 1:
        return apply_2q_mps(mps, gate4, lo, trunc_thr=trunc_thr)
    sw = _swap_gate(mps.gammas.dtype)
    for k in range(hi - 1, lo, -1):
        mps = apply_2q_mps(mps, sw, k, trunc_thr=trunc_thr)
    mps = apply_2q_mps(mps, gate4, lo, trunc_thr=trunc_thr)
    for k in range(lo + 1, hi):
        mps = apply_2q_mps(mps, sw, k, trunc_thr=trunc_thr)
    return mps


def apply_gate_mps(
    mps: MPS,
    gate,
    *,
    trunc_thr: float = _NO_TRUNCATION_THR,
) -> MPS:
    """Applies one :class:`Gate` record; non-adjacent 2-qubit gates are routed
    through a swap network (swap up, apply, swap back)."""
    mat = gate_matrix(gate, mps.gammas.dtype)
    if len(gate.qubits) == 1:
        return apply_1q_mps(mps, mat, gate.qubits[0])

    ctrl, targ = gate.qubits
    lo, hi = (ctrl, targ) if ctrl < targ else (targ, ctrl)
    # Reorder the (ctrl, targ) matrix into (lo, hi) index order.
    g = mat.reshape(2, 2, 2, 2)
    if ctrl > targ:  # (ctrl, targ) = (hi, lo) -> transpose into (lo, hi)
        g = jnp.transpose(g, (1, 0, 3, 2))
    g = g.reshape(4, 4)

    return apply_2q_any_mps(mps, g, lo, hi, trunc_thr=trunc_thr)


@partial(jax.jit, static_argnums=(1, 2))
def _apply_program_mps_jit(mps: MPS, program: GateProgram, trunc_thr: float) -> MPS:
    for gate in program:
        mps = apply_gate_mps(mps, gate, trunc_thr=trunc_thr)
    return mps


def apply_program_mps(
    mps: MPS,
    program: GateProgram,
    *,
    trunc_thr: Optional[float] = None,
) -> MPS:
    """Applies a whole gate program as ONE jitted computation
    (cf. reference qcircuit_mul_mps, mps_operations.py:268-298 — without the
    circuit re-simulation; eager per-gate dispatch would pay a compile round
    trip per gate on remote-compile TPU runtimes)."""
    thr = _NO_TRUNCATION_THR if trunc_thr is None else float(trunc_thr)
    return _apply_program_mps_jit(mps, tuple(program), thr)


def mps_from_program(
    program: GateProgram,
    num_qubits: int,
    *,
    chi_max: int = 64,
    trunc_thr: Optional[float] = None,
    dtype=None,
) -> MPS:
    """``program @ |0...0>`` in MPS form (cf. reference mps_from_circuit,
    mps_operations.py:216-265)."""
    mps = mps_zero(num_qubits, chi_max, dtype)
    return apply_program_mps(mps, program, trunc_thr=trunc_thr)


# -----------------------------------------------------------------------------
# Inner products / conversion.
# -----------------------------------------------------------------------------


def _folded_tensors(mps: MPS) -> jax.Array:
    """A_i = Γ_i diag(λ_i) for i < n-1, A_{n-1} = Γ_{n-1}; stacked (n,2,chi,chi).

    The λ-folding preprocessing of the reference (_preprocess_mps,
    mps_operations.py:126-156)."""
    n = mps.num_sites
    lam_ext = jnp.concatenate(
        [mps.lambdas, jnp.zeros((1, mps.chi), mps.lambdas.dtype).at[0, 0].set(1.0)],
        axis=0,
    )  # (n, chi) — last row is the trivial boundary
    return mps.gammas * lam_ext[:, None, None, :].astype(mps.gammas.dtype)


@jax.jit
def mps_dot(mps1: MPS, mps2: MPS) -> jax.Array:
    """``<mps1 | mps2>`` via transfer-matrix contraction, O(n chi^3)
    (cf. reference mps_dot, mps_operations.py:192-213).  The two states may
    have different (padded) bond dimensions."""
    a1 = _folded_tensors(mps1)
    a2 = _folded_tensors(mps2)
    env0 = jnp.zeros((mps1.chi, mps2.chi), a1.dtype).at[0, 0].set(1.0)

    def body(env, tensors):
        t1, t2 = tensors
        env = jnp.einsum("sab,aA,sAB->bB", jnp.conj(t1), env, t2)
        return env, None

    env, _ = jax.lax.scan(body, env0, (a1, a2))
    return env[0, 0]


def mps_norm(mps: MPS) -> jax.Array:
    return jnp.sqrt(jnp.real(mps_dot(mps, mps)))


@partial(jax.jit, static_argnums=(1,))
def mps_flip_amplitudes(mps: MPS, base_bits: Tuple[int, ...]) -> jax.Array:
    """Amplitudes of the base basis state AND all its single-bit flips.

    Returns ``amps`` of length ``n + 1``: ``amps[0] = <base|mps>`` and
    ``amps[1 + q] = <base ^ (1 << q)|mps>``.  One prefix/suffix sweep of
    bond vectors — O(n chi^2) for ALL n+1 amplitudes, replacing n+1 full
    transfer-matrix dots (the local Hilbert-Schmidt products of the ASP
    surrogate objective, objective_lhs_sur_fast_mps_trotter.py:139-143).
    """
    n, chi = mps.num_sites, mps.chi
    assert len(base_bits) == n
    a = _folded_tensors(mps)  # (n, 2, chi, chi)
    dtype = a.dtype

    # Prefix row-vectors: pre[q] = product of sites < q at their base bits.
    pre = [jnp.zeros(chi, dtype).at[0].set(1.0)]
    for q in range(n):
        pre.append(pre[-1] @ a[q, base_bits[q]])

    # Suffix column-vectors: suffix_from[q] = product of sites >= q.
    suffix_from = [None] * (n + 1)
    suffix_from[n] = jnp.zeros(chi, dtype).at[0].set(1.0)
    for q in range(n - 1, -1, -1):
        suffix_from[q] = a[q, base_bits[q]] @ suffix_from[q + 1]

    amps = [pre[n][0]]  # <base|mps>: full prefix ends at right boundary bond 0
    for q in range(n):
        amps.append(pre[q] @ a[q, 1 - base_bits[q]] @ suffix_from[q + 1])
    return jnp.stack(amps)


def mps_to_vector(mps: MPS) -> jax.Array:
    """Dense state vector (exponential — tests only; cf. reference
    mps_to_vector, mps_operations.py:159-189)."""
    a = _folded_tensors(mps)
    n, chi = mps.num_sites, mps.chi
    v = a[0][:, 0, :]  # (2, chi) — left boundary bond is 0
    for i in range(1, n):
        v = jnp.einsum("...b,sbc->s...c", v, a[i])
    v = v[..., 0]  # right boundary bond
    # v axes are (s_n, ..., s_1); C-order ravel puts s_n most significant —
    # which is exactly the little-endian convention (bit j = site j).
    return v.reshape(-1)


def mps_from_dense(state: np.ndarray, chi_max: int, dtype=None) -> MPS:
    """Exact MPS of a dense state via successive SVDs (host/test utility)."""
    dtype = complex_dtype() if dtype is None else dtype
    state = np.asarray(state)
    n = int(round(np.log2(state.size)))
    assert 2**n == state.size

    gammas = np.zeros((n, 2, chi_max, chi_max), dtype=np.complex128)
    lambdas = np.zeros((max(n - 1, 0), chi_max))

    # Work in axis order (s_n, ..., s_1) so site 1 (LSB) splits off last;
    # we instead split from the LSB side: reorder to (s_1, ..., s_n).
    psi = state.reshape([2] * n).transpose(list(range(n - 1, -1, -1)))
    # Now psi axes are (s_1, s_2, ..., s_n).
    left_dim = 1
    prev_lam = np.ones(1)
    mats = psi.reshape(2 * left_dim, -1)
    for i in range(n - 1):
        u, s, vh = np.linalg.svd(mats, full_matrices=False)
        k = min(chi_max, int(np.sum(s > 1e-14)))
        u, s, vh = u[:, :k], s[:k], vh[:k, :]
        # u: (2 * left_dim, k) -> Γ_i[s, a, b] = u[(s a), b] / prev_lam[a]
        u3 = u.reshape(2, left_dim, k)
        inv = np.where(prev_lam > 1e-14, 1.0 / prev_lam, 0.0)
        gammas[i, :, :left_dim, :k] = u3 * inv[None, :, None]
        lambdas[i, :k] = s
        prev_lam = s
        left_dim = k
        # vh rows are bond k, columns are (s_{i+1}, ..., s_n) flattened with
        # s_{i+1} slowest. (diag(s) vh) has shape (k, 2^{n-i-1}); reshape to
        # (k, 2, -1) then move s next to bond: (2, k, -1) -> (2k, -1).
        mats = (np.diag(s) @ vh).reshape(k, 2, -1).transpose(1, 0, 2).reshape(2 * k, -1)
    # Last site: mats is (2 * left_dim, 1): Γ_n[s, a, 0] = mats / prev_lam[a]
    inv = np.where(prev_lam > 1e-14, 1.0 / prev_lam, 0.0)
    last = mats.reshape(2, left_dim)
    gammas[n - 1, :, :left_dim, 0] = last * inv[None, :]
    from ..utils import from_host

    return MPS(from_host(gammas.astype(np.dtype(dtype))), jnp.asarray(lambdas))


def rand_mps_vec(
    num_qubits: int,
    num_layers: int = 3,
    chi_max: int = 32,
) -> MPS:
    """Random low-entanglement MPS from a random layered ansatz
    (cf. reference rand_mps_vec, mps_operations.py:301-323)."""
    from random import choice

    from ..circuit.ansatz import Ansatz
    from ..circuit.export import ansatz_to_program
    from ..circuit.structures import create_ansatz_structure
    from ..utils import rand_thetas

    blocks = create_ansatz_structure(
        num_qubits, "spin", "full", num_layers * (num_qubits - 1)
    )
    circ = Ansatz.make(num_qubits, choice(["cx", "cz", "cp"]), blocks)
    thetas = rand_thetas(circ.num_thetas)
    return mps_from_program(ansatz_to_program(circ, thetas), num_qubits, chi_max=chi_max)


@partial(jax.jit, static_argnums=(1,))
def _mps_resize_jit(mps: MPS, chi_new: int) -> MPS:
    n, chi = mps.num_sites, mps.chi
    k = min(chi, chi_new)
    g = jnp.zeros((n, 2, chi_new, chi_new), mps.gammas.dtype)
    g = g.at[:, :, :k, :k].set(mps.gammas[:, :, :k, :k])
    lam = jnp.zeros((max(n - 1, 0), chi_new), mps.lambdas.dtype)
    lam = lam.at[:, :k].set(mps.lambdas[:, :k])
    return MPS(g, lam)


def mps_resize(mps: MPS, chi_new: int) -> MPS:
    """Pads (grows) or slices (shrinks) the static bond dimension.

    Shrinking is only exact when the dropped bond rows/cols are zero — the
    caller is responsible (the χ-growth scheduler only ever grows).

    Jitted constructor (the ``_mps_basis_state_jit`` pattern): the complex
    zero buffers are born inside jit, so calling this eagerly on the axon
    TPU backend is safe (see CLAUDE.md on lazily-invalid complex buffers)."""
    if chi_new == mps.chi:
        return mps
    return _mps_resize_jit(mps, chi_new)


# -----------------------------------------------------------------------------
# Ansatz application (fused blocks — one SVD per unit block).
# -----------------------------------------------------------------------------


def v_mul_mps(circ, thetas, mps: MPS, *, trunc_thr: Optional[float] = None) -> MPS:
    """``V(Θ) @ mps`` with each unit block applied as ONE fused 4x4 update
    (cf. reference v_mul_mps, mps_operations.py:326-346, which re-simulates
    the whole circuit through Aer)."""
    return _v_mul_mps_impl(circ, jnp.asarray(thetas), mps, False, trunc_thr)


def v_dagger_mul_mps(circ, thetas, mps: MPS, *, trunc_thr: Optional[float] = None) -> MPS:
    """``V(Θ)† @ mps`` (cf. reference v_dagger_mul_mps, mps_operations.py:349-371)."""
    return _v_mul_mps_impl(circ, jnp.asarray(thetas), mps, True, trunc_thr)


def v_mul_mps_growing(
    circ,
    thetas,
    bits: Tuple[int, ...],
    chi_max: int,
    *,
    trunc_thr: Optional[float] = None,
    dtype=None,
) -> MPS:
    """``V(Θ) @ |bits>`` with **χ-growth scheduling** (VERDICT r2 item 1b).

    A product state saturates the working bond dimension only after
    ~log2(chi_max) half-layer phases: after phase p every bond has rank at
    most 2^p (each pair update at most doubles the bonds it crosses).  The
    full-χ sweep nevertheless pays (2·chi_max)³-sized decompositions from
    gate one.  This sweep instead unrolls the head phases at a growing
    static bond dimension χ_p = min(chi_max, 2^p) — EXACT parity with the
    full-χ sweep, because χ_p always covers the attainable rank, the
    discarded-weight truncation rule is scale-relative, and the rank cap
    only ever binds at chi_max — then switches to the standard
    scan-over-layers at full χ.

    The production value path of the jitted MPS optimizer
    (models/sp_lhs/jit_asp.py) uses this for its linesearch trials: the
    early-phase decompositions drop from (2·chi_max)³ to (2·χ_p)³.
    Requires :func:`v_dagger_layer_cache_eligible` structure (layered
    adjacent-pair Trotter ansatz).
    """
    assert v_dagger_layer_cache_eligible(circ)
    dtype = complex_dtype() if dtype is None else dtype
    thr = _NO_TRUNCATION_THR if trunc_thr is None else float(trunc_thr)
    return _v_mul_mps_growing_impl(
        circ, jnp.asarray(thetas), tuple(int(b) for b in bits), int(chi_max),
        thr, dtype,
    )


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _v_mul_mps_growing_impl(circ, thetas, bits, chi_max, trunc_thr, dtype):
    from .statevector import block_gates, front_gates

    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=False)
    gates = block_gates(circ, circ.subset2q(thetas), dtype, dagger=False)
    nb, bpl = circ.num_blocks, circ.bpl
    half = circ.half_layer_num_blocks
    layers = nb // bpl

    def fuse_run(ks, g_l):
        """Fused (gstack, los) of a disjoint-or-identical-pair run."""
        per_pair: dict = {}
        for k in ks:
            ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
            lo = min(ctrl, targ)
            g = g_l[k].reshape(2, 2, 2, 2)
            if ctrl > targ:
                g = jnp.transpose(g, (1, 0, 3, 2))
            g = g.reshape(4, 4)
            per_pair[lo] = g if lo not in per_pair else jnp.matmul(g, per_pair[lo])
        los = tuple(sorted(per_pair))
        return jnp.stack([per_pair[lo] for lo in los]), los

    def plan_runs(ks):
        runs, current, pairs = [], [], set()
        for k in ks:
            lo = min(int(circ.blocks[0, k]), int(circ.blocks[1, k]))
            if current and any(abs(lo - p) == 1 for p in pairs):
                runs.append(current)
                current, pairs = [], set()
            current.append(k)
            pairs.add(lo)
        if current:
            runs.append(current)
        return runs

    runs = plan_runs(list(range(bpl)))
    half_runs = plan_runs(list(range(half))) if half else []

    def apply_phase(mps_, g_l, run):
        gstack, los = fuse_run(run, g_l)
        if len(los) == 1:
            return apply_2q_mps(mps_, gstack[0], los[0], trunc_thr=trunc_thr)
        return apply_pairs_mps(mps_, gstack, los, trunc_thr=trunc_thr)

    mps = _mps_basis_state_jit(bits, 1, dtype)
    for q in range(circ.num_qubits):
        mps = apply_1q_mps(mps, f1q[q], q)

    g_layers = gates[: layers * bpl].reshape(layers, bpl, 4, 4)

    # Unrolled head: grow χ by x2 before each phase until chi_max, stopping
    # at a layer boundary so the tail scans with uniform shapes.
    chi_cur = 1
    layer_start = 0
    for j in range(layers):
        if chi_cur >= chi_max:
            break
        for run in runs:
            if chi_cur < chi_max:
                chi_cur = min(chi_max, 2 * chi_cur)
                mps = mps_resize(mps, chi_cur)
            mps = apply_phase(mps, g_layers[j], run)
        layer_start = j + 1
    if chi_cur < chi_max or mps.chi < chi_max:
        mps = mps_resize(mps, chi_max)

    if layer_start < layers:

        def body(m_, g_l):
            for run in runs:
                m_ = apply_phase(m_, g_l, run)
            return m_, None

        mps, _ = jax.lax.scan(body, mps, g_layers[layer_start:])

    for run in half_runs:
        mps = apply_phase(mps, gates, run)
    return mps


def v_dagger_layer_cache_eligible(circ) -> bool:
    """True when :func:`v_dagger_mul_mps_layers` supports ``circ`` (layered
    Trotter structure taking the scan path)."""
    nb = circ.num_blocks
    bpl = circ.bpl if circ.is_trotterized else 0
    return (
        circ.is_trotterized
        and circ.circuit_power == 1
        and nb > 0
        and bpl > 0
        and nb % bpl == 0
        and nb // bpl >= 2
        and all(
            abs(int(circ.blocks[0, k]) - int(circ.blocks[1, k])) == 1
            and circ.blocks[0, k] == circ.blocks[0, k % bpl]
            and circ.blocks[1, k] == circ.blocks[1, k % bpl]
            for k in range(nb)
        )
    )


def v_dagger_mul_mps_layers(
    circ, thetas, mps: MPS, *, trunc_thr: Optional[float] = None
) -> Tuple[MPS, MPS]:
    """``V† @ mps`` plus the per-layer intermediate cache for the co-sweep
    gradient.

    Returns ``(vh_phi, cache)`` where ``cache`` holds L+1 stacked states
    (leading axis): ``cache[j]`` is the z state ENTERING gradient layer j
    (``V_{layers>j}† @ mps``) and ``cache[L]`` the state entering the
    trailing 2nd-order half-layer.  These are by-products of the V† sweep
    itself — with them the gradient's forward co-sweep does not need to
    re-apply each layer's last pair group to z (ops/mps_gradient.py), which
    removes half of the gradient's z-side truncated decompositions.
    Requires :func:`v_dagger_layer_cache_eligible`.
    """
    assert v_dagger_layer_cache_eligible(circ)
    return _v_dagger_mul_mps_layers_impl(circ, jnp.asarray(thetas), mps, trunc_thr)


@partial(jax.jit, static_argnums=(0, 3))
def _v_dagger_mul_mps_layers_impl(circ, thetas, mps: MPS, trunc_thr):
    from .statevector import block_gates, front_gates

    thr = _NO_TRUNCATION_THR if trunc_thr is None else float(trunc_thr)
    dtype = mps.gammas.dtype
    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=True)
    gates = block_gates(circ, circ.subset2q(thetas), dtype, dagger=True)
    nb, bpl = circ.num_blocks, circ.bpl
    half = circ.half_layer_num_blocks
    layers = nb // bpl

    def apply_run(mps_, ks, gate_source):
        per_pair: dict = {}
        order_ks = []
        for k in ks:
            ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
            lo = min(ctrl, targ)
            g = gate_source(k).reshape(2, 2, 2, 2)
            if ctrl > targ:
                g = jnp.transpose(g, (1, 0, 3, 2))
            g = g.reshape(4, 4)
            per_pair[lo] = g if lo not in per_pair else jnp.matmul(g, per_pair[lo])
        los = tuple(sorted(per_pair))
        if len(los) == 1:
            return apply_2q_mps(mps_, per_pair[los[0]], los[0], trunc_thr=thr)
        gstack = jnp.stack([per_pair[lo] for lo in los])
        return apply_pairs_mps(mps_, gstack, los, trunc_thr=thr)

    def plan_runs(ks):
        runs, current, pairs = [], [], set()
        for k in ks:
            lo = min(int(circ.blocks[0, k]), int(circ.blocks[1, k]))
            if current and any(abs(lo - p) == 1 for p in pairs):
                runs.append(current)
                current, pairs = [], set()
            current.append(k)
            pairs.add(lo)
        if current:
            runs.append(current)
        return runs

    # Trailing half-layer first (V† order), saved as cache[L].
    out = mps
    if half:
        for run in plan_runs(list(range(half - 1, -1, -1))):
            out = apply_run(out, run, lambda k: gates[k])
    c_last = out

    # Reversed layers with per-layer collection: ys[i] = C_i (state after
    # processing i+1 daggered layers); cache[j] = C_{L-1-j}.
    g_layers = gates[: layers * bpl].reshape(layers, bpl, 4, 4)[::-1]
    order = list(range(bpl))[::-1]
    runs = plan_runs(order)

    def body(m_, g_l):
        for run in runs:
            m_ = apply_run(m_, run, lambda k: g_l[k])
        return m_, m_

    out, ys = jax.lax.scan(body, c_last, g_layers)

    for q in range(circ.num_qubits):
        out = apply_1q_mps(out, f1q[q], q)

    cache = MPS(
        jnp.concatenate([ys.gammas[::-1], c_last.gammas[None]], axis=0),
        jnp.concatenate([ys.lambdas[::-1], c_last.lambdas[None]], axis=0),
    )
    return out, cache


@partial(jax.jit, static_argnums=(0, 3, 4))
def _v_mul_mps_impl(circ, thetas, mps: MPS, dagger: bool, trunc_thr):
    from .statevector import block_gates, front_gates

    thr = _NO_TRUNCATION_THR if trunc_thr is None else float(trunc_thr)
    dtype = mps.gammas.dtype
    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=dagger)
    gates = block_gates(circ, circ.subset2q(thetas), dtype, dagger=dagger)
    nb = circ.num_blocks
    half = circ.half_layer_num_blocks if circ.is_trotterized else 0

    def block_gate_lo(g4, k):
        """Gate k reordered into (lo, hi) site order; returns (gate, lo, hi)."""
        ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
        lo, hi = min(ctrl, targ), max(ctrl, targ)
        g = g4.reshape(2, 2, 2, 2)
        if ctrl > targ:  # (ctrl,targ)=(hi,lo) -> (lo,hi) order
            g = jnp.transpose(g, (1, 0, 3, 2))
        return g.reshape(4, 4), lo, hi

    # Non-nearest-neighbour blocks (any ParametricCircuit layout, matching the
    # reference's Aer-backed v_mul_mps, mps_operations.py:326-346) take a
    # strictly sequential swap-network path; the batched/fused planning below
    # assumes adjacent pairs.
    all_adjacent = all(
        abs(int(circ.blocks[0, k]) - int(circ.blocks[1, k])) == 1
        for k in range(nb)
    )

    def apply_block(mps_, k, g4):
        g, lo, hi = block_gate_lo(g4, k)
        return apply_2q_any_mps(mps_, g, lo, hi, trunc_thr=thr)

    def apply_run(mps_, ks, gate_source):
        """Applies a consecutive run of blocks: same-pair gates multiply into
        one 4x4, disjoint pairs batch into ONE vmapped pair update."""
        per_pair: dict = {}
        for k in ks:
            g, lo, _ = block_gate_lo(gate_source(k), k)
            per_pair[lo] = g if lo not in per_pair else jnp.matmul(g, per_pair[lo])
        los = tuple(sorted(per_pair))
        if len(los) == 1:
            return apply_2q_mps(mps_, per_pair[los[0]], los[0], trunc_thr=thr)
        gstack = jnp.stack([per_pair[lo] for lo in los])
        return apply_pairs_mps(mps_, gstack, los, trunc_thr=thr)

    def plan_runs(ks):
        """Splits a block-index sequence into maximal runs whose pairs are
        pairwise disjoint-or-identical (such runs commute freely)."""
        runs, current, pairs = [], [], set()
        for k in ks:
            lo = min(int(circ.blocks[0, k]), int(circ.blocks[1, k]))
            if current and any(abs(lo - p) == 1 for p in pairs):
                runs.append(current)
                current, pairs = [], set()
            current.append(k)
            pairs.add(lo)
        if current:
            runs.append(current)
        return runs

    # Layered (Trotter) structures scan over layers: compile stays
    # O(blocks-per-layer) instead of O(depth).
    bpl = circ.bpl if circ.is_trotterized else 0
    use_scan = (
        circ.is_trotterized
        and all_adjacent
        and nb > 0
        and bpl > 0
        and nb % bpl == 0
        and nb // bpl >= 2
        and all(
            circ.blocks[0, k] == circ.blocks[0, k % bpl]
            and circ.blocks[1, k] == circ.blocks[1, k % bpl]
            for k in range(nb)
        )
    )

    def apply_main(mps_):
        if use_scan:
            layers = nb // bpl
            g_layers = gates[: layers * bpl].reshape(layers, bpl, 4, 4)
            order = list(range(bpl))
            if dagger:
                order = order[::-1]
                g_layers = g_layers[::-1]
            runs = plan_runs(order)

            def body(m_, g_l):
                for run in runs:
                    m_ = apply_run(m_, run, lambda k: g_l[k])
                return m_, None

            mps_, _ = jax.lax.scan(body, mps_, g_layers)
            return mps_
        order = list(range(nb - 1, -1, -1) if dagger else range(nb))
        if not all_adjacent:
            for k in order:
                mps_ = apply_block(mps_, k, gates[k])
            return mps_
        for run in plan_runs(order):
            mps_ = apply_run(mps_, run, lambda k: gates[k])
        return mps_

    def apply_half(mps_):
        order = list(range(half - 1, -1, -1) if dagger else range(half))
        if not all_adjacent:
            for k in order:
                mps_ = apply_block(mps_, k, gates[k])
            return mps_
        for run in plan_runs(order):
            mps_ = apply_run(mps_, run, lambda k: gates[k])
        return mps_

    # Circuit power V^p: the reference's MPS path goes through
    # ansatz_to_qcircuit, which repeats the circuit power times
    # (circuit_transform.py:200-201).
    for _ in range(circ.circuit_power):
        if dagger:
            if half:
                mps = apply_half(mps)
            mps = apply_main(mps)
            for q in range(circ.num_qubits):
                mps = apply_1q_mps(mps, f1q[q], q)
        else:
            for q in range(circ.num_qubits):
                mps = apply_1q_mps(mps, f1q[q], q)
            mps = apply_main(mps)
            if half:
                mps = apply_half(mps)
    return mps
