"""Pallas TPU kernel: batched one-sided Jacobi SVD.

The XLA expression of the Brent-Luk schedule (ops/jacobi_svd.py) dispatches
~30 small ops per phase — at (n-1)*sweeps ~ 1500 phases the per-op overhead
dominates.  This kernel runs the ENTIRE phase loop inside one Pallas program:
the matrices live in VMEM, each phase is a handful of VPU passes, and the
batch dimension rides along elementwise — so a fleet of B matrices costs
VPU-throughput, not B serial decompositions (the failure mode of the stock
eigh on this backend, see benchmarks/probe_decomp_primitives.py; measured
speedup vs the gram-eigh truncated SVD: ~3x at the pair-update shape,
benchmarks/probe_pallas_jacobi.py).

Design choices:

* complex arithmetic is spelled out on separate re/im f32 planes (Pallas TPU
  has no complex dtype);
* matrices are processed TRANSPOSED: row j of the working array is column j
  of the input, so "column pair" rotations are sublane-block operations with
  the full lane-width row dimension;
* V is NOT accumulated in the kernel — the right factor is recovered outside
  as ``vh = diag(1/s) u^H m`` (one batched MXU matmul), halving the VPU work;
* the batch is processed in VMEM-sized chunks via the Pallas grid.

Numerical spec and schedule are identical to ops/jacobi_svd.py (the pure-XLA
reference, parity-tested against it and LAPACK).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import jacobi_criterion
from .jacobi_svd import DEFAULT_SWEEPS

_EPS32 = float(jnp.finfo(jnp.float32).eps)

# VMEM budget for the kernel's resident arrays (in 2 + out 2 + carry 4 of
# (chunk, n, n)/2 f32 each ~= 24 n^2 bytes per matrix); chunk is chosen per
# call to fill the batch with MINIMAL padding — a fixed chunk of 8 padded
# the common batch-10 half-layer phases to 16 (60% wasted VPU work).
_VMEM_BUDGET = 12 * 1024 * 1024
_MAX_CHUNK = 16


# At n >= 128 the default chunk is capped at 1: the adaptive while_loop is
# shared per chunk (each matrix pays the chunk's MAX sweep count), and the
# per-grid-step overhead of small chunks is ~free at these shapes — measured
# on-chip 20q chi=64 (sweeps/s, grad_norm bit-identical): cap 16 -> 2 -> 1
# is 30.88 -> 33.51 -> 33.70 at init and 18.83 -> 21.34 -> 21.97 at the
# 0.05-perturbed point (same-day A/Bs); 28q chi=128 is chunk-insensitive
# (7.04 vs 7.01 init, 3.95 vs 3.96 perturbed — its full-chi phases use the
# fused kernel, which VMEM-caps itself at 2 for chi >= 128 anyway).
# Smaller shapes keep VMEM-derived chunks: they are chi-growth head phases
# with uniform low counts where splitting is pure overhead (capping ALL
# shapes measured -2.6% at 28q init).
_SMALL_CHUNK_MIN_N = 128
_SMALL_CHUNK = int(__import__("os").environ.get("AQC_TPU_SMALL_CHUNK", "1"))


def _pick_chunk(b: int, n: int, rows: int | None = None) -> int:
    """VMEM-feasible chunk (<= _MAX_CHUNK, <= config.svd_chunk()) that
    splits ``b`` into equal-size grid steps with the least padding; capped
    at _SMALL_CHUNK for n >= _SMALL_CHUNK_MIN_N (see above).  ``rows``
    covers the rectangular working arrays of the randomized-projection
    path (ops/rand_svd.py): ``n`` columns of length ``rows``."""
    from ..config import svd_chunk

    per_matrix = 24 * n * (rows if rows is not None else n)
    cmax = max(1, min(_MAX_CHUNK, _VMEM_BUDGET // per_matrix))
    if max(n, rows or 0) >= _SMALL_CHUNK_MIN_N:
        cmax = min(cmax, _SMALL_CHUNK)
    override = svd_chunk()
    if override is not None:
        cmax = max(1, min(cmax, override))
    n_chunks = -(-b // cmax)
    return -(-b // n_chunks)


# Convergence tolerance for the adaptive sweep loop, on the ENTRY-ABSOLUTE
# residual |c| / (s_max * max(|w_i|, |w_j|)): a full sweep whose largest
# residual stays below this contributes less than tol * s_max to any entry
# of the reconstruction — the f32 accuracy floor.  (The earlier RELATIVE
# measure |c| / (|w_i| |w_j|) demanded orthogonality of the junk tail —
# about-to-be-truncated columns below eps * s_max with O(1) mutual angles —
# and was measured to force 10-12 sweeps on real mid-optimization pair
# matrices where this criterion needs 4-8; see RESULTS.md.)
_CONV_TOL = 1e-6

# Coupling to the truncation threshold (VERDICT r3 weak #7): a tol-converged
# factorization perturbs singular values by O(_CONV_TOL * s_max), while the
# discarded-weight rule compares s_i^2 / total against trunc_thr — the
# keep/drop boundary sits at amplitude ~ sqrt(trunc_thr) * s_max.  The
# decision is trustworthy when sqrt(trunc_thr) >> _CONV_TOL: production
# trunc_thr = 1e-6 has a 1000x margin, 1e-8 still 100x.  It degrades only
# for trunc_thr < _CONV_TOL**2 = 1e-12 — and thresholds at/below
# eps_f32**2 ~ 1.4e-14 cannot truncate anything f32 resolves anyway (the
# no-truncation sentinel lives there).  The criterion is therefore
# tolerance-safe across the whole f32-representable truncation regime;
# truncation_supported() makes the contract explicit, and the engine warns
# at trace time when a threshold lands in the unsupported (1.4e-14, 1e-12)
# window.


def truncation_supported(trunc_thr: float) -> bool:
    """True when the f32 entry-absolute convergence criterion resolves the
    keep/drop boundary of ``trunc_thr`` (see the coupling note above).
    Thresholds at/below eps_f32**2 disable truncation in f32 and are
    trivially safe."""
    import math

    eps2 = float(jnp.finfo(jnp.float32).eps) ** 2
    return trunc_thr <= eps2 or math.sqrt(trunc_thr) >= _CONV_TOL


def _adaptive_seat_sweeps(wl_re, wl_im, wr_re, wr_im, max_sweeps: int):
    """Adaptive Brent-Luk sweep loop on seat VALUES (the in-kernel core).

    ``wl_*, wr_*``: (b, p, n) seat blocks — row j of seat L/R is a column of
    the input matrix (2p columns of lane length n; rectangular inputs from
    the randomized-projection path have 2p < n).  Runs full sweeps (2p-1
    phases — one complete round-robin tour of the 2p columns) until the
    largest entry-absolute off-diagonal residual of a sweep drops below
    _CONV_TOL or ``max_sweeps`` is hit; returns the rotated seats.  Shared by the plain
    Jacobi kernel below and the fused pair-update kernel
    (ops/fused_pair.py) so both run the identical schedule/criterion.

    ADAPTIVE sweep count: fixed low sweep counts are measurably unsafe —
    mid-optimization pair matrices can need many more sweeps than the
    perfect-init ones (an L-BFGS run at 4 sweeps produced garbage objectives
    while 6 converged) — and the eigh this kernel replaces is itself
    convergence-adaptive, so matching that is also what makes the cost
    comparison honest.
    """
    b, p, n = wl_re.shape

    def phase(_, carry):
        wl_re, wl_im, wr_re, wr_im, resid = carry

        # 2x2 Gram of every (L[j], R[j]) column pair: a, b real; c complex.
        aa = jnp.sum(wl_re * wl_re + wl_im * wl_im, axis=-1)  # (b, p)
        bb = jnp.sum(wr_re * wr_re + wr_im * wr_im, axis=-1)
        c_re = jnp.sum(wl_re * wr_re + wl_im * wr_im, axis=-1)
        c_im = jnp.sum(wl_re * wr_im - wl_im * wr_re, axis=-1)

        abs_c = jnp.sqrt(c_re * c_re + c_im * c_im)
        norm_ab = jnp.sqrt(jnp.maximum(aa * bb, 1e-30))
        max_ab = jnp.maximum(aa, bb)
        smax2 = jnp.max(max_ab, axis=1, keepdims=True)  # (b, 1) per matrix
        if jacobi_criterion() == "hybrid":
            # Relative-grade orthogonality for columns above the kill floor
            # (32*eps*s_max — directions below it are zeroed after the
            # loop), entry-absolute against the floor for killed junk.  See
            # ops/jacobi_svd._phase_update for the contamination analysis.
            floor2 = (32.0 * _EPS32) ** 2 * smax2
            gate = jnp.maximum(jnp.minimum(aa, bb), floor2)
        else:  # "entry"
            gate = max_ab
        denom = jnp.sqrt(jnp.maximum(smax2 * gate, 1e-30))
        resid = jnp.maximum(resid, jnp.max(abs_c / denom))
        active = abs_c > _EPS32 * norm_ab
        safe_c = jnp.where(active, abs_c, 1.0)
        ph_re = jnp.where(active, c_re / safe_c, 1.0)
        ph_im = jnp.where(active, c_im / safe_c, 0.0)
        tau = (bb - aa) / (2.0 * safe_c)
        # sign(0) must be +1: equal norms still need the full pi/4 rotation.
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        cs = jax.lax.rsqrt(1.0 + t * t)
        sn_r = t * cs
        cs = jnp.where(active, cs, 1.0)
        sn_r = jnp.where(active, sn_r, 0.0)

        # sn = sn_r * phase ; sn_c = sn_r * conj(phase); broadcast over lanes.
        cs = cs[:, :, None]
        sn_re = (sn_r * ph_re)[:, :, None]
        sn_im = (sn_r * ph_im)[:, :, None]

        # L' = cs L - conj(sn) R ;  R' = sn L + cs R   (complex)
        nl_re = cs * wl_re - (sn_re * wr_re + sn_im * wr_im)
        nl_im = cs * wl_im - (sn_re * wr_im - sn_im * wr_re)
        nr_re = sn_re * wl_re - sn_im * wl_im + cs * wr_re
        nr_im = sn_re * wl_im + sn_im * wl_re + cs * wr_im

        def seats(l, r):
            # Round-robin: L <- [l0, r0, l1..l_{p-2}], R <- [r1.., l_{p-1}].
            nl = jnp.concatenate(
                [l[:, :1, :], r[:, :1, :], l[:, 1 : p - 1, :]], axis=1
            )
            nr = jnp.concatenate([r[:, 1:, :], l[:, p - 1 :, :]], axis=1)
            return nl, nr

        wl_re, wr_re = seats(nl_re, nr_re)
        wl_im, wr_im = seats(nl_im, nr_im)
        return (wl_re, wl_im, wr_re, wr_im, resid)

    def sweep_cond(state):
        k, resid, *_ = state
        return jnp.logical_and(k < max_sweeps, resid >= _CONV_TOL)

    def sweep_body(state):
        k, _, wl_re, wl_im, wr_re, wr_im = state
        # One full round-robin tour of the 2p COLUMNS is 2p-1 phases (== n-1
        # only for square inputs; the rand path's rectangular problems have
        # 2p < n lanes and must not pay lane-count phases).
        wl_re, wl_im, wr_re, wr_im, resid = jax.lax.fori_loop(
            0, 2 * p - 1, phase, (wl_re, wl_im, wr_re, wr_im, jnp.float32(0.0))
        )
        return (k + 1, resid, wl_re, wl_im, wr_re, wr_im)

    state = (jnp.int32(0), jnp.float32(jnp.inf), wl_re, wl_im, wr_re, wr_im)
    _, _, wl_re, wl_im, wr_re, wr_im = jax.lax.while_loop(
        sweep_cond, sweep_body, state
    )
    return wl_re, wl_im, wr_re, wr_im


def _jacobi_kernel_body(max_sweeps: int, m_re_ref, m_im_ref, w_re_ref, w_im_ref):
    """One-sided Jacobi on a (chunk, c, r) block of transposed matrices:
    row j of the working array is column j of the input, so ``c`` is the
    column count being orthogonalized and ``r`` rides the lanes (square
    inputs have c == r; the randomized-projection path feeds c < r)."""
    _, n, _ = m_re_ref.shape
    p = n // 2
    wl_re, wl_im, wr_re, wr_im = _adaptive_seat_sweeps(
        m_re_ref[:, :p, :],
        m_im_ref[:, :p, :],
        m_re_ref[:, p:, :],
        m_im_ref[:, p:, :],
        max_sweeps,
    )
    w_re_ref[:, :p, :] = wl_re
    w_re_ref[:, p:, :] = wr_re
    w_im_ref[:, :p, :] = wl_im
    w_im_ref[:, p:, :] = wr_im


@partial(jax.jit, static_argnums=(2, 3, 4))
def _jacobi_pallas_raw(m_re, m_im, sweeps: int, chunk: int,
                       interpret: bool | None = None):
    """Runs the kernel on transposed re/im planes (B, c, r) — c columns of
    length r, c even (square inputs have c == r); B must be a multiple of
    ``chunk``.  Returns (w_re, w_im) with W = (m V)^T rows.

    ``interpret=None`` auto-selects interpreter mode off-TPU; an explicit
    True forces the interpreter ON TPU (bit-faithful reference for
    wrong-code discriminators, benchmarks/probe_kernel_rect.py)."""
    b, c, r = m_re.shape
    assert b % chunk == 0 and c % 2 == 0
    out = jax.ShapeDtypeStruct((b, c, r), jnp.float32)
    kernel = partial(_jacobi_kernel_body, sweeps)
    spec = pl.BlockSpec(
        (chunk, c, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if interpret is None:
        # Interpreter mode off-TPU (CPU test backend) — same numerics.
        interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=(b // chunk,),
        out_shape=(out, out),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(m_re, m_im)


def _sort_guard_top_k(w_re, w_im, k: int, cdtype):
    """Shared tail of the kernel paths (plain + randomized-projection):
    sort the kernel's output rows by norm, keep the top ``k``, and kill
    directions below the relative noise floor.

    Noise-direction guard: below-rank rows of the rotated working array are
    f32 rotation residue (norm ~ eps * s_max) whose DIRECTION can lie
    entirely inside the true column space; normalizing them yields garbage
    factor columns, and the diag(1/s) recovery cancels the tiny s against
    1/s — keeping O(1) wrong contributions in u diag(s) vh.  (The gram-eigh
    path is immune: its unitary factor comes from eigh.)  Every direction
    below a relative floor safely above the measured orthogonality residue
    (~5e-7) is zeroed: its true weight is < 4e-6 * s_max, below f32
    resolution.

    Returns (w, s, inv): w (B, k, r) complex rows, s (B, k) with exact
    zeros below the floor, inv the mask-safe 1/s."""
    s = jnp.sqrt(jnp.sum(w_re * w_re + w_im * w_im, axis=-1))
    w = (w_re + 1j * w_im).astype(cdtype)
    order = jnp.argsort(-s, axis=-1)[..., :k]
    s = jnp.take_along_axis(s, order, axis=-1)
    w = jnp.take_along_axis(w, order[..., :, None], axis=-2)
    s_floor = (32.0 * _EPS32) * s[..., :1]
    keep = s > s_floor
    s = jnp.where(keep, s, 0.0)
    inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    return w, s, inv


def _jacobi_u_s(m: jax.Array, sweeps: int, k: int):
    """Kernel run + sort + truncate to k: returns (u_k, s_k, inv_k, mb,
    batch_shape) with u_k (B, n, k) isometric columns."""
    n = m.shape[-1]
    assert m.shape[-2] == n and n % 2 == 0
    batch_shape = m.shape[:-2]
    mb = m.reshape((-1, n, n))
    b = mb.shape[0]
    chunk = _pick_chunk(max(b, 1), n)
    b_pad = -(-b // chunk) * chunk
    mb_pad = mb
    if b_pad != b:
        mb_pad = jnp.concatenate(
            [mb, jnp.zeros((b_pad - b, n, n), mb.dtype)], axis=0
        )
    # Transpose so columns become rows (lane dim = original row index).
    mt = jnp.swapaxes(mb_pad, -1, -2)
    m_re = jnp.real(mt).astype(jnp.float32)
    m_im = jnp.imag(mt).astype(jnp.float32)

    w_re, w_im = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
    w_re, w_im = w_re[:b], w_im[:b]

    cdtype = mb.dtype if jnp.iscomplexobj(mb) else jnp.complex64
    w, s, inv = _sort_guard_top_k(w_re, w_im, k, cdtype)
    u = jnp.swapaxes(w * inv[..., :, None].astype(w.dtype), -1, -2)
    return u, s, inv, mb, batch_shape


@partial(jax.jit, static_argnums=(1, 2))
def jacobi_svd_pallas(
    m: jax.Array, sweeps: int = DEFAULT_SWEEPS, sort: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched SVD with the Pallas Jacobi kernel; same contract as
    :func:`aqc_research_tpu.ops.jacobi_svd.jacobi_svd` (f32/c64 only),
    except that singular values below the relative noise floor (32*eps *
    s_max — below f32 resolution anyway) come back as EXACT zeros with
    zeroed factor columns (see the guard in ``_jacobi_u_s``).

    ``m``: (..., n, n) complex64 (or float32), n even; n a multiple of the
    128 VPU lane width is the efficient case.  Leading axes are flattened
    into the batch (padded to the kernel's chunk size)."""
    del sort  # always sorted
    n = m.shape[-1]
    u, s, inv, mb, batch_shape = _jacobi_u_s(m, sweeps, n)
    # Right factor recovered on the MXU: vh = diag(1/s) u^H m — the same
    # recovery the gram path uses; exact for exact u, and zero rows for
    # masked/zero singular values.
    vh = inv[..., :, None].astype(u.dtype) * jnp.einsum(
        "...ji,...jk->...ik", jnp.conj(u), mb
    )
    return (
        u.reshape(batch_shape + (n, n)),
        s.reshape(batch_shape + (n,)),
        vh.reshape(batch_shape + (n, n)),
    )


@partial(jax.jit, static_argnums=(1, 2))
def jacobi_svd_pallas_top_k(
    m: jax.Array, k: int, sweeps: int = DEFAULT_SWEEPS
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k truncated SVD via the Pallas kernel (the MPS pair-update shape:
    k = chi, n = 2*chi)."""
    n = m.shape[-1]
    u, s, inv, mb, batch_shape = _jacobi_u_s(m, sweeps, k)
    vh = inv[..., :, None].astype(u.dtype) * jnp.einsum(
        "...ji,...jk->...ik", jnp.conj(u), mb
    )
    return (
        u.reshape(batch_shape + (n, k)),
        s.reshape(batch_shape + (k,)),
        vh.reshape(batch_shape + (k, n)),
    )
