"""Fused randomized-projection pair update (fused_rand): the rand SVD route
(ops/rand_svd.py) with both of its elementwise-op-heavy ends absorbed into
Pallas programs, mirroring what ops/fused_pair.py does for the plain Jacobi
route:

  pass A (Pallas)  theta build — the gated two-site theta^T planes assembled
                   block-wise on the MXU (the EXACT step-1 code of the fused
                   pair kernel, shared via fused_pair._theta_build);
  middle (XLA)     the HMT range-finder: sketch matmul, batched Householder
                   QR, power iteration, projection B = Q^H theta — large
                   MXU/QR ops XLA already runs well (measured ~free at the
                   pair shapes, benchmarks/probe_decomp_primitives.py);
  pass C (Pallas)  the reduced one-sided Jacobi (the SAME shared adaptive
                   seat-sweep loop), sort-free top-chi selection (rank by
                   pairwise comparison + 0/1 permutation matmul), the
                   noise-direction guard and the discarded-weight truncation
                   rule against the FULL theta weight, and the vh rows;
  tail (XLA)       u recovered by ONE MXU matmul against theta (the same
                   recovery as rand_svd), then the Vidal gauge scalings.

The truncation semantics need care: the kernel only sees the top-l projected
problem, but the discarded-weight rule and the norm rescale are defined
against the FULL theta Frobenius weight (ops/mps._pair_update) — pass A's
output provides it (one XLA reduction), and it rides into pass C in SMEM.

Same contract as ops/fused_pair.fused_pair_update; selected by
ops/mps._pair_update when ``svd_impl() == "rand"``, the fused-rand policy is
enabled for this chi (config.fused_rand_enabled — auto on TPU at every
chi >= 8, because the unfused rand route has a known TPU-only
mid-optimization failure, RESULTS.md round-4), and the matrix is large
enough for the projection to pay (rand_svd.RAND_MIN_N).  f32/c64 only.

Replaced reference workload: the per-gate Aer C++ truncated SVD,
/root/reference/aqc_research/mps_operations.py:251-257.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_jacobi import _EPS32, _adaptive_seat_sweeps, _pick_chunk
from .fused_pair import _dot, _prep_planes, _pick_chunk as _pick_chunk_theta, theta_build_raw
from .rand_svd import _POWER_ITERS, _range_project, rand_ell


def _rand_tail_kernel_body(
    chi: int,
    ell: int,
    max_sweeps: int,
    thr2_ref,  # SMEM (1, 1): trunc_thr^2
    tot2_ref,  # SMEM (b_tot, 1) FULL: full theta Frobenius^2 per matrix
    m_re_ref, m_im_ref,  # VMEM (chunk, l, n): conj(B) planes (row j = col j of B^H)
    vh_re_ref, vh_im_ref,  # out (chunk, chi, n): vh rows (masked)
    lam_ref,  # out (chunk, 1, chi): truncated + rescaled singular values
    inv_ref,  # out (chunk, 1, chi): mask-safe 1/s (for the XLA u recovery)
):
    chunk = m_re_ref.shape[0]
    p = ell // 2
    base = pl.program_id(0) * chunk

    # ---- 1. adaptive Jacobi on the l reduced columns (shared loop) ----
    wl_re, wl_im, wr_re, wr_im = _adaptive_seat_sweeps(
        m_re_ref[:, :p, :], m_im_ref[:, :p, :],
        m_re_ref[:, p:, :], m_im_ref[:, p:, :],
        max_sweeps,
    )

    # ---- 2. singular values + stable descending rank + top-chi select ----
    # MOSAIC ALIGNMENT CONTRACT (Aug-19 toolchain): every lane-axis vector
    # in this block must be n(=2chi, 128-multiple)-wide.  The natural
    # widths here are ell = chi+oversample (e.g. 72, 136) and the original
    # ell-lane formulation compiled on the earlier toolchain but now dies
    # with "Invalid relayout: non-singleton logical dimension is
    # replicated in destination but not in source" — so the squared
    # values are PADDED to n lanes with a -1 sentinel (every real square
    # is >= 0, so sentinels rank strictly last and are never selected),
    # which makes the rank/perm block shape-identical to the proven
    # fused_pair kernel (ops/fused_pair.py:157-196).
    n = m_re_ref.shape[-1]
    s2l = jnp.sum(wl_re * wl_re + wl_im * wl_im, axis=-1)  # (chunk, p)
    s2r = jnp.sum(wr_re * wr_re + wr_im * wr_im, axis=-1)
    parts = [s2l, s2r]
    if n > ell:
        parts.append(jnp.full((chunk, n - ell), -1.0, jnp.float32))
    s2 = jnp.concatenate(parts, axis=-1)
    # (chunk, n): squares on [0, ell), -1 sentinels on [ell, n)

    mi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s2m = s2[:, :, None]
    s2l_b = s2[:, None, :]
    before = jnp.logical_or(
        s2m > s2l_b, jnp.logical_and(s2m == s2l_b, (mi < li)[None, :, :])
    )
    rank = jnp.sum(before.astype(jnp.int32), axis=1)  # (chunk, n)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chi, n), 0)
    perm = (rank[:, None, :] == k_iota[None, :, :]).astype(jnp.float32)

    ws_re = []
    ws_im = []
    for i in range(chunk):
        p_l, p_r = perm[i, :, :p], perm[i, :, p:ell]
        ws_re.append(_dot(p_l, wl_re[i]) + _dot(p_r, wr_re[i]))
        ws_im.append(_dot(p_l, wl_im[i]) + _dot(p_r, wr_im[i]))
    ws_re_a = jnp.stack(ws_re)  # (chunk, chi, n)
    ws_im_a = jnp.stack(ws_im)
    # Selected sorted squares via the n-lane perm reduce — the EXACT op of
    # fused_pair.py:179, which this toolchain compiles (sentinel columns
    # contribute 0 * (-1) = 0).  Two formulations that fail here with
    # "Invalid relayout" on the Aug-19 Mosaic: reducing the ell(=chi+8)-
    # lane axis (non-128-aligned), and reducing a jnp.stack result (its
    # layout carries an implicit leading dim, the "-1" in the error).
    s2s = jnp.sum(perm * s2[:, None, :], axis=-1)  # (chunk, chi)

    # ---- 3. noise guard + discarded-weight truncation vs FULL weight ----
    # Cancellation-robust tail (the ops/mps._truncation_mask_topk round-4
    # fix): the SEEN part is a direct suffix sum of the sorted squares,
    # and the unseen remainder (here: the projected-out theta tail PLUS
    # the below-chi reduced values) uses the subtraction noise-floored at
    # 16 eps * total2 — the naive total2 - head made keep/drop beyond the
    # true rank a rounding coin flip on rank-deficient pair matrices.
    floor2 = (32.0 * _EPS32) ** 2 * s2s[:, :1]
    guard = s2s > floor2
    s2g = jnp.where(guard, s2s, 0.0)
    ge = (
        jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
    ).astype(jnp.float32)
    seen_tail2 = _dot(s2g, ge)  # [i, k] = sum_{l >= k} s2g[i, l]
    # total2 is the FULL theta weight (incl. the projected-out tail), so the
    # rule and the rescale match the unprojected _pair_update semantics.
    total2 = jnp.concatenate(
        [jnp.full((1, 1), tot2_ref[base + i, 0], jnp.float32) for i in range(chunk)],
        axis=0,
    )  # (chunk, 1)
    rest2 = jnp.maximum(
        total2 - jnp.sum(s2s, axis=-1, keepdims=True) - 16.0 * _EPS32 * total2,
        0.0,
    )
    tail2 = seen_tail2 + rest2
    thr2 = thr2_ref[0, 0]
    keep = jnp.logical_and(tail2 > thr2 * total2, guard)

    kept2 = jnp.sum(jnp.where(keep, s2s, 0.0), axis=-1, keepdims=True)
    rescale = jnp.sqrt(total2 / jnp.maximum(kept2, 1e-38))
    s_sorted = jnp.sqrt(s2s)
    lam_ref[:] = jnp.where(keep, s_sorted * rescale, 0.0)[:, None, :]
    inv = jnp.where(keep, 1.0 / jnp.maximum(s_sorted, 1e-38), 0.0)
    inv_ref[:] = inv[:, None, :]

    # ---- 4. vh rows: row k of W is (s_k u_k)^T of M = B^H, so vh_B =
    # conj(W)/s — already orthonormal to the kernel residual (rand_svd) ----
    vh_re_ref[:] = ws_re_a * inv[:, :, None]
    vh_im_ref[:] = -(ws_im_a * inv[:, :, None])


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _rand_tail_raw(
    thr2_arr, tot2_arr, m_re, m_im,
    chi: int, ell: int, sweeps: int, chunk: int,
):
    b_tot, _, n = m_re.shape
    assert b_tot % chunk == 0
    kernel = partial(_rand_tail_kernel_body, chi, ell, sweeps)
    spec_ln = pl.BlockSpec(
        (chunk, ell, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_kn = jax.ShapeDtypeStruct((b_tot, chi, n), jnp.float32)
    out_l = jax.ShapeDtypeStruct((b_tot, 1, chi), jnp.float32)
    spec_kn = pl.BlockSpec(
        (chunk, chi, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_l = pl.BlockSpec(
        (chunk, 1, chi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=(b_tot // chunk,),
        out_shape=(out_kn, out_kn, out_l, out_l),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (b_tot, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            spec_ln, spec_ln,
        ],
        out_specs=(spec_kn, spec_kn, spec_l, spec_l),
        interpret=interpret,
    )(thr2_arr, tot2_arr, m_re, m_im)


def fused_rand_pair_update(
    lam_l, lam_c, lam_r, g1, g2, gate4, chi: int, trunc_thr: float,
    dtype, rdtype, sweeps: int,
):
    """Drop-in fused-rand computation of the body of ops.mps._pair_update
    (same contract as fused_pair.fused_pair_update; see module docstring)."""
    from .mps import _safe_inv

    batch_shape, b_count, ll, lr, a_re, a_im, b_re, b_im, gate_planes = (
        _prep_planes(lam_l, lam_c, lam_r, g1, g2, gate4, chi, dtype)
    )
    n = 2 * chi
    ell = rand_ell(n, chi)
    assert ell % 8 == 0, "fused_rand requires a sublane-aligned sketch width"

    # ---- pass A: theta^T planes in one Pallas program ----
    chunk_a = _pick_chunk_theta(b_count, chi)
    b_pad = -(-b_count // chunk_a) * chunk_a
    if b_pad != b_count:
        pad4 = [(0, b_pad - b_count)] + [(0, 0)] * 3
        a_re, a_im = jnp.pad(a_re, pad4), jnp.pad(a_im, pad4)
        b_re, b_im = jnp.pad(b_re, pad4), jnp.pad(b_im, pad4)
        gate_planes = jnp.pad(gate_planes, [(0, b_pad - b_count), (0, 0)])
    w0_re, w0_im = theta_build_raw(
        gate_planes, a_re, a_im, b_re, b_im, chi, chunk_a
    )
    w0_re, w0_im = w0_re[:b_count], w0_im[:b_count]

    # ---- middle: range-finder + projection on theta = W0^T (XLA) ----
    a = jnp.swapaxes(jax.lax.complex(w0_re, w0_im), -1, -2).astype(jnp.complex64)
    total2 = jnp.sum(w0_re * w0_re + w0_im * w0_im, axis=(-2, -1))  # (b,)
    bm = _range_project(a, ell, _POWER_ITERS)  # (b, l, n)
    m_re = jnp.real(bm).astype(jnp.float32)
    m_im = -jnp.imag(bm).astype(jnp.float32)

    # ---- pass C: reduced Jacobi + truncation + vh rows ----
    thr2_arr = jnp.full((1, 1), float(trunc_thr) ** 2, jnp.float32)
    # CHUNK FLOOR 2 (Aug-19 Mosaic): at chunk=1 the tail kernel's
    # lane-axis reduces produce (1, chi) vectors whose layout carries an
    # implicit leading dim, and the toolchain rejects the relayout
    # ("Invalid relayout: non-singleton logical dimension is replicated
    # in destination but not in source") — measured: chunk=2 compiles and
    # runs, chunk=1 dies, byte-identical kernel otherwise.  Cost: the
    # shared adaptive loop pays max-of-2 sweep counts (round-3 chunk data
    # bounds this ~5%).  Override for future toolchains via
    # AQC_TPU_RAND_TAIL_CHUNK.
    _tail_floor = int(os.environ.get("AQC_TPU_RAND_TAIL_CHUNK", "2"))
    chunk_c = max(_tail_floor, _pick_chunk(b_count, ell, rows=n))
    b_pad = -(-b_count // chunk_c) * chunk_c
    tot2_arr = total2[:, None].astype(jnp.float32)
    if b_pad != b_count:
        pad3 = [(0, b_pad - b_count), (0, 0), (0, 0)]
        m_re, m_im = jnp.pad(m_re, pad3), jnp.pad(m_im, pad3)
        # Padded total2 must be nonzero: an all-zero padded matrix with
        # total2=0 divides 0/0 in the truncation rule.
        tot2_arr = jnp.pad(
            tot2_arr, [(0, b_pad - b_count), (0, 0)], constant_values=1.0
        )
    vh_re, vh_im, lam, inv = _rand_tail_raw(
        thr2_arr, tot2_arr, m_re, m_im, chi, ell, sweeps, chunk_c
    )
    vh_re, vh_im = vh_re[:b_count], vh_im[:b_count]
    lam = lam[:b_count, 0]  # (b, chi)
    inv = inv[:b_count, 0]

    # ---- tail: u = theta vh^H diag(1/s) on the MXU + gauge scalings ----
    vh = jax.lax.complex(vh_re, vh_im).astype(dtype)
    u = jnp.einsum("...ij,...kj->...ik", a.astype(dtype), jnp.conj(vh))
    u = u * inv[..., None, :].astype(dtype)

    inv_l = _safe_inv(ll).astype(dtype)
    inv_r = _safe_inv(lr).astype(dtype)
    new_g1 = u.reshape((b_count, 2, chi, chi)) * inv_l[:, None, :, None]
    new_g2 = (
        jnp.swapaxes(vh.reshape((b_count, chi, 2, chi)), -3, -2)
        * inv_r[:, None, None, :]
    )
    return (
        new_g1.reshape(batch_shape + (2, chi, chi)),
        new_g2.reshape(batch_shape + (2, chi, chi)),
        lam.astype(rdtype).reshape(batch_shape + (chi,)),
    )
