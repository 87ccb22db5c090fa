"""Fused half-layer pair-update Pallas kernel (the round-3 "megakernel").

One ``pallas_call`` per half-layer phase computes, entirely in VMEM:

  1. the gated two-site theta matrices (transposed), built block-wise with
     f32 ``precision=HIGHEST`` MXU matmuls (bf16 MXU truncation compounds
     over deep circuits — measured, see config.py);
  2. the adaptive one-sided Jacobi sweeps (the SAME schedule/criterion as
     ops/pallas_jacobi.py — the loop is shared code);
  3. singular values, a stable descending rank (comparison matrix), and
     top-chi row selection expressed as a 0/1 permutation MATMUL (no
     gather/argsort ops);
  4. the discarded-weight truncation rule + the 32*eps noise-direction
     guard (same semantics as ops/mps._truncated_svd + _pair_update);
  5. the right-factor recovery vh = diag(1/s) u^H theta as MXU matmuls
     against the retained theta^T copy.

Motivation (RESULTS.md roofline): at 20q chi=64 the MPS obj+grad sweep ran
at 47% of the per-matrix-adaptive ideal; on-chip calibration showed the
adaptive/chunk-max share is ~3% — the rest was the ~30 small XLA ops
dispatched AROUND each of the ~18 kernel calls per sweep (theta einsums,
transpose + re/im splits, argsort/take_along_axis, the vh einsum, masks).
This kernel absorbs all of them; only the (cheap, fusable) input plane prep
and output reshape/scatter remain outside.

The replaced workload is the one the reference delegates to Aer's C++
truncated SVD per two-qubit gate (/root/reference/aqc_research/
mps_operations.py:251-257); here it is a single TPU program per half-layer
of disjoint pairs.

f32/c64 only (the TPU production mode); callers gate on dtype and fall back
to the unfused path (ops/mps._pair_update) otherwise.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_jacobi import _EPS32, _adaptive_seat_sweeps

_HI = jax.lax.Precision.HIGHEST

# VMEM bytes resident per matrix: inputs (32 chi^2) + theta^T scratch
# (32 chi^2) + Jacobi seat carries (32 chi^2) + outputs (~33 chi^2) +
# rank/perm/selection temporaries (~40 chi^2), plus pipeline buffering.
_PER_MATRIX_BYTES = 240
_VMEM_BUDGET = 10 * 1024 * 1024
_MAX_CHUNK = 8


def _pick_chunk(b: int, chi: int) -> int:
    from ..config import svd_chunk

    per_matrix = _PER_MATRIX_BYTES * chi * chi
    cmax = max(1, min(_MAX_CHUNK, _VMEM_BUDGET // per_matrix))
    override = svd_chunk()  # same adaptivity/overhead trade as pallas_jacobi
    if override is not None:
        cmax = max(1, min(cmax, override))
    n_chunks = -(-b // cmax)
    return -(-b // n_chunks)


def _dot(a, b):
    """f32 MXU matmul at full f32 precision.  Inside Mosaic the global
    jax_default_matmul_precision does NOT apply — without precision=HIGHEST
    the MXU truncates f32 inputs to bf16 (measured 2e-3 rel err,
    benchmarks/probe_mosaic_ops.py)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """a @ b.T on the MXU at full f32 precision (contracting dims (1, 1))."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _theta_build(
    chi, gate_ref, a_re_ref, a_im_ref, b_re_ref, b_im_ref, w0_re, w0_im
):
    """theta build: W0 = theta^T assembled block-wise on the MXU.

    a[u][b, a'] = g1[u, a', b] lam_l[a'] lam_c[b];  bm[v][c, b] = g2[v, b, c]
    lam_r[c].  M_uv = bm[v] @ a[u] = theta0[u, v]^T (the two-site tensor
    before the gate); the gate mixes the 4 blocks:
      W0[t*chi + c, s*chi + a'] = sum_uv gate[(s,t),(u,v)] M_uv[c, a'].

    ``gate_ref`` is the FULL (b_tot, 32) SMEM table (Mosaic constrains the
    last two dims of every BLOCK to be (8, 128)-divisible or full-size; an
    SMEM (chunk, 32) block violates that for ragged chunks, so the table
    rides in un-blocked and each program offsets by its grid position).
    ``w0_*`` may be scratch or output refs of shape (chunk, 2chi, 2chi).
    """
    chunk = a_re_ref.shape[0]
    base = pl.program_id(0) * chunk
    for i in range(chunk):
        m_re = {}
        m_im = {}
        for u in range(2):
            ar, ai = a_re_ref[i, u], a_im_ref[i, u]
            for v in range(2):
                br, bi = b_re_ref[i, v], b_im_ref[i, v]
                m_re[u, v] = _dot(br, ar) - _dot(bi, ai)
                m_im[u, v] = _dot(br, ai) + _dot(bi, ar)
        for s in range(2):
            for t in range(2):
                acc_re = jnp.zeros((chi, chi), jnp.float32)
                acc_im = jnp.zeros((chi, chi), jnp.float32)
                for u in range(2):
                    for v in range(2):
                        gidx = (s * 2 + t) * 4 + (u * 2 + v)
                        gr = gate_ref[base + i, gidx]
                        gi = gate_ref[base + i, 16 + gidx]
                        acc_re = acc_re + gr * m_re[u, v] - gi * m_im[u, v]
                        acc_im = acc_im + gr * m_im[u, v] + gi * m_re[u, v]
                w0_re[i, t * chi:(t + 1) * chi, s * chi:(s + 1) * chi] = acc_re
                w0_im[i, t * chi:(t + 1) * chi, s * chi:(s + 1) * chi] = acc_im


def _fused_kernel_body(
    chi: int,
    max_sweeps: int,
    thr2_ref,  # SMEM (1, 1): trunc_thr^2
    gate_ref,  # SMEM (b_tot, 32) FULL array: gate4 flat re[0:16] | im[16:32]
    a_re_ref, a_im_ref,  # VMEM (chunk, 2, chi, chi): lam-scaled g1^T planes
    b_re_ref, b_im_ref,  # VMEM (chunk, 2, chi, chi): lam_r-scaled g2^T planes
    ut_re_ref, ut_im_ref,  # out (chunk, chi, 2chi): u^T rows (masked, 1/s-scaled)
    vh_re_ref, vh_im_ref,  # out (chunk, chi, 2chi): vh rows (masked)
    lam_ref,  # out (chunk, 1, chi): truncated + rescaled singular values
    w0_re, w0_im,  # scratch (chunk, 2chi, 2chi): theta^T (kept for vh)
):
    chunk = a_re_ref.shape[0]
    n = 2 * chi

    # ---- 1. theta build (shared with the pass-A kernel of fused_rand) ----
    _theta_build(chi, gate_ref, a_re_ref, a_im_ref, b_re_ref, b_im_ref, w0_re, w0_im)

    # ---- 2. adaptive Jacobi sweeps (shared loop, identical criterion) ----
    wl_re, wl_im, wr_re, wr_im = _adaptive_seat_sweeps(
        w0_re[:, :chi, :], w0_im[:, :chi, :],
        w0_re[:, chi:, :], w0_im[:, chi:, :],
        max_sweeps,
    )

    # ---- 3. singular values + stable descending rank + top-chi select ----
    s2l = jnp.sum(wl_re * wl_re + wl_im * wl_im, axis=-1)  # (chunk, chi)
    s2r = jnp.sum(wr_re * wr_re + wr_im * wr_im, axis=-1)
    s2 = jnp.concatenate([s2l, s2r], axis=-1)  # (chunk, n)
    total2 = jnp.sum(s2, axis=-1, keepdims=True)  # (chunk, 1)

    # rank[l] = #{m : s2[m] > s2[l], or equal with m < l} — the stable
    # descending order argsort(-s) would produce, without a sort op.
    mi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s2m = s2[:, :, None]
    s2l_b = s2[:, None, :]
    before = jnp.logical_or(
        s2m > s2l_b, jnp.logical_and(s2m == s2l_b, (mi < li)[None, :, :])
    )
    # int32 throughout: Mosaic's tpu.iota only produces integer vectors.
    rank = jnp.sum(before.astype(jnp.int32), axis=1)  # (chunk, n)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chi, n), 0)
    perm = (rank[:, None, :] == k_iota[None, :, :]).astype(jnp.float32)

    # Sorted top-chi squared values, and the selected rows of the rotated
    # matrix via the 0/1 permutation matmul (rows split across the seats).
    s2s = jnp.sum(perm * s2[:, None, :], axis=-1)  # (chunk, chi)
    ws_re = []
    ws_im = []
    for i in range(chunk):
        p_l, p_r = perm[i, :, :chi], perm[i, :, chi:]
        ws_re.append(_dot(p_l, wl_re[i]) + _dot(p_r, wr_re[i]))
        ws_im.append(_dot(p_l, wl_im[i]) + _dot(p_r, wr_im[i]))
    ws_re_a = jnp.stack(ws_re)  # (chunk, chi, n)
    ws_im_a = jnp.stack(ws_im)

    # ---- 4. noise guard + discarded-weight truncation (squared forms) ----
    # Cancellation-robust tail (the ops/mps._truncation_mask_topk round-4
    # fix, same semantics): the SEEN part is a direct suffix sum of the
    # sorted squares (no subtraction), and only the below-chi remainder
    # uses total2 - sum(seen), noise-floored at 16 eps * total2 — the f32
    # resolution of the two summation orders.  The naive total2 - head
    # made keep/drop beyond the true rank a rounding coin flip on strongly
    # rank-deficient pair matrices (results/r4/theta_analyze.log).
    floor2 = (32.0 * _EPS32) ** 2 * s2s[:, :1]
    guard = s2s > floor2
    s2g = jnp.where(guard, s2s, 0.0)
    ge = (
        jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
    ).astype(jnp.float32)
    seen_tail2 = _dot(s2g, ge)  # [i, k] = sum_{l >= k} s2g[i, l]
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

    # ---- 5. outputs: u^T = inv * Ws ; vh = inv * conj(u^T) @ W0^T ----
    # Converged row k of Ws is s_k * u_k^T, so the u^H m recovery must use
    # the NORMALIZED rows (u^T) and then scale by inv once more — i.e. the
    # standard vh = diag(1/s) u^H m of ops/pallas_jacobi._jacobi_u_s.
    ut_re = ws_re_a * inv[:, :, None]
    ut_im = ws_im_a * inv[:, :, None]
    ut_re_ref[:] = ut_re
    ut_im_ref[:] = ut_im
    vh_re = []
    vh_im = []
    for i in range(chunk):
        w0r, w0i = w0_re[i], w0_im[i]
        vh_re.append(_dot_t(ut_re[i], w0r) + _dot_t(ut_im[i], w0i))
        vh_im.append(_dot_t(ut_re[i], w0i) - _dot_t(ut_im[i], w0r))
    vh_re_ref[:] = jnp.stack(vh_re) * inv[:, :, None]
    vh_im_ref[:] = jnp.stack(vh_im) * inv[:, :, None]


@partial(jax.jit, static_argnums=(6, 7, 8))
def _fused_pair_raw(
    thr2_arr, gate_planes, a_re, a_im, b_re, b_im,
    chi: int, sweeps: int, chunk: int,
):
    b_tot = a_re.shape[0]
    assert b_tot % chunk == 0
    n = 2 * chi
    kernel = partial(_fused_kernel_body, chi, sweeps)
    vspec4 = pl.BlockSpec(
        (chunk, 2, chi, chi), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_kn = jax.ShapeDtypeStruct((b_tot, chi, n), jnp.float32)
    # lam is (b_tot, 1, chi) so the BLOCK's last two dims are (1, chi) —
    # full-size in both — regardless of the (ragged) chunk; callers squeeze.
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
        out_shape=(out_kn, out_kn, out_kn, out_kn, out_l),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (b_tot, 32), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            vspec4, vspec4, vspec4, vspec4,
        ],
        out_specs=(spec_kn, spec_kn, spec_kn, spec_kn, spec_l),
        scratch_shapes=[
            pltpu.VMEM((chunk, n, n), jnp.float32),
            pltpu.VMEM((chunk, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(thr2_arr, gate_planes, a_re, a_im, b_re, b_im)


def _prep_planes(lam_l, lam_c, lam_r, g1, g2, gate4, chi: int, dtype):
    """Flattens the batch and builds the kernel input planes: lam-scaled
    transposed g1/g2 re/im f32 planes + the flat gate table (one fused XLA
    pass each).  Shared by the fused pair kernel and fused_rand's pass A."""
    batch_shape = g1.shape[:-3]
    b_count = int(np.prod(batch_shape)) if batch_shape else 1
    g1f = g1.reshape((b_count, 2, chi, chi))
    g2f = g2.reshape((b_count, 2, chi, chi))
    ll = jnp.broadcast_to(lam_l, batch_shape + (chi,)).reshape((b_count, chi))
    lc = jnp.broadcast_to(lam_c, batch_shape + (chi,)).reshape((b_count, chi))
    lr = jnp.broadcast_to(lam_r, batch_shape + (chi,)).reshape((b_count, chi))
    g4 = jnp.broadcast_to(
        jnp.asarray(gate4, dtype), batch_shape + (4, 4)
    ).reshape((b_count, 4, 4))

    a = (
        jnp.swapaxes(g1f, -1, -2)
        * lc[:, None, :, None].astype(dtype)
        * ll[:, None, None, :].astype(dtype)
    )
    bm = jnp.swapaxes(g2f, -1, -2) * lr[:, None, :, None].astype(dtype)
    a_re = jnp.real(a).astype(jnp.float32)
    a_im = jnp.imag(a).astype(jnp.float32)
    b_re = jnp.real(bm).astype(jnp.float32)
    b_im = jnp.imag(bm).astype(jnp.float32)
    gate_planes = jnp.concatenate(
        [
            jnp.real(g4).reshape(b_count, 16),
            jnp.imag(g4).reshape(b_count, 16),
        ],
        axis=-1,
    ).astype(jnp.float32)
    return batch_shape, b_count, ll, lr, a_re, a_im, b_re, b_im, gate_planes


def _theta_kernel_body(
    chi: int,
    gate_ref, a_re_ref, a_im_ref, b_re_ref, b_im_ref,
    w0_re_ref, w0_im_ref,  # out (chunk, 2chi, 2chi): theta^T planes
):
    _theta_build(
        chi, gate_ref, a_re_ref, a_im_ref, b_re_ref, b_im_ref,
        w0_re_ref, w0_im_ref,
    )


@partial(jax.jit, static_argnums=(5, 6))
def theta_build_raw(gate_planes, a_re, a_im, b_re, b_im, chi: int, chunk: int):
    """Pass-A kernel of the fused_rand route: the gated two-site theta^T
    planes, built in VMEM exactly as the fused pair kernel's step 1 (same
    code).  Inputs are the padded ``_prep_planes`` outputs; returns
    (w0_re, w0_im) of shape (b_tot, 2chi, 2chi)."""
    b_tot = a_re.shape[0]
    assert b_tot % chunk == 0
    n = 2 * chi
    kernel = partial(_theta_kernel_body, chi)
    vspec4 = pl.BlockSpec(
        (chunk, 2, chi, chi), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_nn = jax.ShapeDtypeStruct((b_tot, n, n), jnp.float32)
    spec_nn = pl.BlockSpec(
        (chunk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=(b_tot // chunk,),
        out_shape=(out_nn, out_nn),
        in_specs=[
            pl.BlockSpec(
                (b_tot, 32), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            vspec4, vspec4, vspec4, vspec4,
        ],
        out_specs=(spec_nn, spec_nn),
        interpret=interpret,
    )(gate_planes, a_re, a_im, b_re, b_im)


def fused_pair_update(
    lam_l, lam_c, lam_r, g1, g2, gate4, chi: int, trunc_thr: float,
    dtype, rdtype, sweeps: int,
):
    """Drop-in fused computation of the body of ops.mps._pair_update.

    Same contract: ``lam_*`` (..., chi) real, ``g1/g2`` (..., 2, chi, chi)
    complex, ``gate4`` (..., 4, 4); returns (new_g1, new_g2, new_lam).
    f32/c64 only; ``trunc_thr`` must be a concrete float (it is a static
    jit argument everywhere in the MPS layer).
    """
    batch_shape, b_count, ll, lr, a_re, a_im, b_re, b_im, gate_planes = (
        _prep_planes(lam_l, lam_c, lam_r, g1, g2, gate4, chi, dtype)
    )
    thr2_arr = jnp.full((1, 1), float(trunc_thr) ** 2, jnp.float32)

    chunk = _pick_chunk(b_count, chi)
    b_pad = -(-b_count // chunk) * chunk
    if b_pad != b_count:
        pad = [(0, b_pad - b_count)] + [(0, 0)] * 3
        a_re, a_im = jnp.pad(a_re, pad), jnp.pad(a_im, pad)
        b_re, b_im = jnp.pad(b_re, pad), jnp.pad(b_im, pad)
        gate_planes = jnp.pad(gate_planes, [(0, b_pad - b_count), (0, 0)])

    ut_re, ut_im, vh_re, vh_im, lam = _fused_pair_raw(
        thr2_arr, gate_planes, a_re, a_im, b_re, b_im, chi, sweeps, chunk
    )
    ut_re, ut_im = ut_re[:b_count], ut_im[:b_count]
    vh_re, vh_im = vh_re[:b_count], vh_im[:b_count]
    lam = lam[:b_count]

    from .mps import _safe_inv

    utc = jax.lax.complex(ut_re, ut_im).astype(dtype)
    vhc = jax.lax.complex(vh_re, vh_im).astype(dtype)
    inv_l = _safe_inv(ll).astype(dtype)
    inv_r = _safe_inv(lr).astype(dtype)
    new_g1 = (
        jnp.swapaxes(utc, -1, -2).reshape((b_count, 2, chi, chi))
        * inv_l[:, None, :, None]
    )
    new_g2 = (
        jnp.swapaxes(vhc.reshape((b_count, chi, 2, chi)), -3, -2)
        * inv_r[:, None, None, :]
    )
    return (
        new_g1.reshape(batch_shape + (2, chi, chi)),
        new_g2.reshape(batch_shape + (2, chi, chi)),
        lam.astype(rdtype).reshape(batch_shape + (chi,)),
    )
