"""On-chip cost of batched shifted-CholeskyQR vs Householder QR at the
rand range-finder shapes — decides whether the two INTERMEDIATE
stabilizations of ops/rand_svd._range_project can ride the MXU.

Background (RESULTS.md "Rand-route stage budget"): the 3 Householder QRs
are ~95% of the range-finder middle and XLA's batched QR is already AT
the VPU roofline (the honest flop count is ~35 MFLOP/matrix incl. Q
formation), so a Pallas QR cannot beat it — the only lever is moving the
2nl^2 flops to the MXU.  CholeskyQR does exactly that: gram = Y^H Y
(MXU) + Cholesky of the small (l, l) gram + a triangular solve (blocked,
mostly MXU on TPU).  Plain CholQR is unstable at cond(Y) > ~eps^-1/2
(~3e3 in f32); the SHIFTED variant (Fukaya et al. 2020) stays
span-preserving at any f32-representable cond and bounds the output
condition, which is all an INTERMEDIATE power-leg stabilization needs
(the final basis stays Householder).

Method matches probe_lu_prim: each primitive inside ONE jitted lax.scan
at two iteration counts; per-iteration cost is the slope (dispatch sync
cancels).

Usage: probe_cholqr_prim.py [b n ell] [--cpu]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import set_precision

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
set_precision("fast")

import jax
import jax.numpy as jnp

from aqc_research_tpu.utils import from_host

_EPS32 = float(jnp.finfo(jnp.float32).eps)


def qr_stab(y: jax.Array) -> jax.Array:
    return jnp.linalg.qr(y, mode="reduced")[0]


def gram_only(y: jax.Array) -> jax.Array:
    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    # keep the scan carry shape (n, l): fold the gram back through y
    return jnp.einsum("...ij,...jk->...ik", y, g / jnp.maximum(
        jnp.abs(g).max(), 1.0
    ))


def chol_only(y: jax.Array) -> jax.Array:
    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    ell = g.shape[-1]
    tr = jnp.trace(g, axis1=-2, axis2=-1).real[..., None, None]
    gs = g + (16.0 * _EPS32) * tr * jnp.eye(ell, dtype=g.dtype)
    l_fac = jnp.linalg.cholesky(gs)
    # fold back through y to keep the carry shape
    return jnp.einsum("...ij,...jk->...ik", y, l_fac / jnp.maximum(
        jnp.abs(l_fac).max(), 1.0
    ))


def cholqr_stab(y: jax.Array) -> jax.Array:
    """One shifted CholeskyQR pass: Q = Y L^-H with L = chol(Y^H Y + sI).

    Span-preserving (right-multiplication by an invertible factor) at any
    f32 cond; the shift keeps the gram numerically PD.  Output cond is
    O(sqrt(cond(G)/shift-floor)) — bounded, which is what the next power
    leg needs; NOT orthonormal to working precision at high cond (the
    final Householder QR provides that)."""
    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    ell = g.shape[-1]
    tr = jnp.trace(g, axis1=-2, axis2=-1).real[..., None, None]
    gs = g + (16.0 * _EPS32) * tr * jnp.eye(ell, dtype=g.dtype)
    l_fac = jnp.linalg.cholesky(gs)
    yh = jnp.conj(jnp.swapaxes(y, -1, -2))
    sol = jax.scipy.linalg.solve_triangular(l_fac, yh, lower=True)
    return jnp.conj(jnp.swapaxes(sol, -1, -2))


def cholqr2_stab(y: jax.Array) -> jax.Array:
    """Two shifted passes: orthonormal to ~f32 at intermediate cond."""
    return cholqr_stab(cholqr_stab(y))


def chol_blocked_only(y: jax.Array) -> jax.Array:
    """chol_only with the static-unrolled blocked factorization
    (rand_svd._chol_blocked) in place of XLA's while_loop potrf."""
    from aqc_research_tpu.ops.rand_svd import _chol_blocked

    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    ell = g.shape[-1]
    tr = jnp.trace(g, axis1=-2, axis2=-1).real[..., None, None]
    gs = g + (16.0 * _EPS32) * tr * jnp.eye(ell, dtype=g.dtype)
    l_fac = _chol_blocked(gs)
    return jnp.einsum("...ij,...jk->...ik", y, l_fac / jnp.maximum(
        jnp.abs(l_fac).max(), 1.0
    ))


def cholqr_blocked_stab(y: jax.Array) -> jax.Array:
    """Full shifted-CholQR pass with blocked chol + blocked trisolve."""
    from aqc_research_tpu.ops.rand_svd import _chol_blocked, _tri_solve_blocked

    g = jnp.einsum("...ji,...jk->...ik", jnp.conj(y), y)
    ell = g.shape[-1]
    tr = jnp.trace(g, axis1=-2, axis2=-1).real[..., None, None]
    gs = g + (16.0 * _EPS32) * tr * jnp.eye(ell, dtype=g.dtype)
    l_fac = _chol_blocked(gs)
    yh = jnp.conj(jnp.swapaxes(y, -1, -2))
    sol = _tri_solve_blocked(l_fac, yh)
    return jnp.conj(jnp.swapaxes(sol, -1, -2))


def slope_time(fn, y, k_lo=5, k_hi=55):
    def loop(k):
        @jax.jit
        def run(y0):
            def body(c, _):
                out = fn(c)
                # re-normalize so the carry cannot blow up over iterations
                out = out / jnp.maximum(jnp.abs(out).max(), 1.0)
                return out[..., : y0.shape[-1]].astype(y0.dtype), ()

            c, _ = jax.lax.scan(body, y0, None, length=k)
            return jnp.sum(jnp.abs(c))

        v = float(run(y))  # fetch: proves execution (CLAUDE.md regime rule)
        tic = time.perf_counter()
        v = float(run(y))
        return time.perf_counter() - tic, v

    t_lo, _ = loop(k_lo)
    t_hi, v = loop(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo), v


def main(b=10, n=128, ell=72):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(b, n, ell)) + 1j * rng.normal(size=(b, n, ell))
    # graded columns: the conditioning regime the stabilizers actually see
    a = (a * np.logspace(0, -5, ell)[None, None, :]).astype(np.complex64)
    y = from_host(np.asarray(a))

    for name, fn in [
        ("qr", qr_stab),
        ("gram_only", gram_only),
        ("chol_only", chol_only),
        ("cholqr", cholqr_stab),
        ("cholqr2", cholqr2_stab),
        ("chol_blocked_only", chol_blocked_only),
        ("cholqr_blocked", cholqr_blocked_stab),
    ]:
        try:
            per, v = slope_time(fn, y)
            print(
                json.dumps(
                    {
                        "prim": name,
                        "b": b,
                        "n": n,
                        "ell": ell,
                        "ms_per_call": round(per * 1e3, 4),
                        "check": round(v, 2),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 - probe must report, not die
            print(json.dumps({"prim": name, "error": repr(exc)}), flush=True)


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:4]] if len(sys.argv) > 1 else []
    main(*args)
