"""On-chip cost of batched LU vs Householder QR at the rand range-finder
shapes — decides whether an LU power-iteration normalizer (the
scikit-learn `randomized_svd` default, `power_iteration_normalizer="LU"`)
can replace the two intermediate stabilization QRs of
ops/rand_svd._range_project (stage budget: the 3 QRs are ~95% of the
range-finder middle, RESULTS.md "Rand-route stage budget").

Method matches probe_rand_injit_slope: each primitive runs inside ONE
jitted lax.scan at two iteration counts; the per-iteration cost is the
slope, so dispatch sync cancels.  The LU variant times the FULL
stabilization (LU + unit-trapezoid extract + inverse-permutation gather),
not just the factorization.

Usage: probe_lu_prim.py [b n ell] [--cpu]
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


def lu_stab(y: jax.Array) -> jax.Array:
    """P @ L of the partial-pivot LU of y (..., n, l): a bounded
    unit-lower-trapezoidal basis of span(y)."""
    n, ell = y.shape[-2], y.shape[-1]
    lu, _, perm = jax.lax.linalg.lu(y)
    l_fac = jnp.tril(lu, -1)[..., :, :ell] + jnp.eye(n, ell, dtype=lu.dtype)
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(l_fac, inv[..., None].astype(jnp.int32), axis=-2)


def qr_stab(y: jax.Array) -> jax.Array:
    return jnp.linalg.qr(y, mode="reduced")[0]


def slope_time(fn, y, k_lo=5, k_hi=55):
    def loop(k):
        @jax.jit
        def run(y0):
            def body(c, _):
                # re-normalize so the carry cannot blow up / denormal over iters
                out = fn(c)
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
    a = rng.standard_normal((b, n, ell)) + 1j * rng.standard_normal((b, n, ell))
    a = (a * np.logspace(0, -5, ell)[None, None, :]).astype(np.complex64)
    y = from_host(np.asarray(a))

    def lu_fact_only(y: jax.Array) -> jax.Array:
        # cost attribution: the getrf factorization + tril extract WITHOUT
        # the inverse-permutation gather (NOT span-correct; timing only)
        n, ell = y.shape[-2], y.shape[-1]
        lu, _, _ = jax.lax.linalg.lu(y)
        return jnp.tril(lu, -1)[..., :, :ell] + jnp.eye(n, ell, dtype=lu.dtype)

    def lu_perm_matmul(y: jax.Array) -> jax.Array:
        # permutation applied as a one-hot matmul (MXU) instead of a gather
        n, ell = y.shape[-2], y.shape[-1]
        lu, _, perm = jax.lax.linalg.lu(y)
        l_fac = jnp.tril(lu, -1)[..., :, :ell] + jnp.eye(n, ell, dtype=lu.dtype)
        onehot = (
            perm[..., None, :] == jnp.arange(n, dtype=perm.dtype)[:, None]
        ).astype(y.real.dtype)
        return jnp.einsum("...ij,...jk->...ik", onehot.astype(y.dtype), l_fac)

    for name, fn in [
        ("qr", qr_stab),
        ("lu_pl", lu_stab),
        ("lu_fact_only", lu_fact_only),
        ("lu_perm_matmul", lu_perm_matmul),
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
                )
            )
        except Exception as e:  # noqa: BLE001 — a TPU lowering gap is a result
            print(json.dumps({"prim": name, "error": repr(e)[:200]}))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:4]]
    main(*args)
