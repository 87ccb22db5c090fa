"""TPU probe: Pallas Jacobi SVD vs stock eigh-based gram SVD.

Measures the batched truncated-SVD cost at the MPS pair-update shape
(n = 2*chi = 128, k = chi = 64) across batch sizes, plus accuracy vs LAPACK.

Usage: python benchmarks/probe_pallas_jacobi.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision

set_precision("fast" if is_tpu() else "high")

import jax
import jax.numpy as jnp

from aqc_research_tpu.ops.pallas_jacobi import jacobi_svd_pallas_top_k
from aqc_research_tpu.utils import from_host, to_host


def bench(name, fn, *args, repeats=20):
    out = fn(*args)
    val = float(np.asarray(out))
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"{name:30s}: {dt * 1e3:9.3f} ms/call   check={val:.4f}", flush=True)
    return dt


def main():
    n, k = 128, 64
    rng = np.random.default_rng(0)
    for batch in (1, 10, 40, 80):
        m_np = rng.standard_normal((batch, n, n)) + 1j * rng.standard_normal(
            (batch, n, n)
        )
        m = from_host(m_np.astype(np.complex64 if is_tpu() else np.complex128))

        @jax.jit
        def f_gram(m):
            g = jnp.einsum("bij,bkj->bik", m, m.conj())
            w, u = jnp.linalg.eigh(g)
            w = w[..., ::-1][..., :k]
            u = u[..., ::-1][..., :k]
            s = jnp.sqrt(jnp.maximum(w, 0.0))
            return jnp.linalg.norm(s)

        @jax.jit
        def f_jacobi(m):
            u, s, vh = jacobi_svd_pallas_top_k(m, k)
            return jnp.linalg.norm(s)

        t_g = bench(f"gram-eigh b={batch}", f_gram, m)
        t_j = bench(f"pallas-jacobi b={batch}", f_jacobi, m)
        print(f"  speedup: {t_g / t_j:.2f}x")

        u, s, vh = jacobi_svd_pallas_top_k(m, k)
        u, s, vh = to_host(u), to_host(s), to_host(vh)
        uu, ss, vv = np.linalg.svd(m_np)
        best = (uu[..., :k] * ss[..., None, :k]) @ vv[..., :k, :]
        rec = (u * s[..., None, :]) @ vh
        err = np.max(np.abs(rec - best)) / np.max(np.abs(best))
        orth = np.max(
            np.abs(np.einsum("bji,bjk->bik", u.conj(), u) - np.eye(k))
        )
        print(f"  rank-{k} rec rel-err vs LAPACK: {err:.2e}  orthU: {orth:.2e}")
        print()


if __name__ == "__main__":
    main()
