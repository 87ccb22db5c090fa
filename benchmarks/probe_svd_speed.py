"""Microbenchmark of truncated-SVD strategies for the MPS pair update on TPU.

The MPS sweep cost is dominated by batched (pairs, 2*chi, 2*chi) complex
truncated SVDs.  Candidates:

  svd    — jnp.linalg.svd (QDWH-SVD on TPU)
  gram   — eigh(M^H M) (native complex eigh) + matmul recovery of U,S,Vh
  embed  — ops/svd_tpu.svd_top_k (real-embedding eigh + sequential MGS)
  qr     — jnp.linalg.qr (for reference: cost of one orthonormalization)

Each timing FETCHES a scalar derived from the result (execution proof).
Usage: python benchmarks/probe_svd_speed.py [batch] [dim] [k]
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

from aqc_research_tpu.ops.svd_tpu import svd_top_k
from aqc_research_tpu.utils import from_host


def bench(name, fn, *args, repeats=20):
    out = fn(*args)
    val = float(np.asarray(out)[0])  # fetch — proves execution
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"{name:8s}: {dt * 1e3:9.3f} ms/call   check={val:.6f}", flush=True)
    return dt


def main(batch: int = 10, dim: int = 128, k: int = 64):
    rng = np.random.default_rng(0)
    m_np = rng.standard_normal((batch, dim, dim)) + 1j * rng.standard_normal(
        (batch, dim, dim)
    )
    m = from_host(m_np.astype(np.complex64 if is_tpu() else np.complex128))
    s_ref = np.linalg.svd(m_np, compute_uv=False)[:, :k]

    @jax.jit
    def f_svd(m):
        u, s, vh = jnp.linalg.svd(m, full_matrices=False)
        r = (u[..., :k] * s[..., None, :k]) @ vh[..., :k, :]
        return jnp.linalg.norm(s[..., :k]).reshape(1), r

    @jax.jit
    def f_gram(m):
        g = jnp.einsum("bij,bkj->bik", m, m.conj())  # M M^H
        w, u = jnp.linalg.eigh(g)  # ascending
        w = w[..., ::-1][..., :k]
        u = u[..., ::-1][..., :k]
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        sinv = jnp.where(s > 1e-30, 1.0 / jnp.maximum(s, 1e-30), 0.0)
        vh = sinv[..., None] * jnp.einsum("bji,bjk->bik", u.conj(), m)
        r = (u * s[..., None, :]) @ vh
        return jnp.linalg.norm(s).reshape(1), r

    v_embed = jax.jit(jax.vmap(lambda mm: svd_top_k(mm, k)))

    @jax.jit
    def f_embed(m):
        u, s, vh = v_embed(m)
        r = (u * s[..., None, :]) @ vh
        return jnp.linalg.norm(s).reshape(1), r

    @jax.jit
    def f_qr(m):
        q, r = jnp.linalg.qr(m)
        return jnp.linalg.norm(jnp.diagonal(r, axis1=-2, axis2=-1).real).reshape(1)

    results = {}
    for name, fn in [("svd", f_svd), ("gram", f_gram), ("embed", f_embed)]:
        g = jax.jit(lambda m, fn=fn: fn(m)[0])
        results[name] = bench(name, g, m)
        # accuracy of singular values + rank-k reconstruction vs LAPACK
        _, rec = fn(m)
        from aqc_research_tpu.utils import to_host

        rec = to_host(rec)
        uu, ss, vv = np.linalg.svd(m_np)
        best = (uu[..., :k] * ss[..., None, :k]) @ vv[..., :k, :]
        err = np.max(np.abs(rec - best)) / np.max(np.abs(best))
        print(f"         rank-{k} reconstruction rel-err vs LAPACK: {err:.2e}")
    bench("qr", f_qr, m)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
