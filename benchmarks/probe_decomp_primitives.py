"""Primitive-cost probe for batched-decomposition design (round 2).

Measures, on the real TPU, the per-call cost of every primitive a batched
truncated decomposition could be composed of, across sizes and batch counts:

  eigh    — jnp.linalg.eigh on complex Hermitian (the current bottleneck)
  qr      — jnp.linalg.qr (reduced) on complex
  chol    — jnp.linalg.cholesky on complex HPD
  trisolve— triangular solve against a full RHS
  mm      — one complex matmul (b, n, n) x (b, n, n)
  ns20    — 20 Newton-Schulz-style matmul iterations (pure-matmul chain;
            measures long in-program op chains / MXU throughput)

Each timing fetches a scalar (execution proof).  Usage:
  python benchmarks/probe_decomp_primitives.py
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

from aqc_research_tpu.utils import from_host


def bench(name, fn, *args, repeats=30):
    out = fn(*args)
    val = float(np.asarray(out)[0])
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"{name:24s}: {dt * 1e3:9.3f} ms/call   check={val:.4f}", flush=True)
    return dt


def make_mats(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((batch, n, n)) + 1j * rng.standard_normal((batch, n, n))
    dt = np.complex64 if is_tpu() else np.complex128
    return from_host(m.astype(dt))


def main():
    for n in (32, 64, 128, 256):
        for batch in (1, 4, 10):
            m = make_mats(batch, n)

            @jax.jit
            def f_eigh(m):
                g = jnp.einsum("bij,bkj->bik", m, m.conj())
                w, u = jnp.linalg.eigh(g)
                return jnp.linalg.norm(w).reshape(1)

            @jax.jit
            def f_qr(m):
                q, r = jnp.linalg.qr(m)
                return jnp.linalg.norm(
                    jnp.diagonal(r, axis1=-2, axis2=-1).real
                ).reshape(1)

            @jax.jit
            def f_chol(m):
                g = jnp.einsum("bij,bkj->bik", m, m.conj())
                g = g + 1e-3 * jnp.eye(g.shape[-1], dtype=g.dtype)
                c = jnp.linalg.cholesky(g)
                return jnp.linalg.norm(
                    jnp.diagonal(c, axis1=-2, axis2=-1).real
                ).reshape(1)

            @jax.jit
            def f_trisolve(m):
                g = jnp.einsum("bij,bkj->bik", m, m.conj())
                g = g + 1e-3 * jnp.eye(g.shape[-1], dtype=g.dtype)
                c = jnp.linalg.cholesky(g)
                x = jax.lax.linalg.triangular_solve(
                    c, m, left_side=True, lower=True
                )
                return jnp.linalg.norm(x.real).reshape(1)

            @jax.jit
            def f_mm(m):
                return jnp.linalg.norm(
                    jnp.einsum("bij,bjk->bik", m, m).real
                ).reshape(1)

            @jax.jit
            def f_ns20(m):
                # 20 iterations, 2 complex matmuls each: x <- 1.5x - 0.5 x x^H x
                x = m / jnp.linalg.norm(m, axis=(-2, -1), keepdims=True)

                def body(_, x):
                    y = jnp.einsum("bji,bjk->bik", x.conj(), x)
                    return 1.5 * x - 0.5 * jnp.einsum("bij,bjk->bik", x, y)

                x = jax.lax.fori_loop(0, 20, body, x)
                return jnp.linalg.norm(x.real).reshape(1)

            tag = f"n={n} b={batch}"
            bench(f"eigh {tag}", f_eigh, m)
            bench(f"qr {tag}", f_qr, m)
            bench(f"chol {tag}", f_chol, m)
            bench(f"trisolve {tag}", f_trisolve, m)
            bench(f"mm {tag}", f_mm, m)
            bench(f"ns20(40mm) {tag}", f_ns20, m)
            print()


if __name__ == "__main__":
    main()
