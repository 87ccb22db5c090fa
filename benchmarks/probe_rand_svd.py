"""TPU probe: randomized-projection truncated SVD vs the plain Pallas Jacobi.

Measures ops/rand_svd.py (HMT range-finder on the MXU + the SAME Pallas
Jacobi kernel on the projected (k+16, 2chi) problem) against the production
kernel at the MPS pair-update shapes, on random AND graded decaying spectra
(the round-2/3 measurement trap: random-matrix probes misstate adaptive-
decomposition costs — real pair matrices have graded spectra; production
cuts sit at s_cut/s_max ~ 1e-3, between the 0.05 and 0.15 rates here).

Also cross-checks accuracy per matrix class: discarded-weight ratio vs the
LAPACK optimum (the metric the truncation actually commits) and top-k
singular-value error.

Usage: python benchmarks/probe_rand_svd.py [batch]
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
from aqc_research_tpu.ops.rand_svd import rand_svd_top_k
from aqc_research_tpu.utils import from_host, to_host


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _graded(rng, batch, n, rate):
    spec = np.exp(-rate * np.arange(n))
    out = np.empty((batch, n, n), complex)
    for b in range(batch):
        q1, _ = np.linalg.qr(_rand_c(rng, n, n))
        q2, _ = np.linalg.qr(_rand_c(rng, n, n))
        out[b] = (q1 * spec[None, :]) @ q2.conj().T
    return out


def bench(name, fn, m, repeats=30):
    out = fn(m)
    val = float(np.asarray(out).ravel()[0])  # fetch: execution proof
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(m)
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"  {name:24s}: {dt * 1e3:9.3f} ms/call   check={val:.5f}", flush=True)
    return dt


def accuracy(fn, m, m_np, k):
    u, s, vh = fn(m)
    u, s, vh = to_host(u), to_host(s), to_host(vh)
    uu, ss, vv = np.linalg.svd(m_np)
    best = (uu[..., :k] * ss[..., None, :k]) @ vv[..., :k, :]
    rec = (u * s[..., None, :]) @ vh
    dw_opt = np.linalg.norm(m_np - best, axis=(1, 2))
    dw = np.linalg.norm(m_np - rec, axis=(1, 2))
    s_err = np.max(np.abs(s - ss[..., :k]) / ss[..., :1])
    return float(np.max(dw / np.maximum(dw_opt, 1e-30))), float(s_err)


def main(batch: int = 10):
    rng = np.random.default_rng(0)
    for n in (128, 256):
        k = n // 2
        for label, m_np in (
            ("random", _rand_c(rng, batch, n, n)),
            ("graded(0.05)", _graded(rng, batch, n, 0.05)),
            ("graded(0.15)", _graded(rng, batch, n, 0.15)),
        ):
            m_np = m_np.astype(np.complex64 if is_tpu() else np.complex128)
            m = from_host(m_np)
            print(f"(b={batch}, n={n}) {label}:", flush=True)

            @jax.jit
            def f_jacobi(m):
                u, s, vh = jacobi_svd_pallas_top_k(m, k)
                return jnp.linalg.norm(s)

            @jax.jit
            def f_rand(m):
                u, s, vh = rand_svd_top_k(m, k)
                return jnp.linalg.norm(s)

            @jax.jit
            def f_rand_q2(m):
                u, s, vh = rand_svd_top_k(m, k, 12, None, 2)
                return jnp.linalg.norm(s)

            t_j = bench("pallas jacobi", f_jacobi, m)
            t_r = bench("rand (q=1)", f_rand, m)
            t_r2 = bench("rand (q=2)", f_rand_q2, m)
            dw_j, se_j = accuracy(lambda x: jacobi_svd_pallas_top_k(x, k), m, m_np, k)
            dw_r, se_r = accuracy(lambda x: rand_svd_top_k(x, k), m, m_np, k)
            print(
                f"  rand/jacobi time {t_r / t_j:.2f}x (q2 {t_r2 / t_j:.2f}x); "
                f"dw/opt jacobi {dw_j:.4f} rand {dw_r:.4f}; "
                f"s_relerr jacobi {se_j:.1e} rand {se_r:.1e}",
                flush=True,
            )
            print()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
