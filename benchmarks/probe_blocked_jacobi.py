"""TPU probe: blocked (MXU) Jacobi vs the Pallas VPU Jacobi kernel.

The VERDICT r2 item 1(c) measurement: one MXU-friendly decomposition
prototype (ops/blocked_jacobi.py) against the production VPU kernel
(ops/pallas_jacobi.py) at the MPS pair-update shapes (10, 128, 128) and
(10, 256, 256), on BOTH random matrices and graded decaying spectra
(the measured round-2/3 trap: random-matrix probes misstate adaptive-
decomposition costs — real pair matrices have decaying spectra).

Both paths run their own ADAPTIVE sweep loops (identical convergence
measure and tolerance); the probe also reports the adaptive outer-sweep
counts so the cost model is checkable.

Usage: python benchmarks/probe_blocked_jacobi.py
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

from aqc_research_tpu.ops.blocked_jacobi import (
    blocked_jacobi_svd_top_k,
    blocked_jacobi_sweeps_used,
)
from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used
from aqc_research_tpu.ops.pallas_jacobi import jacobi_svd_pallas_top_k
from aqc_research_tpu.utils import from_host, to_host


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _graded(rng, batch, n, rate):
    """Batch of matrices with geometric singular spectra (the real MPS
    pair-matrix class: a handful of O(1) values then exponential decay)."""
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


def main():
    batch = 10
    rng = np.random.default_rng(0)
    for n in (128, 256):
        k = n // 2
        for label, m_np in (
            ("random", _rand_c(rng, batch, n, n)),
            ("graded(0.05)", _graded(rng, batch, n, 0.05)),
            ("graded(0.15)", _graded(rng, batch, n, 0.15)),
        ):
            m = from_host(
                m_np.astype(np.complex64 if is_tpu() else np.complex128)
            )
            print(f"(b={batch}, n={n}) {label}:", flush=True)

            @jax.jit
            def f_pallas(m):
                u, s, vh = jacobi_svd_pallas_top_k(m, k)
                return jnp.linalg.norm(s)

            @jax.jit
            def f_blocked(m):
                u, s, vh = blocked_jacobi_svd_top_k(m, k)
                return jnp.linalg.norm(s)

            t_p = bench("pallas VPU jacobi", f_pallas, m)
            t_b = bench("blocked MXU jacobi", f_blocked, m)
            sw_p = int(jacobi_sweeps_used(m))
            sw_b = int(blocked_jacobi_sweeps_used(m))
            print(
                f"  adaptive sweeps: scalar {sw_p}, blocked outer {sw_b}; "
                f"blocked/pallas time {t_b / t_p:.2f}x",
                flush=True,
            )

            # accuracy cross-check vs LAPACK best rank-k
            u, s, vh = blocked_jacobi_svd_top_k(m, k)
            u, s, vh = to_host(u), to_host(s), to_host(vh)
            uu, ss, vv = np.linalg.svd(m_np)
            best = (uu[..., :k] * ss[..., None, :k]) @ vv[..., :k, :]
            rec = (u * s[..., None, :]) @ vh
            err = np.max(np.abs(rec - best)) / np.max(np.abs(best))
            print(f"  blocked rank-{k} rec rel-err vs LAPACK: {err:.2e}")
            print()


if __name__ == "__main__":
    main()
