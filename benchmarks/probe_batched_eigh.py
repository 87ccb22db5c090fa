"""Probe: does JAX's QDWH divide-and-conquer eigh batch-vectorize on TPU?

jnp.linalg.eigh on this backend serializes over the batch (probe_decomp_
primitives.py).  jax._src.tpu.linalg.eigh.eigh has termination_size=256, so
128x128 inputs never enter the QR/matmul-composed D&C.  Here we force small
termination sizes and measure batched cost + accuracy.

Usage: python benchmarks/probe_batched_eigh.py
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
from jax._src.tpu.linalg.eigh import eigh as tpu_eigh

from aqc_research_tpu.utils import from_host


def bench(name, fn, *args, repeats=20):
    out = fn(*args)[0]  # real scalar only — complex fetch needs to_host
    val = float(np.asarray(out))
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)[0]
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"{name:34s}: {dt * 1e3:9.3f} ms/call   check={val:.4f}", flush=True)
    return dt


def main():
    n = 128
    rng = np.random.default_rng(0)
    for batch in (1, 10):
        m_np = rng.standard_normal((batch, n, n)) + 1j * rng.standard_normal(
            (batch, n, n)
        )
        g_np = m_np @ m_np.conj().transpose(0, 2, 1)
        dt = np.complex64 if is_tpu() else np.complex128
        g = from_host(g_np.astype(dt))
        w_ref = np.linalg.eigvalsh(g_np)

        @jax.jit
        def f_stock(g):
            w, v = jnp.linalg.eigh(g)
            return jnp.linalg.norm(w).reshape(1), w, v

        fns = {"stock jnp.eigh": f_stock}
        for term in (8, 16, 32, 64):
            def make(term):
                @jax.jit
                def f(g):
                    w, v = jax.vmap(
                        lambda gg: tpu_eigh(gg, termination_size=term)
                    )(g)
                    return jnp.linalg.norm(w).reshape(1), w, v
                return f
            fns[f"qdwh-dc term={term}"] = make(term)

        # top-half only (what the pair update needs)
        for term in (16, 32):
            def make_top(term):
                @jax.jit
                def f(g):
                    w, v = jax.vmap(
                        lambda gg: tpu_eigh(
                            gg,
                            termination_size=term,
                            subset_by_index=(n // 2, n),
                        )
                    )(g)
                    return jnp.linalg.norm(w).reshape(1), w, v
                return f
            fns[f"qdwh-dc top-half term={term}"] = make_top(term)

        for name, fn in fns.items():
            t = bench(f"{name} b={batch}", fn, g)
            _, w, v = fn(g)
            from aqc_research_tpu.utils import to_host

            w_h = to_host(w).real
            k = w_h.shape[-1]
            err_w = np.max(
                np.abs(np.sort(w_h, -1) - w_ref[:, -k:])
            ) / np.max(np.abs(w_ref))
            # residual || G v - v w ||
            v_h = to_host(v)
            res = np.max(
                np.abs(g_np @ v_h - v_h * w_h[:, None, :])
            ) / np.max(np.abs(w_ref))
            print(f"{'':34s}  eigval rel-err={err_w:.2e} resid={res:.2e}")
        print()


if __name__ == "__main__":
    main()
