"""On-chip probe: Pallas Jacobi kernel throughput vs VMEM chunk size.

Difficulty-sorted sub-chunking (probe_chunk_schedule.py) pays less of the
shared-while-loop chunk-max overhead the SMALLER the chunk — but each grid
step re-runs the phase loop on less data, so per-op overhead rises.  This
probe measures the marginal per-sweep cost per matrix of
``_jacobi_pallas_raw`` at several chunk sizes, at the two production pair
shapes (n = 2*chi = 128, 256).  The net win of a schedule is

    (paid-sweep ratio from probe_chunk_schedule) x (efficiency ratio here).

Measurement discipline per CLAUDE.md: fetch once before timing; loop the
dispatch; block at the end.

Usage: python benchmarks/probe_chunk_efficiency.py
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

from aqc_research_tpu.ops.pallas_jacobi import _jacobi_pallas_raw


def measure(batch, n, chunks, repeats=20):
    rng = np.random.default_rng(0)
    m_re = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    m_im = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    print(f"-- batch {batch}, n={n} (random, non-converging):", flush=True)
    for chunk in chunks:
        assert batch % chunk == 0
        times = {}
        try:
            for sweeps in (2, 8):
                out = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
                _ = float(np.asarray(out[0])[0, 0, 0])  # fetch: flush + verify
                tic = time.perf_counter()
                for _ in range(repeats):
                    out = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
                out[0].block_until_ready()
                times[sweeps] = (time.perf_counter() - tic) / repeats
        except Exception as e:  # e.g. scoped-VMEM OOM at large chunk*n^2
            print(f"   chunk={chunk:2d}: FAILED ({str(e)[:120]}...)", flush=True)
            continue
        per_sweep = (times[8] - times[2]) / 6
        per_mat = per_sweep / batch
        flops = 18.0 * n * n * (n - 1)  # per matrix per sweep
        print(
            f"   chunk={chunk:2d}: per-sweep {per_sweep * 1e3:7.3f} ms "
            f"({per_mat * 1e6:7.1f} us/matrix, "
            f"{flops / per_mat / 1e9:6.0f} GFLOP/s)",
            flush=True,
        )


def main():
    measure(20, 128, (1, 2, 4, 5, 10, 20))
    measure(28, 256, (1, 2, 4, 7))


if __name__ == "__main__":
    main()
