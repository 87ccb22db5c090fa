"""CPU probe: what would difficulty-sorted SVD sub-chunking buy?

The Pallas Jacobi kernel shares ONE adaptive while_loop per VMEM chunk, so
every matrix in a chunk pays the chunk's MAX sweep count (RESULTS.md
roofline).  At mid-optimization points the per-matrix counts spread (20q
perturbed: vdag mean 6.4 / max 9), so splitting a phase batch into SMALLER
chunks ordered by per-matrix difficulty would pay ~the mean instead of the
max — IF (a) the within-phase spread is real, (b) a cheap proxy can predict
the ordering, and (c) small chunks don't lose too much VPU efficiency
(measured separately on-chip by benchmarks/probe_jacobi_cost.py's marginal
sweep cost at several chunk sizes).

This probe captures every truncated-SVD input of one production obj+grad
sweep (io_callback — CPU backend only), re-runs the identical adaptive
schedule per matrix, and reports the predicted paid-sweep-work ratio of

* the CURRENT schedule (chunks of ops/pallas_jacobi._pick_chunk, input order),
* unsorted smaller chunks (c in {2, 4, 5}),
* difficulty-sorted chunks with the ORACLE order (true per-matrix counts),
* difficulty-sorted chunks with the CHEAP proxy (initial entry-criterion
  residual from the Gram matrix — one batched MXU matmul),

weighting each phase by its per-sweep work  b * 18 * n^2 * (n-1)  so ratios
translate to kernel time (per-sweep cost scales ~n^2 per Brent-Luk phase,
n-1 phases per sweep).

Usage: python benchmarks/probe_chunk_schedule.py [n] [chi] [layers] [perturb]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from aqc_research_tpu.config import set_precision

set_precision("fast")  # f32/c64 — production numerics

import jax.numpy as jnp

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used
from aqc_research_tpu.ops.pallas_jacobi import _pick_chunk
from aqc_research_tpu.targets import trotter as trotop

from probe_sweep_counts import capture_stage_mats


def entry_residual_proxy(mb: np.ndarray) -> np.ndarray:
    """Cheap difficulty proxy: initial entry-criterion residual per matrix.

    One batched Gram ``G = m^H m`` (an MXU matmul in production), then
    ``max_{j<k} |G_jk| / sqrt(smax2 * max(G_jj, G_kk))`` — the same
    entry-absolute measure the kernel's convergence check uses.
    """
    g = np.einsum("bij,bik->bjk", np.conj(mb), mb)
    d = np.real(np.einsum("bjj->bj", g))  # (b, n)
    smax2 = d.max(axis=1)  # (b,)
    maxd = np.maximum(d[:, :, None], d[:, None, :])  # (b, n, n)
    denom = np.sqrt(np.maximum(smax2[:, None, None] * maxd, 1e-30))
    r = np.abs(g) / denom
    n = r.shape[-1]
    r[:, np.arange(n), np.arange(n)] = 0.0
    return r.reshape(r.shape[0], -1).max(axis=1)


def paid_sweeps(counts: np.ndarray, chunk: int) -> float:
    """Total paid sweep-matrix units when ``counts`` (in this order) is
    processed in chunks of ``chunk`` (last chunk may be ragged): each chunk
    pays its max for every matrix slot it holds (padding slots converge
    immediately and never raise the max, so ragged chunks pay only their
    real size)."""
    total = 0.0
    for i in range(0, len(counts), chunk):
        grp = counts[i : i + chunk]
        total += float(grp.max()) * len(grp)
    return total


def main(num_qubits=20, chi=64, layers=4, perturb=0.05):
    trunc_thr = 1e-6
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas = jnp.asarray(
        trotop.init_ansatz_to_trotter(
            circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
        )
    )
    if perturb:
        rng = np.random.default_rng(5)
        thetas = thetas + perturb * jnp.asarray(
            rng.standard_normal(circ.num_thetas), thetas.dtype
        )
    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=1.2, num_steps=3, delta=1.0,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    bits = tuple(1 if q % 2 == 0 else 0 for q in range(num_qubits))

    stages = capture_stage_mats(circ, thetas, target, bits, trunc_thr)

    strategies = {}  # name -> total weighted paid work
    spearmans = []
    for stage, mats in stages.items():
        for m in mats:
            mb = np.asarray(m).reshape((-1,) + m.shape[-2:])
            b, n = mb.shape[0], mb.shape[-1]
            ks = np.asarray(
                jax.vmap(lambda x: jacobi_sweeps_used(x, 12, "entry"))(
                    jnp.asarray(mb)
                )
            ).astype(np.float64)
            proxy = entry_residual_proxy(mb)
            # Spearman rank correlation proxy vs true count (ties -> mean rank)
            if len(ks) > 2 and ks.std() > 0:
                from scipy.stats import spearmanr

                rho = spearmanr(proxy, ks).statistic
                if np.isfinite(rho):
                    spearmans.append(rho)
            w = 18.0 * n * n * (n - 1)  # per-sweep work per matrix
            cur_chunk = _pick_chunk(b, n)
            oracle = np.sort(ks)[::-1]
            by_proxy = ks[np.argsort(-proxy)]
            for c in (2, 4, 5):
                strategies.setdefault(f"unsorted c={c}", 0.0)
                strategies[f"unsorted c={c}"] += w * paid_sweeps(ks, c)
                strategies.setdefault(f"oracle c={c}", 0.0)
                strategies[f"oracle c={c}"] += w * paid_sweeps(oracle, c)
                strategies.setdefault(f"proxy c={c}", 0.0)
                strategies[f"proxy c={c}"] += w * paid_sweeps(by_proxy, c)
            strategies.setdefault("current", 0.0)
            strategies["current"] += w * paid_sweeps(ks, cur_chunk)
            strategies.setdefault("per-matrix floor", 0.0)
            strategies["per-matrix floor"] += w * float(ks.sum())

    cur = strategies["current"]
    print(
        f"{num_qubits}q chi={chi} layers={layers} perturb={perturb}: "
        f"proxy-vs-count Spearman mean {np.mean(spearmans):.3f} "
        f"(over {len(spearmans)} phases with spread)"
    )
    for name in sorted(strategies):
        v = strategies[name]
        print(f"  {name:20s}: paid work {v:.3e}  ({cur / v:.3f}x vs current)")


if __name__ == "__main__":
    vals = [float(a) for a in sys.argv[1:5]]
    main(
        *(int(v) for v in vals[:3]),
        *([vals[3]] if len(vals) > 3 else []),
    )
