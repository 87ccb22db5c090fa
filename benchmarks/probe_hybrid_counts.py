"""CPU probe: adaptive Jacobi sweep counts, "entry" vs "hybrid" criterion,
on REAL production pair matrices.

The round-4 degenerate-cut finding (tests/test_truncation.py) showed the
"entry" criterion can keep contaminated small columns when a truncation cut
lands inside a high-condition degenerate cluster; the "hybrid" criterion
fixes it exactly but costs ~+30% sweeps on the SYNTHETIC graded+junk model.
This probe measures the cost on the matrices the engine actually produces:
it captures every truncated-SVD input of one production V-dagger sweep +
one z-free gradient sweep (io_callback capture — CPU backend only), then
reports per-stage adaptive sweep counts under both criteria, plus the
worst-case per-matrix accuracy (discarded-weight excess vs the f64 LAPACK
optimum) under both.

Decision input for the default: if the REAL-matrix count delta is small
(real spectra are graded at the cut, where both criteria behave alike),
hybrid's exact-cut safety is nearly free and should become the default;
if it reproduces the synthetic +30%, "entry" stays.

Usage: python benchmarks/probe_hybrid_counts.py [n] [chi] [layers] [perturb]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from aqc_research_tpu.config import set_jacobi_criterion, set_precision

set_precision("fast")  # f32/c64 — the TPU production numerics

import jax.numpy as jnp

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used
from aqc_research_tpu.ops.pallas_jacobi import jacobi_svd_pallas_top_k
from aqc_research_tpu.targets import trotter as trotop
from probe_sweep_counts import capture_stage_mats


def _counts_and_excess(mats, k, criterion):
    set_jacobi_criterion(criterion)
    jax.clear_caches()
    counts, rel_smax = [], []
    for batch in mats:
        n = batch.shape[-1]
        if n < 8 or n % 2:
            continue
        counts.append(int(jacobi_sweeps_used(jnp.asarray(batch), 30, criterion)))
        # Reconstruction error beyond the f64 optimum, RELATIVE TO s_max —
        # real engine matrices are typically rank-deficient (optimal
        # discarded weight ~eps), so excess RATIOS are floored/meaningless;
        # the absolute junk level is the honest factor-quality metric (it
        # is what the round-3 rand probe measured as 'truncation leak').
        u, s, vh = jacobi_svd_pallas_top_k(jnp.asarray(batch), min(k, n))
        rec = np.asarray(u) * np.asarray(s)[..., None, :] @ np.asarray(vh)
        a = np.asarray(batch, np.complex128)
        err = np.linalg.norm(a - rec, axis=(-2, -1))
        s_ref = np.linalg.svd(a, compute_uv=False)
        opt = np.sqrt(np.sum(s_ref[..., min(k, n):] ** 2, axis=-1))
        extra = np.sqrt(np.maximum(err**2 - opt**2, 0.0))
        rel_smax.append(float(np.max(extra / s_ref[..., 0])))
    set_jacobi_criterion(None)
    jax.clear_caches()
    return counts, rel_smax


def main(n=16, chi=32, layers=4, perturb=0.05):
    rng = np.random.default_rng(20260818)
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
    thetas = jnp.asarray(
        trotop.init_ansatz_to_trotter(
            circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
        ),
        jnp.float32,
    )
    thetas = thetas + perturb * jnp.asarray(
        rng.standard_normal(circ.num_thetas), jnp.float32
    )
    ini = trotop.neel_init_state(n)
    target = trotop.Trotter(
        num_qubits=n, evol_time=1.2, num_steps=3, delta=1.0, second_order=True
    ).as_mps(ini, trunc_thr=1e-6, chi_max=chi)
    bits = tuple(int(k % 2 == 0) for k in range(n))

    stages = capture_stage_mats(circ, thetas, target, bits, 1e-6)
    for stage, mats in stages.items():
        print(f"--- stage {stage}: {len(mats)} decomposition phases ---")
        for crit in ("entry", "hybrid"):
            counts, rel = _counts_and_excess(mats, chi, crit)
            tot = sum(counts)
            print(
                f"{crit:7s}: total sweeps {tot:4d}  per-phase "
                f"mean {np.mean(counts):.2f} max {max(counts)}  "
                f"worst extra-discard / s_max {max(rel):.3e}"
            )


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    main(*(int(a) for a in args[:3]), *(args[3:] or [0.05]))
