"""CPU probe: adaptive Jacobi sweep counts on REAL production pair matrices.

The artifact behind the roofline's sweep-count table (RESULTS.md): captures
every truncated-SVD input of one production V-dagger sweep + one z-free
gradient sweep (io_callback — CPU backend only; such compiles ABORT the
axon tunnel), then re-runs the identical adaptive schedule per matrix and
reports, per decomposition phase:

* per-matrix counts (the algorithmic requirement — the roofline floor),
* the phase MAX (what the shared Pallas chunk loop actually pays),
* optionally both convergence criteria side by side
  (``--both-criteria``: the round-3 entry-absolute criterion vs the
  round-2 relative one — the junk-tail effect).

Runs in f32 (production numerics) regardless of backend.  NOTE: the
capture trajectory uses the CPU default SVD impl (LAPACK) for the engine's
own truncations, so counts are from a parallel twin trajectory — close to,
not bit-identical with, the TPU run (RESULTS.md states this caveat).

Usage: python benchmarks/probe_sweep_counts.py [n] [chi] [layers] [perturb]
       [--both-criteria]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from aqc_research_tpu.config import set_precision

set_precision("fast")  # f32/c64 — the TPU production numerics

import jax.numpy as jnp

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops import mps as mpsmod
from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient_with_state
from aqc_research_tpu.targets import trotter as trotop


def capture_stage_mats(circ, thetas, target, bits, trunc_thr):
    """{"vdag": [...], "grad": [...]}: every phase's (batch, 2chi_p, 2chi_p)
    input matrix, in execution order."""
    captured = []
    orig = mpsmod._truncated_svd

    def capturing(m, chi_, thr_):
        jax.experimental.io_callback(
            lambda x: captured.append(np.asarray(x)), None, m, ordered=True
        )
        return orig(m, chi_, thr_)

    thr = trunc_thr * (1 + 1e-9)  # force a fresh trace so the patch applies
    lvec = mpsmod.mps_basis_state(bits, target.chi, target.gammas.dtype)
    stages = {}
    mpsmod._truncated_svd = capturing
    try:
        vh, zc = mpsmod.v_dagger_mul_mps_layers(circ, thetas, target, trunc_thr=thr)
        jax.block_until_ready(vh)
        stages["vdag"] = list(captured)
        captured.clear()
        grad, _ = fast_dot_gradient_with_state(
            circ, thetas, lvec, vh, zc, trunc_thr=thr, grow_w=True
        )
        jax.block_until_ready(grad)
        stages["grad"] = list(captured)
        captured.clear()
    finally:
        mpsmod._truncated_svd = orig
    return stages


RAND_MIN_N_PROBE = 32  # count reduced problems from this size up


def main(num_qubits=20, chi=64, layers=4, perturb=0.05, both=False, rand=False):
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
    criteria = ("entry", "relative") if both else ("entry",)
    variants = ("full", "reduced") if rand else ("full",)
    for stage, mats in stages.items():
        for crit in criteria:
            for variant in variants:
                means, maxima = [], []
                for m in mats:
                    mb = jnp.asarray(m.reshape((-1,) + m.shape[-2:]))
                    if variant == "reduced":
                        # The rand path's problem: count on B^H = the
                        # (n, l) projection (junk tail removed), only at
                        # shapes where the rand impl activates.
                        from aqc_research_tpu.ops.rand_svd import (
                            _POWER_ITERS,
                            _range_project,
                            rand_ell,
                        )

                        n = mb.shape[-1]
                        if n < RAND_MIN_N_PROBE:
                            continue
                        bm = _range_project(
                            mb, rand_ell(n, n // 2), _POWER_ITERS
                        )
                        mb = jnp.conj(jnp.swapaxes(bm, -1, -2))
                    ks = np.asarray(
                        jax.vmap(lambda x: jacobi_sweeps_used(x, 12, crit))(mb)
                    )
                    means.extend(ks.tolist())
                    maxima.append(int(ks.max()))
                if not means:
                    continue
                print(
                    f"{num_qubits}q chi={chi} perturb={perturb} {stage} "
                    f"[{crit}/{variant}]: per-matrix mean "
                    f"{np.mean(means):.2f} max {np.max(means)}; "
                    f"phase maxima {maxima} (mean {np.mean(maxima):.2f})",
                    flush=True,
                )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    both = "--both-criteria" in sys.argv[1:]
    rand = "--rand" in sys.argv[1:]
    vals = [float(a) for a in args[:4]]
    main(
        *(int(v) for v in vals[:3]),
        *( [vals[3]] if len(vals) > 3 else [] ),
        both=both,
        rand=rand,
    )
