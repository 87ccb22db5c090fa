"""CPU probe: does warm-starting Jacobi from the previous iterate's
rotations cut the adaptive sweep count? (VERDICT r2 item 5 scoping.)

The V-dagger (z-side) phases pay 8-12 adaptive sweeps per decomposition and
dominate the obj+grad sweep (~29 of ~37 GFLOP at 20q chi=64, roofline).
Between consecutive L-BFGS gradient calls thetas moves by one accepted
step; if the pair matrices rotate little, pre-multiplying by the PREVIOUS
call's right factor V0 should leave the columns nearly orthogonal and the
adaptive loop should exit in a couple of sweeps.

This probe measures exactly that on REAL captured matrices: capture the
pair matrices of the production V-dagger sweep at thetas0 and at
thetas1 = thetas0 + step, match them by structural position, and compare
``jacobi_sweeps_used(m1)`` (cold) vs ``jacobi_sweeps_used(m1 @ V0)``
(warm).  Runs on the CPU backend (io_callback aborts the axon tunnel).

Usage: python benchmarks/probe_jacobi_warmstart.py [n] [chi] [layers]
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
from aqc_research_tpu.targets import trotter as trotop


# Stable container: the io_callback baked into the (cached) compiled sweep
# closes over THIS list — a per-call list would only receive the first
# call's capture.
_CAPTURED: list = []


def capture_vdag_mats(circ, thetas, target, trunc_thr):
    """Pair matrices of one production V-dagger sweep, in execution order."""
    orig = mpsmod._truncated_svd

    def capturing(m, chi_, thr_):
        jax.experimental.io_callback(
            lambda x: _CAPTURED.append(np.asarray(x)), None, m, ordered=True
        )
        return orig(m, chi_, thr_)

    _CAPTURED.clear()
    mpsmod._truncated_svd = capturing
    try:
        # hair's-width thr shift forces a fresh trace so the patch applies
        vh, _ = mpsmod.v_dagger_mul_mps_layers(
            circ, thetas, target, trunc_thr=trunc_thr * (1 + 1e-9)
        )
        jax.block_until_ready(vh)
    finally:
        mpsmod._truncated_svd = orig
    return list(_CAPTURED)


def sweep_counts(mats):
    out = []
    for m in mats:
        mb = m.reshape((-1,) + m.shape[-2:])
        ks = np.asarray(jax.vmap(jacobi_sweeps_used)(jnp.asarray(mb)))
        out.extend(ks.tolist())
    return out


def main(num_qubits=20, chi=64, layers=4):
    trunc_thr = 1e-6
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas0 = jnp.asarray(
        trotop.init_ansatz_to_trotter(
            circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
        )
    )
    rng = np.random.default_rng(5)
    thetas0 = thetas0 + 0.05 * jnp.asarray(
        rng.standard_normal(circ.num_thetas), thetas0.dtype
    )
    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=1.2, num_steps=3, delta=1.0,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)

    mats0 = capture_vdag_mats(circ, thetas0, target, trunc_thr)
    print(f"captured {len(mats0)} decomposition phases "
          f"({sum(m.reshape((-1,) + m.shape[-2:]).shape[0] for m in mats0)} "
          f"matrices)", flush=True)
    cold0 = sweep_counts(mats0)
    print(f"thetas0 cold sweeps: mean {np.mean(cold0):.2f} "
          f"max {np.max(cold0)}", flush=True)

    for step in (0.01, 0.05, 0.2):
        thetas1 = thetas0 + step * jnp.asarray(
            rng.standard_normal(circ.num_thetas), thetas0.dtype
        )
        mats1 = capture_vdag_mats(circ, thetas1, target, trunc_thr)
        assert len(mats1) == len(mats0)
        cold = []
        warm = []
        for m0, m1 in zip(mats0, mats1):
            b0 = m0.reshape((-1,) + m0.shape[-2:])
            b1 = m1.reshape((-1,) + m1.shape[-2:])
            assert b0.shape == b1.shape
            cold.extend(
                np.asarray(
                    jax.vmap(jacobi_sweeps_used)(jnp.asarray(b1))
                ).tolist()
            )
            # previous-iterate right factors (exact, LAPACK)
            _, _, vh0 = np.linalg.svd(b0)
            warm_m = jnp.asarray(b1 @ np.swapaxes(vh0.conj(), -1, -2))
            warm.extend(
                np.asarray(jax.vmap(jacobi_sweeps_used)(warm_m)).tolist()
            )
        print(
            f"step {step:5.2f}: cold mean {np.mean(cold):.2f} max "
            f"{np.max(cold)}   warm mean {np.mean(warm):.2f} max "
            f"{np.max(warm)}   (shared-chunk max is what the kernel pays)",
            flush=True,
        )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
