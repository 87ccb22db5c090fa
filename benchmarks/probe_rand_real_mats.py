"""CPU probe: rand-SVD accuracy on REAL production pair matrices.

The on-chip probe (benchmarks/probe_rand_svd.py) validated the randomized-
projection impl (ops/rand_svd.py) on synthetic graded spectra.  This probe
closes the remaining accuracy question on the matrices the engine actually
produces: it captures every truncated-SVD input of one production V-dagger
sweep + one z-free gradient sweep at the 20q chi=64 perturbed point
(io_callback capture — CPU backend only, see probe_sweep_counts.py), then
compares, per captured matrix with n >= RAND_MIN_N:

* discarded weight ||A - U_k S_k Vh_k||_F^2 vs the f64 LAPACK optimum,
* kept singular-value relative error vs LAPACK,
* factor orthonormality residuals (u, vh),

for BOTH the plain Pallas Jacobi kernel and the rand impl (interpret-mode
Pallas on CPU; c64 production numerics).

Usage: python benchmarks/probe_rand_real_mats.py [n] [chi] [layers] [perturb] [max_per_stage]
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
from aqc_research_tpu.ops.pallas_jacobi import jacobi_svd_pallas_top_k
from aqc_research_tpu.ops.rand_svd import RAND_MIN_N, rand_svd_top_k
from aqc_research_tpu.targets import trotter as trotop
from probe_sweep_counts import capture_stage_mats


def _assess(name, mats, k):
    leak, leak_opt, s_relerr, orth = [], [], [], []
    for m in mats:
        a64 = np.asarray(m, dtype=np.complex128)
        s_ref = np.linalg.svd(a64, compute_uv=False)
        tot = float(np.sum(s_ref**2))
        leak_opt.append(float(np.sum(s_ref[k:] ** 2)) / tot)
        if name == "jacobi":
            u, s, vh = jacobi_svd_pallas_top_k(jnp.asarray(m), k)
        else:
            u, s, vh = rand_svd_top_k(jnp.asarray(m), k)
        u = np.asarray(u, dtype=np.complex128)
        s = np.asarray(s, dtype=np.float64)
        vh = np.asarray(vh, dtype=np.complex128)
        # Truncation leak: the weight the kept rank-k factorization fails to
        # carry, as a fraction of the total weight.  The optimum is the
        # LAPACK tail; production cuts at trunc_thr = 1e-6 of s_max, so any
        # EXTRA leak near/above ~1e-12 of tot distorts what the engine keeps.
        dw = float(np.linalg.norm(a64 - (u * s[None, :]) @ vh) ** 2)
        leak.append(dw / tot)
        # Compare only the significant part of the spectrum (>= 1e-5 * s_max
        # — safely above both impls' zeroing floors).
        sig = s_ref[:k] >= 1e-5 * s_ref[0]
        s_relerr.append(
            float(np.max(np.abs(s[sig] - s_ref[:k][sig]) / s_ref[:k][sig]))
        )
        nz = s > 0
        orth.append(
            max(
                float(np.linalg.norm((vh[nz] @ vh[nz].conj().T) - np.eye(int(nz.sum())))),
                float(np.linalg.norm((u[:, nz].conj().T @ u[:, nz]) - np.eye(int(nz.sum())))),
            )
        )
    print(
        f"  {name:7s}: leak/tot max {np.max(leak):9.3e} mean "
        f"{np.mean(leak):9.3e} (LAPACK opt max {np.max(leak_opt):9.3e} mean "
        f"{np.mean(leak_opt):9.3e}) | sig s_relerr max {np.max(s_relerr):.2e} "
        f"| orth max {np.max(orth):.2e}  ({len(leak)} mats)",
        flush=True,
    )


def main(num_qubits=20, chi=64, layers=4, perturb=0.05, max_per_stage=24):
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
    for stage, mats in stages.items():
        flat = []
        for m in mats:
            mb = m.reshape((-1,) + m.shape[-2:])
            if mb.shape[-1] >= RAND_MIN_N:
                flat.extend(list(mb))
        if not flat:
            print(f"{stage}: no matrices at n >= {RAND_MIN_N}", flush=True)
            continue
        stride = max(1, len(flat) // max_per_stage)
        sample = flat[::stride][:max_per_stage]
        k = sample[0].shape[-1] // 2
        print(
            f"{num_qubits}q chi={chi} perturb={perturb} stage={stage}: "
            f"{len(flat)} mats at n={sample[0].shape[-1]}, sampling "
            f"{len(sample)} (k={k})",
            flush=True,
        )
        _assess("jacobi", sample, k)
        _assess("rand", sample, k)


if __name__ == "__main__":
    vals = [float(a) for a in sys.argv[1:6]]
    args = [int(v) for v in vals[:3]] + list(vals[3:4]) + [
        int(v) for v in vals[4:5]
    ]
    main(*args)
