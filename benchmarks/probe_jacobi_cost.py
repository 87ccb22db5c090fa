"""Where does the MPS sweep's decomposition time go? (round-3 roofline probe)

Three measurements on the real TPU:

1. **Marginal sweep cost of the Pallas kernel**: `_jacobi_pallas_raw` at fixed
   max-sweep budgets on random (non-converging) batches — the slope gives the
   per-sweep VPU cost, the intercept the fixed overhead (transpose, sort,
   recovery are outside this call).
2. **Adaptive sweep counts on REAL pair matrices**: every `_truncated_svd`
   input of one production obj+grad sweep (vdag + z-free gradient + forward
   value) is captured via `io_callback`, then fed to the pure-XLA
   `jacobi_sweeps_used` (identical schedule/tolerance as the kernel) —
   per-matrix counts AND the per-call max (what the shared while_loop pays).
3. The same at a mid-optimization point (after 10 L-BFGS iterations), since
   perfect-init matrices are atypically easy.

Usage: python benchmarks/probe_jacobi_cost.py [num_qubits] [chi] [layers]
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

import aqc_research_tpu.ops.mps as mpsmod
import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.jacobi_svd import jacobi_sweeps_used
from aqc_research_tpu.ops.pallas_jacobi import _jacobi_pallas_raw


def fetch(x):
    return np.asarray(x)


def kernel_sweep_cost(batch=10, n=128, repeats=20):
    rng = np.random.default_rng(0)
    m_re = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    m_im = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    chunk = batch
    print(f"-- kernel cost, random batch ({batch}, {n}, {n}):", flush=True)
    times = {}
    for sweeps in (1, 2, 4, 8, 12):
        out = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
        val = float(fetch(out[0])[0, 0, 0])
        tic = time.perf_counter()
        for _ in range(repeats):
            out = _jacobi_pallas_raw(m_re, m_im, sweeps, chunk)
        out[0].block_until_ready()
        dt = (time.perf_counter() - tic) / repeats
        times[sweeps] = dt
        print(f"   max_sweeps={sweeps:2d}: {dt * 1e3:8.3f} ms  (check {val:.4f})", flush=True)
    slope = (times[8] - times[2]) / 6
    print(f"   marginal per-sweep cost ~ {slope * 1e3:.3f} ms, "
          f"fixed ~ {(times[2] - 2 * slope) * 1e3:.3f} ms")


def capture_sweep_counts(num_qubits, chi, layers, label, thetas, trunc_thr):
    """Patches _truncated_svd to capture every input batch of one obj+grad
    sweep, then reports adaptive sweep counts per call."""
    captured = []

    orig = mpsmod._truncated_svd

    def capturing(m, chi_, thr):
        def save(x):
            captured.append(np.asarray(x))

        jax.experimental.io_callback(save, None, m, ordered=True)
        return orig(m, chi_, thr)

    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=1.2, num_steps=3, delta=1.0,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    lvec = mpsmod.mps_from_program(ini, num_qubits, chi_max=chi)
    from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient_with_state

    # A hair's-width trunc_thr shift forces fresh traces (the optimizer warm-up
    # cached traces of the UNPATCHED functions at the nominal threshold).
    thr = trunc_thr * (1 + 1e-9)

    mpsmod._truncated_svd = capturing
    try:
        stages = {}
        vh, zc = mpsmod.v_dagger_mul_mps_layers(circ, thetas, target, trunc_thr=thr)
        jax.block_until_ready(vh)
        stages["vdag"] = list(captured)
        captured.clear()
        grad, w = fast_dot_gradient_with_state(
            circ, thetas, lvec, vh, zc, trunc_thr=thr
        )
        jax.block_until_ready(grad)
        stages["grad"] = list(captured)
        captured.clear()
        val = mpsmod.v_mul_mps(circ, thetas, lvec, trunc_thr=thr)
        jax.block_until_ready(val.gammas)
        stages["value"] = list(captured)
        captured.clear()
    finally:
        mpsmod._truncated_svd = orig

    print(f"-- adaptive sweep counts @ {label}:")
    per_matrix = jax.jit(jax.vmap(jacobi_sweeps_used))
    for stage, mats in stages.items():
        maxes, counts, sizes = [], [], []
        for m in mats:
            mb = m.reshape((-1,) + m.shape[-2:])
            ks = fetch(per_matrix(jnp.asarray(mb)))
            counts.extend(ks.tolist())
            maxes.append(int(ks.max()))
            sizes.append(mb.shape)
        counts = np.asarray(counts)
        print(
            f"   {stage:6s}: {len(mats):2d} calls, per-call max {maxes}, "
            f"per-matrix mean {counts.mean():.2f} "
            f"hist {np.bincount(counts, minlength=13)[:13].tolist()}"
        )
        print(f"           shapes: {sizes}")
    return stages


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
    kernel_sweep_cost(batch=10, n=2 * chi)

    # Perturbed-init thetas as the hard-regime proxy (round-2 lesson: the
    # perfect init's matrices are atypically easy; an L-BFGS warm-up compile
    # costs 30+ min through the tunnel, so 0.3-rad perturbations stand in).
    rng = np.random.default_rng(5)
    th_mid = thetas0 + 0.3 * jnp.asarray(
        rng.standard_normal(circ.num_thetas), thetas0.dtype
    )

    capture_sweep_counts(num_qubits, chi, layers, "perfect init", thetas0, trunc_thr)
    capture_sweep_counts(num_qubits, chi, layers, "perturbed 0.3 rad", th_mid, trunc_thr)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
