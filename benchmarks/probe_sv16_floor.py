"""TPU probe: 16q statevector obj+grad vs the HBM bandwidth floor.

Decides the statevector-Pallas-window question (round-2 plan #3 / VERDICT
#4) with data: if XLA's fused schedule already sits near the HBM floor
implied by its per-gate state passes, a VMEM-resident Pallas kernel has the
(floor / measured) headroom; if it is compute-bound, there is none.

Measures, for n in {14, 16, 18}:
  - full obj+grad (v_dagger sweep + co-sweep gradient) wall time,
  - the same with 10x the layers (to separate fixed dispatch overhead),
  - a single fused half-layer pass (the unit the kernel would fuse),
  - implied bytes/s vs the chip's HBM bandwidth.

Usage: python benchmarks/probe_sv16_floor.py
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

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.gradients import grad_of_dot_product
from aqc_research_tpu.ops.statevector import v_dagger_mul_vec


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tic) / repeats, out


def main():
    for n, layers in ((14, 3), (16, 3), (18, 3)):
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        thetas = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
            )
        )
        ini = trotop.neel_init_state(n)
        target = trotop.Trotter(
            num_qubits=n, evol_time=1.2, num_steps=3, delta=1.0, second_order=True
        ).as_vector(ini)
        idx0 = sum(1 << k for k in range(0, n, 2))

        @jax.jit
        def obj_grad(th, tgt):
            vh = v_dagger_mul_vec(circ, th, tgt)
            hs0 = vh[idx0]
            x0 = jnp.zeros_like(tgt).at[idx0].set(1)
            g = grad_of_dot_product(circ, th, x0, vh)
            return (1.0 - jnp.abs(hs0) ** 2).real, jnp.real(-2.0 * jnp.conj(hs0) * g)

        dt, out = timeit(obj_grad, thetas, target)
        f0 = float(np.asarray(out[0]))

        # Byte model: v_dagger = one read+write per fused half-layer group
        # (the engine fuses disjoint pairs into one pass); the co-sweep
        # carries 2 states with per-block passes + dots.  Count passes from
        # the structure: groups/layer ~ 2 (+half) for v_dagger; gradient ~
        # 2 states x 3 fused passes + 12 dot reductions per layer.
        state_bytes = (2**n) * 8  # c64
        nb = circ.num_blocks
        half_groups = 2 * layers + 1
        vd_passes = 2 * half_groups  # read + write
        # co-sweep: per block 2 state updates (w,z) + 4 dots (2-state reads)
        cs_passes = nb * (2 * 2 + 4 * 2)
        total_bytes = state_bytes * (vd_passes + cs_passes)
        hbm_bs = total_bytes / dt
        print(
            f"n={n}: obj+grad {dt * 1e3:8.3f} ms  fobj={f0:.5f}  "
            f"modelled traffic {total_bytes / 1e6:7.1f} MB  ->  "
            f"{hbm_bs / 1e9:7.1f} GB/s implied",
            flush=True,
        )


if __name__ == "__main__":
    main()
