"""Example: fully-on-device ASP horizon optimization (one XLA program).

The production drivers (docs/example_time_evolution.py) run the reference's
host-driven loop: SciPy L-BFGS calling a jitted objective.  On TPU the
per-call dispatch latency dominates, so this framework also ships fused
optimizers where the WHOLE L-BFGS loop — objective sweep, analytic co-sweep
gradient, line search, stopping — compiles into a single program:

* ``optimize_horizon_jit``            — dense statevector engine
* ``optimize_horizon_multistart``     — a vmapped fleet of the above
* ``optimize_horizon_mps_jit``        — MPS engine (large qubit counts)
* ``optimize_horizon_mps_multistart`` — a vmapped MPS fleet

Run:  python docs/example_jit_asp.py            (dense, 8 qubits)
      AQC_MPS=1 python docs/example_jit_asp.py  (MPS engine, 16 qubits)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aqc_research_tpu.config import is_tpu, set_precision

set_precision("fast" if is_tpu() else "high")

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit


def main() -> None:
    use_mps = bool(os.environ.get("AQC_MPS"))
    n = 16 if use_mps else 8
    evol_time, layers = 1.2, 2

    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=1.0
    )
    # Perturb the perfect Trotter init so the optimizer has work to do.
    thetas0 = thetas0 + 0.15 * np.random.default_rng(7).standard_normal(
        circ.num_thetas
    )
    ini = trotop.neel_init_state(n)
    trotter = trotop.Trotter(
        num_qubits=n, evol_time=evol_time, num_steps=6, delta=1.0,
        second_order=True,
    )

    if use_mps:
        from aqc_research_tpu.models.sp_lhs.jit_asp import optimize_horizon_mps_jit

        target = trotter.as_mps(ini, trunc_thr=1e-8, chi_max=32)
        base_bits = [1 if q % 2 == 0 else 0 for q in range(n)]  # Neel prep
        res = optimize_horizon_mps_jit(
            circ, thetas0, target, base_bits=base_bits,
            trunc_thr=1e-8, fidelity_thr=0.999, maxiter=150,
        )
    else:
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            flip_state_indices,
            optimize_horizon_jit,
        )

        target = trotter.as_vector(ini)
        idx = flip_state_indices(n, ini)
        res = optimize_horizon_jit(
            circ, thetas0, target, state_idx=idx,
            fidelity_thr=0.999, maxiter=150,
        )

    print(
        f"engine={'mps' if use_mps else 'dense'} n={n}: "
        f"fidelity={float(res.fidelity):.6f} fobj={float(res.fobj):.3e} "
        f"iters={int(res.num_iters)} converged={bool(res.converged)}"
    )


if __name__ == "__main__":
    main()
