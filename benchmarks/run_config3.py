"""Config-3-scale production driver run on TPU (VERDICT r2 item 4).

Runs the FULL `run_simulation` driver — target generation + caching,
fidelity thresholds, the jitted MPS L-BFGS loop, persistence, plots — at
n=20 chi=64 (and optionally 28q chi=128) over the first two default time
horizons.  The round-2 record topped out at 12q chi=32; this validates the
production path at BASELINE config-3 scale on the real chip.

Usage: python benchmarks/run_config3.py [num_qubits] [chi] [horizons]
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(num_qubits=20, chi=64, horizons=2):
    from aqc_research_tpu.config import is_tpu, set_precision

    set_precision("fast" if is_tpu() else "high")

    from aqc_research_tpu.models.sp_lhs.time_evol import run_simulation
    from aqc_research_tpu.models.sp_lhs.user_options import UserOptions

    opts = UserOptions()
    opts.num_qubits = int(num_qubits)
    opts.objective = "sur_fast_mps_trotter"
    opts.chi_max = int(chi)
    opts.maxiter = 40
    opts.fidelity_thr = 0.995
    opts.seed = 20260817
    opts.use_jit_lbfgs = True
    opts.result_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "config3",
    )
    opts.tag = f"config3_{num_qubits}q_chi{chi}"
    step_range = 1 + np.arange(int(horizons))
    opts.trotter_steps = step_range * 3
    opts.evol_times = np.round(step_range * 1.2, 3)

    tic = time.perf_counter()
    out = run_simulation(opts)
    wall = time.perf_counter() - tic
    with open(os.path.join(out, "all_results.pkl"), "rb") as fld:
        results = pickle.load(fld)
    print(f"==== config3 done in {wall:.1f} s: {out}")
    for res in results:
        print(
            f"  t={res['evol_time1']}: layers={res['num_layers']}, "
            f"fid_a1_vs_gt={res['fid_a1_vs_gt']:.6f}, "
            f"fid_t1_vs_gt={res['fid_t1_vs_gt']:.6f}"
        )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
