"""Example: ASP time evolution of the XXZ chain (Neel initial state).

TPU-native twin of the reference's ``docs/time_evolution.ipynb``: evolve
forward with big Trotter steps, compress each horizon's state into a shallow
Trotter-like ansatz via the max-projection surrogate objective, and plot the
fidelity profiles.

Run:  python docs/example_time_evolution.py          (MPS engine, 12 qubits)
      AQC_SMALL=1 python docs/example_time_evolution.py   (dense, 6 qubits)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os

from aqc_research_tpu.config import is_tpu, set_precision

set_precision("fast" if is_tpu() else "high")

from aqc_research_tpu.models.sp_lhs.time_evol import run_simulation
from aqc_research_tpu.models.sp_lhs.user_options import UserOptions

if __name__ == "__main__":
    opts = UserOptions()
    if os.environ.get("AQC_SMALL"):
        opts.num_qubits = 6
        opts.objective = "sur_max"           # dense statevector engine
    else:
        opts.num_qubits = 12
        opts.objective = "sur_fast_mps_trotter"  # MPS engine
        opts.chi_max = 64
    opts.maxiter = 40
    opts.fidelity_thr = 0.995
    opts.seed = 7
    output_dir = run_simulation(opts)
    print("results in:", output_dir)
