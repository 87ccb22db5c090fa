"""Example: approximate quantum compiling of a target unitary.

TPU-native twin of the reference's ``docs/aqc.ipynb`` walkthrough: build a
5-qubit SU target, a layered spin ansatz, and run full AQC (L-BFGS over the
Frobenius/HS objective), then the sketched variant and coordinate descent.

Run:  python docs/example_aqc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aqc_research_tpu.config import is_tpu, set_precision

set_precision("fast" if is_tpu() else "high")

from aqc_research_tpu.models.sketching.aqc_coord_descent import aqc_coordinate_descent
from aqc_research_tpu.models.sketching.aqc_sketching import aqc_sketching

SEED = 42

if __name__ == "__main__":
    # 1) Full AQC: X = I — the classic <V, U> objective.
    aqc_sketching(
        num_qubits=5,
        num_layers=40,           # ~63% of the exact-compiling lower bound
        num_skvecs=2**5,         # == dim -> full AQC
        circ_layout="spin",
        maxiter=300,
        learn_rate=0.1,
        skvecs_type="full",
        target_name_or_func="random",
        result_folder="results/aqc_full",
        seed=SEED,
        num_simulations=2,
    )

    # 2) Sketched AQC: random column subsets, Adam with restart halving.
    aqc_sketching(
        num_qubits=5,
        num_layers=40,
        num_skvecs=8,
        circ_layout="spin",
        maxiter=200,
        learn_rate=0.1,
        skvecs_type="alt",
        target_name_or_func="qft",
        result_folder="results/aqc_sketched",
        seed=SEED,
    )

    # 3) Coordinate descent on the |<V,U>|^2 objective.
    aqc_coordinate_descent(
        num_qubits=4,
        num_layers=20,
        circ_layout="spin",
        maxiter=100,
        target_name_or_func="random",
        result_folder="results/aqc_cd",
        seed=SEED,
    )
