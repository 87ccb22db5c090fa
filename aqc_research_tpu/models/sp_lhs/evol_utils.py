"""Utilities for the ASP time-evolution experiments.

TPU-native counterpart of the reference experiment utilities
(``/root/reference/aqc_research/model_sp_lhs/trotter/trotter_evol_utils.py:
37-260``): result archives, solution-state reconstruction, persistence,
command-line arguments, timestamped output folders.
"""

from __future__ import annotations

import datetime
import os
import pickle
from argparse import ArgumentParser
from pprint import pprint
from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np

from ... import checking as chk
from ...circuit.ansatz import Ansatz, TrotterAnsatz
from ...circuit.export import ansatz_to_program
from ...circuit.program import GateProgram, program_to_state
from ...ops import mps as mpsop
from ...ops.statevector import v_mul_vec
from ...utils import copy_file_to_folder, create_logger, to_host, zero_state
from .user_options import UserOptions

_logger = create_logger(__file__)


def load_results_from_archive(filename: str) -> List[Dict]:
    """Reads simulation results from a pickle archive (can be huge at large n,
    cf. trotter_evol_utils.py:37-53)."""
    with open(filename, "rb") as fld:
        data = pickle.load(fld)
    assert isinstance(data, list), "the archive must hold a list of result dicts"
    horizons = [r["evol_time1"] for r in data]
    print(f"{len(horizons)} time horizon(s) in the archive")
    pprint(f"horizon times: {horizons}")
    return data


def program_from_result(result: dict, tol: float = 0.0) -> GateProgram:
    """Solution gate program from an optimization result
    (cf. qcircuit_from_result, trotter_evol_utils.py:56-76)."""
    assert isinstance(result, dict)
    assert result["entangler"] == "cx"
    circ = TrotterAnsatz.make(
        result["num_qubits"],
        np.asarray(result["blocks"]),
        bool(result["second_order_trotter"]),
    )
    return ansatz_to_program(circ, np.asarray(result["thetas"]), tol=tol)


def get_solution_from_optim_result(
    opts: UserOptions,
    result: dict,
    trotterized: bool,
    state_prep_func: Optional[Callable[[int], GateProgram]] = None,
    trunc_thr: Optional[float] = None,
) -> Union[mpsop.MPS, np.ndarray]:
    """Rebuilds the solution state ``V(Θ) S |0>`` in MPS or dense form
    (cf. trotter_evol_utils.py:79-125)."""
    num_qubits = result["num_qubits"]
    if trotterized:
        circ = TrotterAnsatz.make(
            num_qubits, np.asarray(result["blocks"]), opts.second_order_trotter
        )
    else:
        circ = Ansatz.make(num_qubits, result["entangler"], np.asarray(result["blocks"]))

    thetas = np.asarray(result["thetas"])
    if opts.use_mps:
        if trunc_thr is None:
            trunc_thr = opts.trunc_thr
        if state_prep_func is not None:
            ini = mpsop.mps_from_program(
                state_prep_func(num_qubits),
                num_qubits,
                chi_max=opts.chi_max,
                trunc_thr=trunc_thr,
            )
        else:
            ini = mpsop.mps_zero(num_qubits, opts.chi_max)
        return mpsop.v_mul_mps(circ, thetas, ini, trunc_thr=trunc_thr)

    if state_prep_func is not None:
        # Keep the prep state ON DEVICE (program_to_state is jitted): a host
        # round trip would re-upload complex data eagerly, which is lazily
        # invalid on some TPU runtimes (CLAUDE.md).
        state = program_to_state(state_prep_func(num_qubits), num_qubits)
    else:
        from ...utils import from_host

        state = from_host(zero_state(num_qubits))
    return to_host(v_mul_vec(circ, thetas, state))


def save_optim_results(
    output_dir: str,
    results: List[Dict],
    target: Optional[Union[mpsop.MPS, np.ndarray]] = None,
    tag: str = "",
) -> None:
    """Pickles sorted optimization results (cf. trotter_evol_utils.py:128-152)."""
    assert chk.is_str(output_dir)
    assert all(results[0]["cost"] <= r["cost"] for r in results)
    tag = "" if len(tag) == 0 else ("_" + tag)
    best_cost = f"{results[0]['cost']:0.8f}"
    filename = f"trotter{tag}_n{results[0]['num_qubits']}__c{best_cost}.pkl"
    if isinstance(target, mpsop.MPS):
        target = (to_host(target.gammas), np.asarray(target.lambdas))
    with open(os.path.join(output_dir, filename), "wb") as fld:
        pickle.dump({"results": results, "target": target}, fld)
        _logger.info("saved optimization results to %s", fld.name)


def get_commandline_args(parser: ArgumentParser) -> Any:
    """CLI of the ASP driver (cf. trotter_evol_utils.py:155-191)."""
    assert isinstance(parser, ArgumentParser)
    parser.add_argument("-n", "--num_qubits", default=5, type=int, metavar="",
                        help="number of qubits")
    parser.add_argument("-t", "--target_only", action="store_true",
                        help="only precompute the target states, then exit")
    parser.add_argument("-g", "--tag", default="", type=str, metavar="",
                        help="suffix appended to the results folder name")
    parser.add_argument("-f", "--targets_file", default="", type=str, metavar="",
                        help="load precomputed target states from this file")
    parser.add_argument("--cpu", action="store_true",
                        help="flag: force the CPU backend (f64 precision)")
    parser.add_argument("--resume", default="", type=str, metavar="",
                        help="results folder of an interrupted run to resume")
    params = parser.parse_args()
    assert 2 <= params.num_qubits
    _logger.info("Command-line arguments: %s", params.__dict__)
    return params


def prepare_output_folder(opts: UserOptions, script_path: str) -> str:
    """Timestamped results dir + script copy + pickled options
    (cf. trotter_evol_utils.py:194-218)."""
    now = str(datetime.datetime.now().replace(microsecond=0))
    now = now.replace(":", ".").replace(" ", "_")
    output_dir = os.path.join(opts.result_dir, f"{opts.num_qubits}qubits", now)
    if isinstance(opts.tag, str) and len(opts.tag) > 0:
        output_dir = output_dir + "_" + opts.tag
    os.makedirs(output_dir, exist_ok=True)
    if os.path.isfile(script_path):
        copy_file_to_folder(output_dir, script_path)
    with open(os.path.join(output_dir, "user_options.pkl"), "wb") as fld:
        opts_dict = {
            k: v for k, v in opts.__dict__.items() if not callable(v)
        }
        pickle.dump(opts_dict, fld)
    return output_dir


def verify_and_print_summary(num_qubits: int, results: List[Dict]) -> None:
    """Checks sorting by cost and prints a summary table
    (cf. trotter_evol_utils.py:221-240)."""
    import pandas as pd

    n = len(results)
    if not all(results[i]["cost"] <= results[i + 1]["cost"] for i in range(n - 1)):
        raise ValueError("result list must be sorted ascending by 'cost'")
    best = results[0]
    assert chk.float_1d(np.asarray(best["thetas"]))
    assert chk.block_structure(num_qubits, np.asarray(best["blocks"]))
    summary = pd.DataFrame(results, columns=["cost", "fidelity", "num_iters", "time"])
    _logger.info("\n%s\nSorted valid results:\n%s\n", "-" * 24, summary.to_string())


def print_results(results: List[Dict], result_no: Optional[int] = None) -> None:
    """Prints all or one selected horizon result
    (cf. trotter_evol_utils.py:243-260)."""
    if result_no is not None and not 0 <= result_no < len(results):
        raise IndexError("'result_no' is out of range")
    for idx, res in enumerate(results):
        if result_no is None or result_no == idx:
            print(f"\n{'&' * 80}\nHorizon no. {idx}\n{'&' * 80}\n")
            pprint(res)


# Reference name (trotter_evol_utils.py:56): "qcircuit" = GateProgram here.
qcircuit_from_result = program_from_result
