"""Coordinate-descent driver for full AQC.

TPU-native counterpart of the reference driver
(``/root/reference/aqc_research/model_sketching/aqc_coord_descent.py:32-232``):
multi-start loop of on-device coordinate-descent sweeps until the parameter
change falls below 1e-8 / maxiter / stoppers fire.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional, Union

import numpy as np
from scipy.stats import truncnorm

from ... import checking as chk
from ...ops.coord_descent import coord_descent_single_sweep
from ...ops.statevector import ansatz_to_matrix
from ...optim import stoppers as aqcopt
from ...parallel.executor import run_jobs
from ...utils import create_logger, prepare_output_folder, print_options, to_host
from . import sk_utils as sku


def _single_simulation(job_index: int, config: dict) -> dict:
    """One restart (cf. reference _single_simulation, aqc_coord_descent.py:32-122)."""
    logger = create_logger("job_0") if job_index == 0 else None
    thetas_change_threshold = 1e-8
    target = config["su_target"]

    stop_timeout = aqcopt.TimeoutStopper(time_limit=config["time_limit"])
    stop_small_fobj = aqcopt.SmallObjectiveStopper(fobj_thr=1e-2)

    circ = sku.create_ansatz(
        num_qubits=config["num_qubits"],
        num_layers=config["num_layers"],
        circuit_layout=config["circuit_layout"],
        logger=logger,
    )
    thetas_0 = np.asarray(truncnorm.rvs(a=-1, b=1, size=circ.num_thetas) * np.pi)
    thetas = thetas_0.copy()
    fobj_best, thetas_best = np.inf, thetas_0.copy()
    nit = 0
    fobj_profile: list = []
    result: dict = {}

    try:
        while nit < config["maxiter"]:
            nit += 1
            prev_thetas = thetas
            new_thetas, fobj = coord_descent_single_sweep(circ, thetas, target)
            thetas = np.asarray(new_thetas)
            fobj = float(fobj)
            thetas_change = float(np.amax(np.abs(thetas - prev_thetas)))

            if fobj < fobj_best:
                fobj_best = fobj
                np.copyto(thetas_best, thetas)
            fobj_profile.append(fobj)
            if logger:
                logger.info(
                    f"sweep {nit:4d}: fobj {fobj:0.4f}, step size {thetas_change:0.5f}"
                )

            stop_timeout.check()
            stop_small_fobj.check(fobj=fobj)
            if thetas_change < thetas_change_threshold:
                break
        result["exit_status"] = "normal"
    except StopIteration:
        result["exit_status"] = "early"
    except TimeoutError:
        result["exit_status"] = "timeout"
    finally:
        fid = sku.fidelity(to_host(ansatz_to_matrix(circ, thetas_best)), target)
        result.update(
            {
                "cost": float(fobj_best),
                "nit": nit,
                "num_fun_ev": nit,
                "num_grad_ev": nit,
                "num_iters": nit,
                "ini_thetas": thetas_0,
                "thetas": thetas_best,
                "entangler": circ.entangler,
                "blocks": circ.blocks,
                "fidelity": fid,
                "stats": {
                    "convergence_profile": np.asarray(fobj_profile, np.float32),
                    "nit": nit,
                },
            }
        )
    return result


def aqc_coordinate_descent(
    *,
    num_qubits: int,
    num_layers: int,
    circ_layout: str,
    maxiter: int,
    target_name_or_func: Union[str, Callable[[int], np.ndarray]],
    result_folder: str,
    parametric_depth: int = 3,
    seed: int = int(round(time.time())),
    time_limit: int = 0,
    num_simulations: int = 1,
    num_jobs: int = 1,
    tag: str = "",
    job_cache_dir: Optional[str] = None,
    logger: Optional[logging.Logger] = None,
) -> str:
    """Multi-start coordinate-descent AQC (cf. reference
    aqc_coordinate_descent, aqc_coord_descent.py:125-232).

    ``job_cache_dir``: stable directory for per-job result caching — re-run
    the same call after a crash and completed restarts are reused instead of
    recomputed (see parallel.executor.run_jobs)."""
    assert chk.is_int(num_qubits, num_qubits >= 2)
    assert circ_layout in sku.supported_layouts()
    assert chk.is_int(maxiter, maxiter > 0)

    if logger is None:
        logger = create_logger(__file__)

    np.random.seed(seed)
    result_folder = prepare_output_folder(result_folder, num_qubits, __file__, tag)
    print_options(dict(vars()), logger, numeric_or_str=True)

    target_mat, su_target = sku.create_target_matrix(
        num_qubits=num_qubits,
        target_name_or_func=target_name_or_func,
        num_layers=parametric_depth,
        circuit_layout=circ_layout,
        logger=logger,
    )
    config = {
        "num_qubits": int(num_qubits),
        "num_layers": int(num_layers),
        "circuit_layout": circ_layout,
        "maxiter": int(maxiter),
        "time_limit": int(time_limit),
        "su_target": su_target,
    }
    results = run_jobs(
        configs=[config] * num_simulations,
        seed=seed,
        job_function=_single_simulation,
        tolerate_failure=True,
        num_jobs=num_jobs,
        cache_dir=job_cache_dir,
    )
    sku.postprocess_and_save_results(
        num_qubits=num_qubits,
        results=results,
        target_mat=target_mat,
        su_target=su_target,
        output_dir=result_folder,
        logger=logger,
    )
    return result_folder
