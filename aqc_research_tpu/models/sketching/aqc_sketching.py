"""Full / sketched AQC driver with multi-start restarts.

TPU-native counterpart of the reference driver
(``/root/reference/aqc_research/model_sketching/aqc_sketching.py:35-283``):
build the (SU) target, fan out ``num_simulations`` restarts, run L-BFGS (full
AQC) or Adam with stagnation-triggered learning-rate halving (sketched), then
post-process the best result.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional, Union

import numpy as np
from scipy.stats import truncnorm

from ... import checking as chk
from ...ops.statevector import ansatz_to_matrix
from ...optim import optimizer as aqcopt_optimizer
from ...optim import stoppers as aqcopt
from ...parallel.executor import run_jobs
from ...utils import create_logger, prepare_output_folder, print_options, to_host
from . import sk_core as skc
from . import sk_utils as sku


def _full_aqc(*, maxiter: int, thetas_0: np.ndarray, objv: skc.SketchingObjectiveEx) -> dict:
    """Full AQC via SciPy L-BFGS-B (cf. reference _full_aqc, aqc_sketching.py:35-50)."""
    import scipy.optimize as sciopt

    try:
        res = sciopt.minimize(
            objv.objective,
            thetas_0,
            jac=objv.gradient,
            method="L-BFGS-B",
            options={"maxiter": maxiter, "maxfun": 5 * maxiter},
        )
        result = objv.optim_results
        result["cost"] = float(res.fun)
        result["thetas"] = np.asarray(res.x)
        result["exit_status"] = "normal"
    except StopIteration:
        result = objv.optim_results
        result["exit_status"] = "early"
    except TimeoutError:
        result = objv.optim_results
        result["exit_status"] = "timeout"
    return result


def _stochastic_aqc(
    *,
    maxiter: int,
    learn_rate: float,
    thetas_0: np.ndarray,
    objv: skc.SketchingObjectiveEx,
    stop_stagnant: aqcopt.NotImproveStopper,
    logger: Optional[logging.Logger],
) -> dict:
    """Adam with stagnation-triggered restarts at halved learning rate
    (<=5 corrections; cf. reference _stochastic_aqc, aqc_sketching.py:53-104)."""
    max_learn_rate_corrections = 5
    ini_thetas = np.asarray(thetas_0).copy()
    result: dict = {}
    while maxiter > 0:
        if logger:
            logger.info(f">>>>> learning rate: {learn_rate}")
        try:
            res = aqcopt_optimizer._adam_minimize(
                objv.objective, objv.gradient, ini_thetas, maxiter, learn_rate
            )
            result = objv.optim_results
            result["cost"] = float(res.fun)
            result["thetas"] = np.asarray(res.x)
            result["exit_status"] = "normal"
            break
        except aqcopt.StagnantOptimizationWarning:
            result = objv.optim_results
            max_learn_rate_corrections -= 1
            if max_learn_rate_corrections > 0:
                stop_stagnant.reset()
                learn_rate *= 0.5
                np.copyto(ini_thetas, result["thetas"])
            else:
                stop_stagnant.disable()
        except StopIteration:
            result = objv.optim_results
            result["exit_status"] = "early"
            break
        except TimeoutError:
            result = objv.optim_results
            result["exit_status"] = "timeout"
            break
        maxiter -= objv.num_iterations

    if result.get("exit_status", None) is None:
        result["exit_status"] = "premature"
    return result


def _single_simulation(job_index: int, config: dict) -> dict:
    """One restart (cf. reference _single_simulation, aqc_sketching.py:107-162)."""
    logger = create_logger("job_0") if job_index == 0 else None
    circ = sku.create_ansatz(
        num_qubits=config["num_qubits"],
        num_layers=config["num_layers"],
        circuit_layout=config["circuit_layout"],
        logger=logger,
    )
    dim = circ.dimension
    maxiter = int(config["maxiter"])
    thetas_0 = np.asarray(truncnorm.rvs(a=-1, b=1, size=circ.num_thetas) * np.pi)
    skvecs = skc.skvecs_generator(
        str(config["skvecs_type"]), int(config["num_skvecs"]), config["su_target"]
    )
    full_aqc = bool(skvecs.num_skvecs == dim)

    stop_stagnant = None if full_aqc else aqcopt.NotImproveStopper(num_iters=40)
    objv = skc.SketchingObjectiveEx(
        circ=circ,
        skvecs=skvecs,
        enable_stats=True,
        stop_timeout=aqcopt.TimeoutStopper(time_limit=config["time_limit"]),
        stop_stagnant=stop_stagnant,
        stop_small_fobj=aqcopt.SmallObjectiveStopper(fobj_thr=1e-2),
        logger=logger,
    )

    if full_aqc:
        result = _full_aqc(maxiter=maxiter, thetas_0=thetas_0, objv=objv)
    else:
        result = _stochastic_aqc(
            maxiter=maxiter,
            learn_rate=float(config["learn_rate"]),
            thetas_0=thetas_0,
            objv=objv,
            stop_stagnant=stop_stagnant,
            logger=logger,
        )

    ansatz_matrix = to_host(ansatz_to_matrix(circ, result["thetas"]))
    result["fidelity"] = sku.fidelity(ansatz_matrix, config["su_target"])
    result["nit"] = result["num_iters"]
    result["ini_thetas"] = thetas_0
    result["stats"] = objv.statistics
    return result


def aqc_sketching(
    *,
    num_qubits: int,
    num_layers: int,
    num_skvecs: int,
    circ_layout: str,
    maxiter: int,
    learn_rate: float,
    skvecs_type: str,
    target_name_or_func: Union[str, Callable[[int], np.ndarray]],
    result_folder: str,
    parametric_depth: int = 3,
    seed: int = int(round(time.time())),
    time_limit: int = -1,
    num_simulations: int = 1,
    num_jobs: int = 1,
    tag: str = "",
    job_cache_dir: Optional[str] = None,
    logger: Optional[logging.Logger] = None,
) -> str:
    """Runs multi-start AQC-sketching simulations; returns the results folder
    (cf. reference aqc_sketching, aqc_sketching.py:165-283).

    ``job_cache_dir``: stable directory for per-job result caching — re-run
    the same call after a crash and completed restarts are reused instead of
    recomputed (see parallel.executor.run_jobs)."""
    assert chk.is_int(num_qubits, num_qubits >= 2)
    assert chk.is_int(num_skvecs, num_skvecs > 0)
    assert circ_layout in sku.supported_layouts()
    assert chk.is_int(maxiter, maxiter > 0)
    assert chk.is_float(learn_rate, 0 < learn_rate < 1)

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
        "num_skvecs": int(num_skvecs),
        "circuit_layout": circ_layout,
        "maxiter": int(maxiter),
        "learn_rate": float(learn_rate),
        "skvecs_type": str(skvecs_type),
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
