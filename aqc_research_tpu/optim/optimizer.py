"""High-level optimization loop with early-termination handling.

TPU-native counterpart of the reference ``AqcOptimizer`` / ``AQCOptimResult``
(``/root/reference/aqc_research/optimizer.py:401-633``).  Supported backends:

* ``"lbfgs"``  — SciPy L-BFGS-B driven from the host, calling the (jitted)
  objective/gradient; ``maxfun = 5 * maxiter`` as in the reference
  (optimizer.py:580-590).  For pure-JAX objectives the fully on-device
  alternative lives in :mod:`aqc_research_tpu.optim.lbfgs`.
* ``"adam"``   — optax Adam driven from the host (reference wraps Qiskit ADAM).
* ``"cobyla"`` — SciPy COBYLA, tol=0.001 (derivative-free).
* ``"bobyqa"`` — SciPy COBYQA (trust-region derivative-free with bound
  constraints, the closest in-tree relative of BOBYQA), bounds ±2pi.

Early termination keeps the reference's exception protocol: objectives raise
``StopIteration`` / ``TimeoutError`` / ``StagnantOptimizationWarning`` which
``optimize`` converts into best-so-far results.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import optax
import scipy.optimize as sciopt

from .. import checking as chk
from ..circuit.ansatz import Ansatz
from ..utils import create_logger
from .stoppers import EarlyStopper, StagnantOptimizationWarning, TimeoutChecker

_logger = create_logger(__file__)

_OPTIMIZERS = ["adam", "lbfgs", "cobyla", "bobyqa"]


class AQCOptimResult:
    """Canonical optimization-result dictionary (cf. optimizer.py:401-476)."""

    def __init__(self, circ: Ansatz, thetas_0: np.ndarray):
        self._result = {
            "cost": float(1e30),
            "num_iters": 0,
            "num_fun_ev": 0,
            "num_grad_ev": 0,
            "ini_thetas": np.asarray(thetas_0).copy(),
            "thetas": np.asarray(thetas_0).copy(),
            "blocks": circ.blocks.copy(),
            "entangler": circ.entangler,
            "stats": {},
        }

    def update_from_scipy(self, res: sciopt.OptimizeResult, blocks: np.ndarray):
        """Updates from a SciPy result; iteration counters accumulate because
        optimization may span several epochs (cf. optimizer.py:424-445)."""
        self._result["cost"] = float(res.fun)
        self._result["num_iters"] += int(getattr(res, "nit", 0) or 0)
        self._result["num_fun_ev"] += int(getattr(res, "nfev", 0) or 0)
        self._result["num_grad_ev"] += int(getattr(res, "njev", 0) or 0)
        self._result["thetas"] = np.asarray(res.x).copy()
        self._result["blocks"] = np.asarray(blocks).copy()

    def update_from_dict(self, res: dict):
        assert isinstance(res, dict)
        self._result.update(res)

    @property
    def thetas(self) -> np.ndarray:
        return self._result["thetas"]

    @property
    def as_dict(self) -> dict:
        return self._result


def _adam_minimize(fun, jac, x0, maxiter: int, learn_rate: float):
    """Host-driven Adam loop (reference wraps Qiskit ADAM, optimizer.py:578)."""
    opt = optax.adam(learning_rate=learn_rate)
    x = np.asarray(x0, dtype=np.float64).copy()
    state = opt.init(x)
    fval = float("inf")
    nit = 0
    for _ in range(maxiter):
        fval = float(fun(x))
        grad = np.asarray(jac(x), dtype=np.float64)
        updates, state = opt.update(grad, state, x)
        x = np.asarray(optax.apply_updates(x, updates))
        nit += 1
    res = sciopt.OptimizeResult(
        x=x, fun=float(fun(x)), nit=nit, nfev=nit + 1, njev=nit, success=True
    )
    return res


class AqcOptimizer:
    """Organizes the AQC/ASP optimization process with early-termination
    handling (cf. reference AqcOptimizer, optimizer.py:479-633)."""

    def __init__(
        self,
        *,
        optimizer_name: str = "lbfgs",
        maxiter: int = 1000,
        learn_rate: float = 0.1,
        lbfgs_maxcor: Optional[int] = None,
        verbose: bool = False,
    ):
        assert chk.is_str(optimizer_name, optimizer_name in _OPTIMIZERS)
        assert chk.is_int(maxiter, maxiter > 0)
        assert chk.is_float(learn_rate, 0 < learn_rate < 1)
        self._optimizer_name = optimizer_name
        self._maxiter = int(maxiter)
        self._learn_rate = float(learn_rate)
        self._lbfgs_maxcor = lbfgs_maxcor
        self._verbose = bool(verbose)

    def optimize(
        self,
        objv: Any,
        circ: Ansatz,
        thetas_0: np.ndarray,
        *,
        stopper: Optional[EarlyStopper] = None,
        timeout: Optional[TimeoutChecker] = None,
    ) -> dict:
        """Runs optimization; returns the canonical result dict (keys as in
        reference optimizer.py:546-559, including "is_timeout"/"fidelity")."""
        assert hasattr(objv, "objective") and hasattr(objv, "gradient")
        assert isinstance(circ, Ansatz)
        thetas_0 = np.asarray(thetas_0, dtype=np.float64)

        result = AQCOptimResult(circ, thetas_0)
        opname = self._optimizer_name
        is_timeout = False

        def _fun(th):
            return float(objv.objective(np.asarray(th)))

        def _jac(th):
            return np.asarray(objv.gradient(np.asarray(th)), dtype=np.float64)

        try:
            if hasattr(objv, "set_status_trackers"):
                objv.set_status_trackers(timeout=timeout, stopper=stopper)
            self._log(f"starting the {opname.upper()} loop ...")
            if opname == "adam":
                res = _adam_minimize(_fun, _jac, thetas_0, self._maxiter, self._learn_rate)
            elif opname == "lbfgs":
                options = {"maxiter": self._maxiter, "maxfun": 5 * self._maxiter}
                if self._lbfgs_maxcor:
                    options["maxcor"] = int(self._lbfgs_maxcor)
                res = sciopt.minimize(
                    _fun, thetas_0, jac=_jac, method="L-BFGS-B", options=options
                )
            elif opname == "cobyla":
                res = sciopt.minimize(
                    _fun,
                    thetas_0,
                    method="COBYLA",
                    tol=0.001,
                    options={"maxiter": self._maxiter},
                )
            elif opname == "bobyqa":
                bounds = [(-2 * np.pi, 2 * np.pi)] * thetas_0.size
                res = sciopt.minimize(
                    _fun,
                    thetas_0,
                    method="COBYQA",
                    bounds=bounds,
                    options={"maxiter": self._maxiter},
                )
            else:  # pragma: no cover
                raise ValueError(f"unsupported optimizer: {opname}")
            result.update_from_scipy(res, circ.blocks)

        except StopIteration as ex:
            self._log(str(ex))
            if hasattr(objv, "optim_results"):
                result.update_from_dict(objv.optim_results)
            elif stopper is not None:
                result.update_from_dict(stopper.optim_results)
        except StagnantOptimizationWarning as ex:
            self._log(str(ex))
            if hasattr(objv, "optim_results"):
                result.update_from_dict(objv.optim_results)
        except TimeoutError as ex:
            is_timeout = True
            self._log(str(ex))
            if hasattr(objv, "optim_results"):
                result.update_from_dict(objv.optim_results)
            elif timeout is not None:
                result.update_from_dict(timeout.optim_results)
        finally:
            result.update_from_dict({"is_timeout": is_timeout})
            if hasattr(objv, "fidelity"):
                result.update_from_dict({"fidelity": objv.fidelity})

        if hasattr(objv, "statistics"):
            stats = {"stats": objv.statistics}
            stats["stats"]["is_timeout"] = is_timeout
            result.update_from_dict(stats)

        return result.as_dict

    def _log(self, msg: str) -> None:
        if self._verbose:
            _logger.info(msg)
