"""Early-termination trackers and gradient amplification.

TPU-native counterpart of the reference's stopper classes
(``/root/reference/aqc_research/optimizer.py:30-398``).  The exception-driven
control flow is kept at the Python driver level — the hot compute (objective +
gradient) is jitted, so these light host-side checks between device steps cost
nothing.  The fully-jitted optimizer path (optim/lbfgs.py) additionally
implements the same stopping conditions as pure ``lax.while_loop`` carry
flags for host-roundtrip-free runs.
"""

from __future__ import annotations

from time import perf_counter
from typing import Callable, Optional, Union

import numpy as np

from .. import checking as chk
from ..utils import create_logger

_logger = create_logger(__file__)


class StagnantOptimizationWarning(UserWarning):
    """Raised when the optimization makes no progress (cf. optimizer.py:30)."""


class TimeoutStopper:
    """Raises TimeoutError once a wall-clock limit is exceeded
    (cf. optimizer.py:36-60)."""

    def __init__(self, *, time_limit: int):
        assert chk.is_int(time_limit)
        self._end_time = -1.0
        if time_limit > 0:
            self._end_time = perf_counter() + time_limit

    def check(self) -> None:
        if 0 < self._end_time < perf_counter():
            raise TimeoutError("Early termination: timeout")


class NotImproveStopper:
    """Flags/raises when fobj has not decreased for ``num_iters`` iterations
    (cf. optimizer.py:63-123); supports reset/disable for restart loops."""

    def __init__(self, *, num_iters: int, raise_ex: bool = True):
        assert chk.is_int(num_iters, num_iters > 1)
        self._num_iters = int(num_iters)
        self._min_fobj = np.inf
        self._min_iteration = 0
        self._enabled = True
        self._raise_ex = bool(raise_ex)

    def reset(self) -> None:
        self._min_fobj = np.inf
        self._min_iteration = 0
        self._enabled = True

    def disable(self) -> None:
        self._enabled = False

    def check(self, fobj: float, iter_no: int) -> bool:
        if not self._enabled:
            return False
        if fobj < self._min_fobj:
            self._min_fobj = fobj
            self._min_iteration = iter_no
        elif iter_no - self._min_iteration > self._num_iters:
            if self._raise_ex:
                raise StagnantOptimizationWarning("Early termination, no improvement")
            return True
        return False


class SmallObjectiveStopper:
    """Raises StopIteration once fobj falls below a threshold
    (cf. optimizer.py:126-155)."""

    def __init__(self, *, fobj_thr: float):
        assert chk.is_float(fobj_thr)
        self._fobj_thr = float(fobj_thr)

    def check(self, fobj: float) -> None:
        if fobj < self._fobj_thr:
            raise StopIteration(
                f"Early termination, objective fobj={fobj:0.5f} fell below the "
                f"threshold={self._fobj_thr:0.5f}"
            )


class TimeoutChecker:
    """Timeout tracker that snapshots the best-so-far result before raising
    (cf. optimizer.py:158-225)."""

    def __init__(self, *, time_limit: Union[int, dict], start_immediately: bool = True):
        if isinstance(time_limit, dict):
            time_limit = time_limit.get("timeout", -1)
        assert chk.is_int(time_limit)
        self._end_time = -1.0
        self._time_limit = int(time_limit)
        self._results: dict = {}
        if start_immediately:
            self.start()

    def start(self) -> None:
        self._end_time = (
            -1.0 if self._time_limit <= 0 else perf_counter() + self._time_limit
        )

    def check(
        self,
        fobj: float,
        thetas: np.ndarray,
        on_stop: Optional[Callable[[float, np.ndarray], dict]] = None,
    ) -> None:
        if 0 < self._end_time < perf_counter():
            if on_stop is not None:
                self._results = on_stop(fobj, thetas)
            raise TimeoutError("early termination: timeout")

    @property
    def optim_results(self) -> dict:
        return self._results


class EarlyStopper:
    """Combined fobj-threshold / no-improvement / fidelity-threshold stopper
    with best-so-far snapshots (cf. optimizer.py:228-336)."""

    def __init__(
        self,
        fobj_thr: Optional[float] = None,
        fidelity_thr: Optional[float] = None,
        num_iters: Optional[int] = None,
    ):
        assert fidelity_thr is None or 0 < fidelity_thr <= 1
        self._fobj_thr = fobj_thr
        self._fidelity_thr = fidelity_thr
        self._early_stop_iters = num_iters if num_iters else -1
        self._min_fobj = np.inf
        self._min_thetas = np.empty(0)
        self._min_iteration = 0
        self._results: dict = {}

    def check(
        self,
        fobj: Union[float, None],
        fidelity: Union[float, None],
        thetas: np.ndarray,
        iter_no: int,
        on_stop: Callable[[float, np.ndarray], dict],
    ) -> None:
        if self._min_thetas.size == 0:
            self._min_thetas = np.asarray(thetas).copy()

        if fobj is not None and self._fobj_thr is not None and fobj < self._fobj_thr:
            self._results = on_stop(fobj, thetas)
            raise StopIteration(
                f"early termination, objective fobj={fobj:0.5f} fell below the "
                f"threshold={self._fobj_thr:0.5f}"
            )

        if fobj is not None and self._early_stop_iters > 0:
            if fobj < self._min_fobj:
                self._min_fobj = fobj
                np.copyto(self._min_thetas, np.asarray(thetas))
                self._min_iteration = iter_no
            elif iter_no - self._min_iteration > self._early_stop_iters:
                self._results = on_stop(self._min_fobj, self._min_thetas)
                raise StopIteration("Early termination, no improvement")

        if (
            fidelity is not None
            and self._fidelity_thr is not None
            and fidelity >= self._fidelity_thr
        ):
            self._results = on_stop(fobj, thetas)
            raise StopIteration(
                f"early termination, fidelity={fidelity:0.3f} exceeded "
                f"the threshold={self._fidelity_thr:0.3f}"
            )

    @property
    def optim_results(self) -> dict:
        return self._results


class GradientAmplifier:
    """Log-scale amplification of vanishing gradients on barren plateaus,
    estimated from the peak-to-peak deviation of recent fobj samples
    (cf. optimizer.py:339-398).  Experimental, off by default."""

    def __init__(self, history: int = 5, strong: bool = False, verbose: bool = False):
        assert chk.is_int(history, history >= 3)
        self._history = np.zeros(history)
        self._counter = 0
        self._logarithm = np.log if strong else np.log10
        self._scale = 1.0
        self._verbose = bool(verbose)
        if verbose:
            _logger.warning("enabled gradient amplification in case of barren plateau")

    def estimate(self, fobj: float) -> float:
        self._history[self._counter % self._history.size] = fobj
        self._counter += 1
        if self._counter < self._history.size:
            return 1.0
        dev = float(np.ptp(self._history))
        new_scale = max(-float(self._logarithm(max(dev, 1e-8))), 1.0)
        self._scale += 0.3 * (new_scale - self._scale)
        if self._verbose and self._scale > 1.5:
            _logger.info("gradient scale: %0.4f", self._scale)
        return self._scale
