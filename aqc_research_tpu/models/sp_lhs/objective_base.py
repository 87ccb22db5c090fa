"""State handlers and objective base for ASP with local Hilbert-Schmidt terms.

TPU-native counterpart of the reference objective infrastructure
(``/root/reference/aqc_research/model_sp_lhs/objective_base.py:42-833``).
The flip-state subspace {|0>, X_i|0>, X_i X_j|0>, ...} gives the "local"
surrogate objective its O(n) cost: each Hilbert-Schmidt product
``<state|V†|target>`` is a single gather (dense path) or an O(n chi^2)
contraction (MPS path) from the cached ``V† target``.

Host-side bookkeeping (iteration counters, statistics, hysteresis state)
stays in Python — the hot compute (``v_dagger_mul_vec`` + co-sweep gradient)
is jitted.
"""

from __future__ import annotations

import functools
import itertools
from abc import ABC, abstractmethod
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import checking as chk
from ...circuit.ansatz import Ansatz, TrotterAnsatz
from ...circuit.program import GateProgram, ProgramBuilder, program_to_state
from ...config import complex_dtype
from ...optim.stoppers import EarlyStopper, TimeoutChecker
from ...utils import create_logger, to_host

_logger = create_logger(__file__)


# -----------------------------------------------------------------------------
# Flip-state handlers (cf. objective_base.py:42-430).
# -----------------------------------------------------------------------------


def _host_pick(vec, idx):
    """Elements ``vec[idx]`` on the host.  Gathers on device first and
    fetches via to_host — complex device->host transfers of whole buffers
    fail on some TPU runtimes (CLAUDE.md)."""
    if isinstance(vec, jax.Array):
        return to_host(vec[jnp.asarray(np.atleast_1d(idx))])
    return np.asarray(vec)[np.atleast_1d(idx)]


class ThinStateHandler:
    """Flip states stored as single nonzero indices — O(1) memory per state,
    O(1) dot products via element picks (cf. objective_base.py:42-255)."""

    def __init__(self, num_qubits: int, max_flips: int, verbose: bool = False):
        assert chk.is_int(num_qubits, num_qubits >= 2)
        assert chk.is_int(max_flips, 0 <= max_flips <= num_qubits)
        if verbose:
            _logger.info("State handler: %s", self.__class__.__name__)

        dim = 2**num_qubits
        comb_labels, num_states = self._generate_combinations(num_qubits, max_flips)
        self._comb_labels = comb_labels
        self._num_qubits = num_qubits
        self._state_idx = np.zeros(num_states, dtype=np.int64)
        count = 1
        for flips in range(max_flips):
            for subset in comb_labels[flips]:
                index = 0
                for k in subset:
                    index ^= 1 << k  # little-endian bit flip
                assert 0 <= index < dim
                self._state_idx[count] = index
                count += 1
        assert count == num_states

    @property
    def state_indices(self) -> np.ndarray:
        """Nonzero-element index of every flip state (for jitted gathers)."""
        return self._state_idx

    def init_state(self, state_no: int):
        """One-hot vector of the requested flip state."""
        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        state = np.zeros(2**self._num_qubits, dtype=np.dtype(complex_dtype()))
        state[self._state_idx[state_no]] = 1
        return state

    @property
    def state0(self):
        return self.init_state(0)

    def state_dot_vector(self, state_no: int, vec) -> complex:
        """``<state|vec>`` — a single element pick."""
        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        return complex(_host_pick(vec, self._state_idx[state_no])[0])

    def init_composite_state_no_zero(self, coefs: np.ndarray) -> np.ndarray:
        """Linear combination of the flip states (|0> excluded)."""
        assert coefs.size == self.num_states - 1
        assert abs(np.linalg.norm(coefs) - 1) < np.sqrt(np.finfo(np.float64).eps)
        state = np.zeros(2**self._num_qubits, dtype=np.dtype(complex_dtype()))
        state[self._state_idx[1:]] = coefs
        return state

    def init_composite_state(self, coefs: np.ndarray) -> np.ndarray:
        """Linear combination of all states."""
        assert coefs.size == self.num_states
        assert abs(np.linalg.norm(coefs) - 1) < np.sqrt(np.finfo(np.float64).eps)
        state = np.zeros(2**self._num_qubits, dtype=np.dtype(complex_dtype()))
        state[self._state_idx] = coefs
        return state

    def composite_state_dot_vector_no_zero(self, coefs, vec) -> complex:
        assert coefs.size == self.num_states - 1
        return complex(np.vdot(coefs, _host_pick(vec, self._state_idx[1:])))

    def composite_state_dot_vector(self, coefs, vec) -> complex:
        assert coefs.size == self.num_states
        return complex(np.vdot(coefs, _host_pick(vec, self._state_idx)))

    @property
    def num_states(self) -> int:
        return self._state_idx.size

    @property
    def flip_qubit_positions(self) -> List[List[Tuple]]:
        return self._comb_labels

    @staticmethod
    def _generate_combinations(num_qubits: int, max_flips: int) -> Tuple[list, int]:
        s = list(range(num_qubits))
        comb_labels = [[] for _ in range(max_flips)]
        for flip in range(1, max_flips + 1):
            for subset in itertools.combinations(s, flip):
                comb_labels[flip - 1].append(subset)
        num_states = functools.reduce(lambda n, a: n + len(a), comb_labels, 1)
        return comb_labels, num_states


class GenericStateHandler:
    """Caches the full vectors ``S X_i |0>`` where ``S`` is a state-prep
    program (cf. objective_base.py:258-342).  max_flips <= 1."""

    def __init__(
        self,
        num_qubits: int,
        max_flips: int,
        state_prep_func: Optional[Callable[[int], GateProgram]] = None,
        verbose: bool = False,
    ):
        assert chk.is_int(num_qubits, num_qubits >= 2)
        if max_flips > 1:
            raise ValueError("expects 'max_flips <= 1' to save memory")
        if verbose:
            _logger.info("State handler: %s", self.__class__.__name__)

        num_states = num_qubits + 1
        self._states = np.zeros(
            (num_states, 2**num_qubits), dtype=np.dtype(complex_dtype())
        )
        for i in range(num_states):
            qb = ProgramBuilder(num_qubits)
            if i > 0:
                qb.x(i - 1)
            prog = qb.build()
            if state_prep_func is not None:
                prog = prog + tuple(state_prep_func(num_qubits))
            self._states[i] = to_host(program_to_state(prog, num_qubits))

    @property
    def states_matrix(self) -> np.ndarray:
        """(num_states, dim) — all cached states (for jitted batched dots)."""
        return self._states

    def init_state(self, state_no: int) -> np.ndarray:
        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        return self._states[state_no]

    def state_dot_vector(self, state_no: int, vec) -> complex:
        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        return complex(np.vdot(self._states[state_no], to_host(vec)))

    @property
    def state0(self) -> np.ndarray:
        return self._states[0]

    @property
    def num_states(self) -> int:
        return self._states.shape[0]

    def init_composite_state_no_zero(self, _):
        """Interface stub (cf. objective_base.py:328-342)."""
        raise NotImplementedError()

    def init_composite_state(self, _):
        raise NotImplementedError()

    def composite_state_dot_vector_no_zero(self, _, __):
        raise NotImplementedError()

    def composite_state_dot_vector(self, _, __):
        raise NotImplementedError()


class MpsStateHandler:
    """Flip states in MPS form (cf. objective_base.py:345-430).  max_flips <= 1."""

    def __init__(
        self,
        num_qubits: int,
        max_flips: int,
        state_prep_func: Optional[Callable[[int], GateProgram]] = None,
        verbose: bool = False,
        chi_max: int = 8,
    ):
        from ...ops import mps as mpsop

        assert chk.is_int(num_qubits, num_qubits >= 2)
        if max_flips > 1:
            raise ValueError("expects 'max_flips <= 1' to save memory & time")
        if verbose:
            _logger.info("State handler: %s", self.__class__.__name__)

        num_states = num_qubits + 1
        self._states = []
        for i in range(num_states):
            qb = ProgramBuilder(num_qubits)
            if i > 0:
                qb.x(i - 1)
            prog = qb.build()
            if state_prep_func is not None:
                prog = prog + tuple(state_prep_func(num_qubits))
            self._states.append(
                mpsop.mps_from_program(prog, num_qubits, chi_max=chi_max)
            )
        assert len(self._states) == num_states

    def init_state(self, state_no: int):
        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        return self._states[state_no]

    def state_dot_vector(self, state_no: int, vec) -> complex:
        from ...ops import mps as mpsop

        assert chk.is_int(state_no, 0 <= state_no < self.num_states)
        return complex(to_host(mpsop.mps_dot(self._states[state_no], vec)))

    @property
    def state0(self):
        return self._states[0]

    @property
    def num_states(self) -> int:
        return len(self._states)

    def init_composite_state_no_zero(self, _):
        """Interface stub (cf. objective_base.py:415-429)."""
        raise NotImplementedError()

    def init_composite_state(self, _):
        raise NotImplementedError()

    def composite_state_dot_vector_no_zero(self, _, __):
        raise NotImplementedError()

    def composite_state_dot_vector(self, _, __):
        raise NotImplementedError()


# -----------------------------------------------------------------------------
# Optimization bookkeeping service (cf. objective_base.py:437-622).
# -----------------------------------------------------------------------------


class SpService:
    """Iteration counters, early-stop dispatch, statistics accumulation,
    progress printing (cf. objective_base.py:437-622)."""

    def __init__(
        self,
        user_parameters: dict,
        circuit: Ansatz,
        num_states: int,
        verbose: bool = False,
    ):
        assert chk.is_dict(user_parameters)
        assert isinstance(circuit, Ansatz)
        self._params = user_parameters
        self._circuit = circuit
        self._num_states = num_states
        self._verbose = bool(verbose)
        self._num_fun_ev = 0
        self._num_grad_ev = 0
        self._stats: dict = {}
        self._timeout_checker: Optional[TimeoutChecker] = None
        self._early_stopper: Optional[EarlyStopper] = None

        if user_parameters.get("enable_optim_stats", False):
            self._stats = {
                "hs2": np.empty((0, num_states), dtype=np.float16),
                "weight": np.empty(0, dtype=np.float16),
                "fobj": np.empty(0, dtype=np.float32),
                "grad": np.empty(0, dtype=np.float32),
                "num_fun_ev": 0,
                "num_grad_ev": 0,
            }

    def set_status_trackers(
        self,
        timeout: Optional[TimeoutChecker] = None,
        stopper: Optional[EarlyStopper] = None,
    ):
        self._timeout_checker = timeout
        self._early_stopper = stopper

    @property
    def statistics(self) -> dict:
        return self._stats

    @property
    def num_fun_ev(self) -> int:
        return self._num_fun_ev

    @property
    def num_grad_ev(self) -> int:
        return self._num_grad_ev

    def _on_stop(self, fobj: float, thetas: np.ndarray) -> dict:
        if self._verbose:
            _logger.warning("optimizer halted early by a stop condition")
        return {
            "cost": fobj,
            "num_fun_ev": self._num_fun_ev,
            "num_grad_ev": self._num_grad_ev,
            "num_iters": self._num_grad_ev,
            "thetas": np.asarray(thetas).copy(),
            "blocks": self._circuit.blocks.copy(),
        }

    def on_begin_gradient(
        self, fobj: float, thetas: np.ndarray, fidelity: Optional[float] = None
    ):
        if self._timeout_checker:
            self._timeout_checker.check(fobj, thetas, self._on_stop)
        if self._early_stopper:
            self._early_stopper.check(
                fobj=fobj,
                fidelity=fidelity,
                thetas=thetas,
                iter_no=self._num_grad_ev,
                on_stop=self._on_stop,
            )

    def on_end_gradient(
        self,
        fobj: float,
        fidelity: float,
        grad: np.ndarray,
        hs2: np.ndarray,
        weight: float,
    ):
        self._num_grad_ev += 1
        if self._params.get("enable_optim_stats", False):
            sts = self._stats
            sts["hs2"] = np.vstack([sts["hs2"], np.asarray(hs2, np.float16)])
            sts["weight"] = np.append(sts["weight"], np.float16(weight))
            sts["fobj"] = np.append(sts["fobj"], np.float32(fobj))
            sts["grad"] = np.append(sts["grad"], np.float32(np.linalg.norm(grad)))
            sts["num_fun_ev"] = self._num_fun_ev
            sts["num_grad_ev"] = self._num_grad_ev
            sts["num_iters"] = self._num_grad_ev

        verbose = self._params.get("verbose", False)
        maxiter = self._params.get("maxiter", 100)
        if self._num_grad_ev % max(1, maxiter // 50) == 0:
            if verbose and self._params.get("num_simulations", 1) == 1:
                fid_str = f", fidelity: {fidelity:0.6f}" if fidelity >= 0 else ""
                _logger.info("fobj: %0.6f %s", fobj, fid_str)
            else:
                print(".", end="", flush=True)

    def on_end_objective(self):
        self._num_fun_ev += 1

    def on_epoch_end(self):
        if self._verbose:
            _logger.warning("epoch boundary reached (stats marked with NaN row)")
        if self._stats:
            sts = self._stats
            sts["hs2"] = np.vstack(
                [sts["hs2"], np.full((1, self._num_states), np.nan, np.float16)]
            )
            sts["weight"] = np.append(sts["weight"], np.float16(np.nan))
            sts["fobj"] = np.append(sts["fobj"], np.float32(np.nan))
            sts["grad"] = np.append(sts["grad"], np.float32(np.nan))


# -----------------------------------------------------------------------------
# Objective base class (cf. objective_base.py:630-833).
# -----------------------------------------------------------------------------


class SpLHSObjectiveBase(ABC):
    """Base for surrogate ASP objectives: caches ``V† target`` between the
    objective and gradient calls (the optimizer calls them separately), and
    recomputes the objective when thetas changed in between."""

    def __init__(
        self,
        user_parameters: dict,
        circuit: Ansatz,
        use_mps: bool = False,
        verbose: bool = False,
    ):
        assert isinstance(user_parameters, dict)
        assert isinstance(circuit, Ansatz)
        if verbose:
            _logger.info("Objective: %s", self.__class__.__name__)
            if isinstance(circuit, TrotterAnsatz):
                _logger.info("objective runs on a Trotterized ansatz")

        self._params = user_parameters
        self._circuit = circuit
        self._target = None
        self._last_thetas = np.empty(0)
        self._use_mps = bool(use_mps)
        self._verbose = bool(verbose)
        self._print_grad_warning = True
        self._vh_target = None

        num_qubits = user_parameters["num_qubits"]
        max_flips = user_parameters["max_flips"]
        state_prep_func = user_parameters.get("state_prep_func", None)
        if use_mps:
            # The flip states are multiplied by ansatz gates inside the MPS
            # co-sweep gradient, so their (static) bond dimension must be the
            # same working chi as the target path.
            chi_max = int(user_parameters.get("chi_max", 64))
            self._state_handler = MpsStateHandler(
                num_qubits, max_flips, state_prep_func, verbose, chi_max=chi_max
            )
            self._num_states = num_qubits + 1
            if max_flips != 1:
                raise ValueError("the MPS state handler supports max_flips=1 only")
        else:
            if state_prep_func is None:
                self._state_handler = ThinStateHandler(num_qubits, max_flips, verbose)
            else:
                self._state_handler = GenericStateHandler(
                    num_qubits, max_flips, state_prep_func, verbose
                )
            self._num_states = self._state_handler.num_states

        self._service = SpService(
            user_parameters, circuit, self._num_states, verbose=verbose
        )
        self._hs2 = np.zeros(self._num_states)
        self._fobj = 1.0
        self._weight = 1.0

    def _store_latest_thetas(self, thetas: np.ndarray):
        self._last_thetas = np.asarray(thetas).copy()

    def _calc_objective_before_gradient(self, thetas: np.ndarray):
        """Ensures the cached ``V† target`` corresponds to ``thetas``
        (cf. objective_base.py:715-734)."""
        tol = float(np.sqrt(np.finfo(np.float64).eps))
        last = self._last_thetas
        if last.size == 0 or not np.allclose(thetas, last, atol=tol, rtol=tol):
            self.objective(thetas)
            if self._verbose and self._print_grad_warning:
                _logger.warning(
                    "thetas changed since the last objective call — re-evaluating it before the gradient"
                )
                self._print_grad_warning = False

    @abstractmethod
    def objective(self, thetas: np.ndarray) -> float:
        raise NotImplementedError()

    @abstractmethod
    def gradient(self, thetas: np.ndarray) -> np.ndarray:
        raise NotImplementedError()

    def set_status_trackers(
        self,
        timeout: Optional[TimeoutChecker] = None,
        stopper: Optional[EarlyStopper] = None,
    ):
        self._service.set_status_trackers(timeout, stopper)

    @property
    def num_thetas(self) -> int:
        return self._circuit.num_thetas

    @property
    def num_states(self) -> int:
        return self._num_states

    @property
    def target(self):
        return self._target

    def set_target(self, target) -> None:
        if isinstance(target, (np.ndarray, jnp.ndarray)):
            assert not self._use_mps
            from ...utils import from_host

            # Complex host->device transfers are lazily invalid on some TPU
            # runtimes; route through the real/imag-plane helper.
            self._target = (
                from_host(target) if isinstance(target, np.ndarray) else target
            )
        else:
            assert self._use_mps
            self._target = target

    @property
    def statistics(self) -> dict:
        return self._service.statistics

    def on_epoch_end(self):
        self._service.on_epoch_end()
