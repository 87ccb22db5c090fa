"""Max-projection surrogate objective on full state vectors.

TPU-native counterpart of the reference ``SpSurrogateObjectiveMax``
(``/root/reference/aqc_research/model_sp_lhs/objective_lhs_sur_max.py:32-197``).

Objective:  ``fobj = 1 - (1-w)·hs2[0] - w·hs2[max]``  where
``hs[i] = <state_i | V† | target>`` over the flip-state subspace,
``max`` is the leading projection selected with 1.1x hysteresis, and the
weight ``w`` follows the EMA ``w += 0.1·(sqrt|fobj| - w)``.

The hot path — ``V† target`` plus ALL flip-state Hilbert-Schmidt products —
runs as one jitted kernel; the hysteresis / weight bookkeeping stays on the
host (it is sequential state across optimizer iterations).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import checking as chk
from ...circuit.ansatz import Ansatz
from ...ops.gradients import grad_of_dot_product
from ...ops.statevector import v_dagger_mul_vec
from ...optim.stoppers import GradientAmplifier
from ...utils import create_logger, from_host, to_host
from . import objective_base as obj_base

_logger = create_logger(__file__)


@partial(jax.jit, static_argnums=(0,))
def _vh_target_and_hs(circ: Ansatz, thetas, target, state_idx):
    """One fused pass: ``vh = V† target`` and the gathers
    ``hs[i] = vh[state_idx[i]]`` (ThinStateHandler O(1) dots)."""
    vh = v_dagger_mul_vec(circ, thetas, target)
    hs = vh[state_idx]
    return vh, hs


@partial(jax.jit, static_argnums=(0,))
def _vh_target_and_hs_dense(circ: Ansatz, thetas, target, states_mat):
    """Same with explicitly cached states: ``hs = conj(S) @ vh``."""
    vh = v_dagger_mul_vec(circ, thetas, target)
    hs = jnp.matmul(jnp.conj(states_mat), vh)
    return vh, hs


class SpSurrogateObjectiveMax(obj_base.SpLHSObjectiveBase):
    """Max-projection surrogate objective (full-vector engine)."""

    _gamma = 0.1  # EMA rate of the weighting factor

    def __init__(
        self,
        *,
        user_parameters: dict,
        circ: Ansatz,
        block_range: Optional[Tuple[int, int]] = None,
        front_layer: bool = False,
        verbose: bool = False,
        grad_scaler: Optional[GradientAmplifier] = None,
    ):
        super().__init__(user_parameters, circ, verbose=verbose)
        block_range = (0, circ.num_blocks) if block_range is None else block_range
        assert chk.is_tuple(block_range, len(block_range) == 2)
        assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks

        self._block_range = tuple(block_range)
        self._front_layer = bool(front_layer)
        self._fidelity = -1.0
        self._grad_scaler = grad_scaler
        self._hs = np.zeros(self._num_states, dtype=np.complex128)
        self._max_no = 0

    def _device_states_matrix(self):
        """Device copy of the handler's cached states via from_host — eager
        complex host->device transfers are lazily invalid on some TPU
        runtimes (CLAUDE.md); the copy is cached (states are static)."""
        if getattr(self, "_dev_states", None) is None:
            self._dev_states = from_host(self._state_handler.states_matrix)
        return self._dev_states

    def _device_init_state(self, state_no: int):
        cache = getattr(self, "_dev_init_states", None)
        if cache is None:
            cache = self._dev_init_states = {}
        if state_no not in cache:
            cache[state_no] = from_host(
                np.asarray(self._state_handler.init_state(state_no))
            )
        return cache[state_no]

    def objective(self, thetas: np.ndarray) -> float:
        self._store_latest_thetas(thetas)
        thetas = jnp.asarray(thetas)

        handler = self._state_handler
        if isinstance(handler, obj_base.ThinStateHandler):
            vh, hs = _vh_target_and_hs(
                self._circuit, thetas, self._target, jnp.asarray(handler.state_indices)
            )
        else:
            vh, hs = _vh_target_and_hs_dense(
                self._circuit, thetas, self._target, self._device_states_matrix()
            )
        self._vh_target = vh
        self._hs = to_host(hs)
        np.copyto(self._hs2, np.abs(self._hs) ** 2)

        # Hysteresis: switch the leading state only on a clearly better one
        # (cf. objective_lhs_sur_max.py:110-117).
        max_proj = self._hs2[self._max_no]
        for i in range(self.num_states):
            if 1.1 * max_proj < self._hs2[i]:
                max_proj = self._hs2[i]
                self._max_no = i

        wgh = self._weight
        self._fobj = float(1.0 - (1.0 - wgh) * self._hs2[0] - wgh * self._hs2[self._max_no])
        self._fidelity = float(self._hs2[0])
        self._service.on_end_objective()
        return self._fobj

    def gradient(self, thetas: np.ndarray) -> np.ndarray:
        self._service.on_begin_gradient(self._fobj, thetas, self._fidelity)
        self._calc_objective_before_gradient(thetas)
        thetas = jnp.asarray(thetas)

        optimize_front_layer = bool(
            self._front_layer or self._block_range == (0, self._circuit.num_blocks)
        )

        grad_0 = to_host(
            grad_of_dot_product(
                self._circuit,
                thetas,
                self._device_init_state(0),
                self._vh_target,
                block_range=self._block_range,
                front_layer=optimize_front_layer,
            )
        )

        if self._max_no == 0:
            grad_0 *= -2 * np.conj(self._hs[0])
            full_grad = grad_0.real.copy()
        else:
            grad_0 *= -2 * (1 - self._weight) * np.conj(self._hs[0])
            full_grad = grad_0.real.copy()
            grad_max = to_host(
                grad_of_dot_product(
                    self._circuit,
                    thetas,
                    self._device_init_state(self._max_no),
                    self._vh_target,
                    block_range=self._block_range,
                    front_layer=optimize_front_layer,
                )
            )
            grad_max *= -2 * self._weight * np.conj(self._hs[self._max_no])
            full_grad += grad_max.real

        if self._grad_scaler:
            full_grad *= self._grad_scaler.estimate(self._fobj)

        self._weight += self._gamma * (float(np.sqrt(abs(self._fobj))) - self._weight)
        self._service.on_end_gradient(
            self._fobj, self._fidelity, full_grad, self._hs2, self._weight
        )
        return full_grad

    @property
    def fidelity(self) -> float:
        return self._fidelity
