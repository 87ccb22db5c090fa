"""Max-projection surrogate objective on MPS states (Trotterized ansatz).

TPU-native counterpart of the reference ``SpSurrogateObjectiveFastMpsTrotter``
(``/root/reference/aqc_research/model_sp_lhs/
objective_lhs_sur_fast_mps_trotter.py:42-233``): identical surrogate math to
the full-vector objective, but states live in MPS form — ``V† target`` is one
fused-block MPS sweep and the gradient is the MPS co-sweep
(ops/mps_gradient.py), instead of the reference's per-gate Aer round trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ...circuit.ansatz import Ansatz, TrotterAnsatz, first_layer_included, layer_to_block_range
from ...ops import mps as mpsop
from ...ops.mps_gradient import fast_dot_gradient
from ...optim.stoppers import GradientAmplifier
from ...utils import create_logger, to_host
from . import objective_base as obj_base

_logger = create_logger(__file__)


class SpSurrogateObjectiveFastMpsTrotter(obj_base.SpLHSObjectiveBase):
    """MPS surrogate objective; requires a Trotterized (nearest-neighbour)
    ansatz and a single bit flip (cf. reference :82, :105-106)."""

    _gamma = 0.1  # EMA rate of the weighting factor

    def __init__(
        self,
        *,
        user_parameters: dict,
        circ: Ansatz,
        layer_range: Optional[Tuple[int, int]] = None,
        alt_layers: bool = False,
        verbose: bool = False,
        grad_scaler: Optional[GradientAmplifier] = None,
    ):
        super().__init__(user_parameters, circ, use_mps=True, verbose=verbose)
        assert isinstance(circ, TrotterAnsatz)
        if layer_range is None:
            layer_range = (0, circ.num_layers)
        if alt_layers:
            _logger.warning(
                "alternating optimization is disabled; 'alt_layers' set to False"
            )

        self._trunc_thr = float(user_parameters["trunc_thr"])
        self._layer_range = tuple(layer_range)
        self._fidelity = -1.0
        self._grad_scaler = grad_scaler
        if self.num_states != circ.num_qubits + 1:
            raise ValueError("this objective handles single-bit flip states only")
        self._hs = np.zeros(self._num_states, dtype=np.complex128)
        self._max_no = 0

        # Fast path for X-layer (product) state preps: all n+1 flip-state
        # Hilbert-Schmidt products come from ONE O(n chi^2) amplitude sweep
        # (ops/mps.py::mps_flip_amplitudes) instead of n+1 transfer-matrix
        # dots.  General preps fall back to per-state MPS dots.
        self._base_bits = None
        prep = user_parameters.get("state_prep_func", None)
        if prep is not None:
            program = prep(circ.num_qubits)
            if all(g.name == "x" for g in program):
                bits = [0] * circ.num_qubits
                for g in program:
                    bits[g.qubits[0]] ^= 1
                self._base_bits = tuple(bits)
        else:
            self._base_bits = tuple([0] * circ.num_qubits)

    def objective(self, thetas: np.ndarray) -> float:
        self._store_latest_thetas(thetas)
        assert mpsop.check_mps(self.target) or isinstance(self.target, mpsop.MPS)

        if mpsop.v_dagger_layer_cache_eligible(self._circuit):
            # Per-layer z cache: halves the gradient's z-side decompositions
            # (consumed by fast_dot_gradient below).
            self._vh_target, self._z_layers = mpsop.v_dagger_mul_mps_layers(
                self._circuit, thetas, self.target, trunc_thr=self._trunc_thr
            )
        else:
            self._vh_target = mpsop.v_dagger_mul_mps(
                self._circuit, thetas, self.target, trunc_thr=self._trunc_thr
            )
            self._z_layers = None
        if self._base_bits is not None:
            # to_host: complex device->host transfer (CLAUDE.md).
            amps = to_host(
                mpsop.mps_flip_amplitudes(self._vh_target, self._base_bits)
            )
            np.copyto(self._hs, amps)
        else:
            for i in range(self.num_states):
                self._hs[i] = self._state_handler.state_dot_vector(i, self._vh_target)
        np.copyto(self._hs2, np.abs(self._hs) ** 2)

        # 1.1x hysteresis on the leading projection (reference :145-152).
        max_proj = self._hs2[self._max_no]
        for i in range(self.num_states):
            if 1.1 * max_proj < self._hs2[i]:
                max_proj = self._hs2[i]
                self._max_no = i

        wgh = self._weight
        self._fobj = float(
            1.0 - (1.0 - wgh) * self._hs2[0] - wgh * self._hs2[self._max_no]
        )
        self._fidelity = float(self._hs2[0])
        self._service.on_end_objective()
        return self._fobj

    def gradient(self, thetas: np.ndarray) -> np.ndarray:
        self._service.on_begin_gradient(self._fobj, thetas, self._fidelity)
        self._calc_objective_before_gradient(thetas)

        circ = self._circuit
        block_range = layer_to_block_range(circ, self._layer_range)
        optimize_front_layer = first_layer_included(circ, self._layer_range)

        grad_0 = to_host(
            fast_dot_gradient(
                circ,
                thetas,
                self._state_handler.init_state(0),
                self._vh_target,
                trunc_thr=self._trunc_thr,
                block_range=block_range,
                front_layer=optimize_front_layer,
                z_layers=getattr(self, "_z_layers", None),
            )
        )

        if self._max_no == 0:
            grad_0 *= -2 * np.conj(self._hs[0])
            full_grad = grad_0.real.copy()
        else:
            grad_0 *= -2 * (1 - self._weight) * np.conj(self._hs[0])
            full_grad = grad_0.real.copy()
            grad_max = to_host(
                fast_dot_gradient(
                    circ,
                    thetas,
                    self._state_handler.init_state(self._max_no),
                    self._vh_target,
                    trunc_thr=self._trunc_thr,
                    block_range=block_range,
                    front_layer=optimize_front_layer,
                    z_layers=getattr(self, "_z_layers", None),
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
