"""MPS fast gradient vs the dense co-sweep gradient.

Ports the reference's shared gradient-test harness applied to the MPS engine
(``test_mps_fast_dot_gradient.py:34-109``): same config matrix over
{trotter 1st/2nd order} x {flip bit}, comparing against the (already
oracle-verified) dense-engine gradient at no-truncation threshold.
"""

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.program import ProgramBuilder
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.ops.gradients import grad_of_dot_product
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient
from aqc_research_tpu.ops.statevector import v_dagger_mul_vec
from aqc_research_tpu.utils import rand_thetas

from .oracle import relative_diff


def _flip_state_pair(n, flip_bit, chi):
    """(dense, MPS) of |0> or X_i|0>."""
    qb = ProgramBuilder(n)
    if flip_bit >= 0:
        qb.x(flip_bit)
    prog = qb.build()
    dense = np.zeros(2**n, dtype=np.complex128)
    dense[0 if flip_bit < 0 else (1 << flip_bit)] = 1
    return dense, mpsop.mps_from_program(prog, n, chi_max=chi)


CONFIGS = [
    (n, so, fb)
    for n in (2, 3)
    for so in (False, True)
    for fb in (-1, 0)
]


class TestMpsFastDotGradient:
    @pytest.mark.parametrize("num_qubits,second_order,flip_bit", CONFIGS)
    def test_full_gradient_vs_dense(self, num_qubits, second_order, flip_bit):
        n = num_qubits
        layers = int(np.random.randint(1, 3))
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), second_order)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n  # exact

        # Random target state (moderately entangled).
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))

        vh_phi_mps = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_phi_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        assert (
            relative_diff(np.asarray(mpsop.mps_to_vector(vh_phi_mps)), vh_phi_dense)
            < 1e-8
        )

        x_dense, x_mps = _flip_state_pair(n, flip_bit, chi)
        g_mps = np.asarray(fast_dot_gradient(circ, thetas, x_mps, vh_phi_mps))
        g_dense = np.asarray(
            grad_of_dot_product(circ, thetas, x_dense, vh_phi_dense)
        )
        assert np.max(np.abs(g_mps - g_dense)) < 1e-9

    def test_partial_gradient_vs_dense(self):
        n = 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        vh_mps = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        x_dense, x_mps = _flip_state_pair(n, -1, chi)

        block_range = (circ.bpl, 2 * circ.bpl)  # second layer only
        for front in (False, True):
            g_mps = np.asarray(
                fast_dot_gradient(
                    circ, thetas, x_mps, vh_mps,
                    block_range=block_range, front_layer=front,
                )
            )
            g_dense = np.asarray(
                grad_of_dot_product(
                    circ, thetas, x_dense, vh_dense,
                    block_range=block_range, front_layer=front,
                )
            )
            assert np.max(np.abs(g_mps - g_dense)) < 1e-9
            # outside-range entries exactly zero
            assert np.all(circ.subset2q(g_mps)[: block_range[0]] == 0)
