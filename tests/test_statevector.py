"""Parity tests of the statevector / matrix engine against the NumPy oracle.

Mirrors the reference test strategy (SURVEY.md §4): oracle-based elementwise
comparison, algebraic identities V V† x == x, and cross-implementation
consistency — reference tests ``test_core_operations.py:124-321`` and
``test_core_op_matrix.py:142-303``.
"""

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    make_trotter_like_circuit,
)
from aqc_research_tpu.ops.statevector import (
    ansatz_to_matrix,
    apply_1q,
    apply_2q,
    v_dagger_mul_mat,
    v_dagger_mul_vec,
    v_mul_mat,
    v_mul_vec,
)
from aqc_research_tpu.circuit import gates as G
from aqc_research_tpu.utils import rand_circuit, rand_state, rand_thetas

from .oracle import np_gate_on_qubit, np_two_qubit_on, oracle_matrix, relative_diff

TOL = 1e-12


def _random_generic(num_qubits, entangler):
    depth = int(np.random.randint(num_qubits, 3 * num_qubits))
    blocks = rand_circuit(num_qubits, depth)
    return Ansatz.make(num_qubits, entangler, blocks)


def _random_trotter(num_qubits, second_order):
    layers = int(np.random.randint(1, 3))
    blocks = make_trotter_like_circuit(num_qubits, layers)
    return TrotterAnsatz.make(num_qubits, blocks, second_order)


class TestPrimitives:
    def test_apply_1q_vs_oracle(self):
        for n in (2, 3, 4):
            vec = rand_state(n)
            for q in range(n):
                gate = G.np_ry(0.7 * (q + 1)) @ G.np_rz(-0.3)
                expected = np_gate_on_qubit(gate, q, n) @ vec
                got = np.asarray(apply_1q(vec, np.asarray(gate), q))
                assert relative_diff(got, expected) < TOL

    def test_apply_2q_vs_oracle(self):
        rng = np.random.default_rng(7)
        for n in (2, 3, 4):
            vec = rand_state(n)
            g4 = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
            for c in range(n):
                for t in range(n):
                    if c == t:
                        continue
                    expected = np_two_qubit_on(g4, c, t, n) @ vec
                    got = np.asarray(apply_2q(vec, g4, c, t))
                    assert relative_diff(got, expected) < TOL

    def test_apply_1q_matrix_tail(self):
        n, m = 3, 4
        mat = (np.random.rand(2**n, m) + 1j * np.random.rand(2**n, m)).astype(
            np.complex128
        )
        gate = G.np_rx(0.9)
        for q in range(n):
            expected = np_gate_on_qubit(gate, q, n) @ mat
            got = np.asarray(apply_1q(mat, gate, q, tail=m))
            assert relative_diff(got, expected) < TOL


class TestCircuitApply:
    @pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
    @pytest.mark.parametrize("num_qubits", [2, 3, 4])
    def test_v_mul_vec_vs_oracle(self, num_qubits, entangler):
        circ = _random_generic(num_qubits, entangler)
        thetas = rand_thetas(circ.num_thetas)
        vec = rand_state(num_qubits)
        v = oracle_matrix(circ, thetas)
        assert relative_diff(np.asarray(v_mul_vec(circ, thetas, vec)), v @ vec) < TOL
        assert (
            relative_diff(
                np.asarray(v_dagger_mul_vec(circ, thetas, vec)), v.conj().T @ vec
            )
            < TOL
        )

    @pytest.mark.parametrize("second_order", [False, True])
    @pytest.mark.parametrize("num_qubits", [2, 3, 4, 5])
    def test_trotter_ansatz_vs_oracle(self, num_qubits, second_order):
        circ = _random_trotter(num_qubits, second_order)
        thetas = rand_thetas(circ.num_thetas)
        vec = rand_state(num_qubits)
        v = oracle_matrix(circ, thetas)
        assert relative_diff(np.asarray(v_mul_vec(circ, thetas, vec)), v @ vec) < TOL
        assert (
            relative_diff(
                np.asarray(v_dagger_mul_vec(circ, thetas, vec)), v.conj().T @ vec
            )
            < TOL
        )

    @pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
    def test_unitarity_identity(self, entangler):
        """V† V x == x and V V† x == x (reference test_core_operations.py:252-281)."""
        for num_qubits in (2, 3, 4):
            circ = _random_generic(num_qubits, entangler)
            thetas = rand_thetas(circ.num_thetas)
            vec = rand_state(num_qubits)
            y1 = v_dagger_mul_vec(circ, thetas, v_mul_vec(circ, thetas, vec))
            y2 = v_mul_vec(circ, thetas, v_dagger_mul_vec(circ, thetas, vec))
            assert relative_diff(np.asarray(y1), vec) < TOL
            assert relative_diff(np.asarray(y2), vec) < TOL

    @pytest.mark.parametrize("second_order", [False, True])
    def test_trotter_unitarity(self, second_order):
        circ = _random_trotter(4, second_order)
        thetas = rand_thetas(circ.num_thetas)
        vec = rand_state(4)
        y = v_dagger_mul_vec(circ, thetas, v_mul_vec(circ, thetas, vec))
        assert relative_diff(np.asarray(y), vec) < TOL


class TestMatrixEngine:
    @pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
    def test_v_mul_mat_vs_oracle(self, entangler):
        num_qubits, m = 3, 4
        circ = _random_generic(num_qubits, entangler)
        thetas = rand_thetas(circ.num_thetas)
        mat = (np.random.rand(2**num_qubits, m) + 1j * np.random.rand(2**num_qubits, m))
        v = oracle_matrix(circ, thetas)
        assert relative_diff(np.asarray(v_mul_mat(circ, thetas, mat)), v @ mat) < TOL
        assert (
            relative_diff(
                np.asarray(v_dagger_mul_mat(circ, thetas, mat)), v.conj().T @ mat
            )
            < TOL
        )

    def test_ansatz_to_matrix_consistency(self):
        """Dense matrix vs column-by-column v_mul_vec vs oracle
        (reference test_core_operations.py:283-321)."""
        circ = _random_generic(3, "cx")
        thetas = rand_thetas(circ.num_thetas)
        v_fast = np.asarray(ansatz_to_matrix(circ, thetas))
        v_oracle = oracle_matrix(circ, thetas)
        assert relative_diff(v_fast, v_oracle) < TOL
        cols = []
        for k in range(circ.dimension):
            e_k = np.zeros(circ.dimension, dtype=np.complex128)
            e_k[k] = 1
            cols.append(np.asarray(v_mul_vec(circ, thetas, e_k)))
        assert relative_diff(np.stack(cols, axis=1), v_oracle) < TOL

    def test_trotter_matrix(self):
        circ = _random_trotter(3, True)
        thetas = rand_thetas(circ.num_thetas)
        assert relative_diff(np.asarray(ansatz_to_matrix(circ, thetas)), oracle_matrix(circ, thetas)) < TOL
