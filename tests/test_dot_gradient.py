"""Gradient verification of the analytic co-sweep vs three independent methods.

Ports the reference's gradient test strategy (SURVEY.md §4, BASELINE.md):

1. co-sweep vs JAX autodiff — parity <= 1e-10,
2. numeric central differences with step halving — relative error <= 1e-5 on
   the last 4 halvings AND Taylor-residual convergence order in [1.8, 2.2]
   (reference ``utils_dot_gradient_test.py:166-238, 275-306``),
3. partial-vs-full gradient under random block insertion — inserted range
   matches the full gradient, outside entries are exactly zero
   (reference ``utils_dot_gradient_test.py:88-163``).

Objective under test: ``fobj = <x | V(Θ)† | y>`` (complex) — the core of every
objective in the framework.
"""

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    make_trotter_like_circuit,
)
from aqc_research_tpu.ops.gradients import (
    dot_product,
    grad_of_dot_product,
    grad_of_dot_product_autodiff,
    grad_of_matrix_dot_product,
)
from aqc_research_tpu.ops.statevector import v_dagger_mul_mat, v_dagger_mul_vec
from aqc_research_tpu.utils import rand_circuit, rand_state, rand_thetas

from .oracle import oracle_matrix

SQRT_EPS = float(np.sqrt(np.finfo(np.float64).eps))


def _make_circ(num_qubits, entangler, trotter, second_order=False):
    if trotter:
        layers = int(np.random.randint(1, 3))
        blocks = make_trotter_like_circuit(num_qubits, layers)
        return TrotterAnsatz.make(num_qubits, blocks, second_order)
    depth = int(np.random.randint(num_qubits, 3 * num_qubits))
    blocks = create_ansatz_structure(num_qubits, "spin", "full", depth)
    return Ansatz.make(num_qubits, entangler, blocks)


def _vh_y(circ, thetas, y):
    return np.asarray(v_dagger_mul_vec(circ, thetas, y))


CONFIGS = [
    (n, e, False, False) for n in (2, 3) for e in ("cx", "cz", "cp")
] + [(n, "cx", True, so) for n in (2, 3, 4) for so in (False, True)]


class TestCosweepVsAutodiff:
    @pytest.mark.parametrize("num_qubits,entangler,trotter,second_order", CONFIGS)
    def test_full_gradient(self, num_qubits, entangler, trotter, second_order):
        circ = _make_circ(num_qubits, entangler, trotter, second_order)
        thetas = rand_thetas(circ.num_thetas)
        x = rand_state(num_qubits)
        y = rand_state(num_qubits)
        g_sweep = np.asarray(
            grad_of_dot_product(circ, thetas, x, _vh_y(circ, thetas, y))
        )
        g_auto = np.asarray(grad_of_dot_product_autodiff(circ, thetas, x, y))
        assert np.max(np.abs(g_sweep - g_auto)) < 1e-10

    def test_matrix_gradient_vs_autodiff(self):
        num_qubits, m = 3, 4
        circ = _make_circ(num_qubits, "cp", False)
        thetas = rand_thetas(circ.num_thetas)
        x = np.random.rand(2**num_qubits, m) + 1j * np.random.rand(2**num_qubits, m)
        y = np.random.rand(2**num_qubits, m) + 1j * np.random.rand(2**num_qubits, m)
        vh_y = np.asarray(v_dagger_mul_mat(circ, thetas, y))
        g_sweep = np.asarray(grad_of_matrix_dot_product(circ, thetas, x, vh_y))
        g_auto = np.asarray(grad_of_dot_product_autodiff(circ, thetas, x, y))
        assert np.max(np.abs(g_sweep - g_auto)) < 1e-10


class TestNumericGradient:
    """Reference numeric-gradient harness (utils_dot_gradient_test.py:68-238)."""

    @pytest.mark.parametrize(
        "num_qubits,entangler,trotter,second_order",
        [(2, "cx", False, False), (3, "cp", False, False), (3, "cx", True, True)],
    )
    def test_numeric_and_taylor(self, num_qubits, entangler, trotter, second_order):
        circ = _make_circ(num_qubits, entangler, trotter, second_order)
        thetas = rand_thetas(circ.num_thetas)
        x = rand_state(num_qubits)
        y = rand_state(num_qubits)

        def objective_from_matrix(th):
            v = oracle_matrix(circ, th)
            return np.vdot(x, v.conj().T @ y)

        def objective(th):
            return complex(dot_product(circ, th, x, y))

        fobj = objective(thetas)
        assert abs(fobj - objective_from_matrix(thetas)) < SQRT_EPS
        grad = np.asarray(grad_of_dot_product(circ, thetas, x, _vh_y(circ, thetas, y)))

        tau = 0.25
        residual_prev = 1e20
        errors, orders = [], []
        for step in range(12):
            num_grad = np.zeros(thetas.size, dtype=complex)
            th_tau = thetas.copy()
            for i in range(thetas.size):
                th_tau[i] = thetas[i] - tau
                f_m = objective_from_matrix(th_tau)
                th_tau[i] = thetas[i] + tau
                f_p = objective_from_matrix(th_tau)
                num_grad[i] = (f_p - f_m) / (2.0 * tau)
                th_tau[i] = thetas[i]

            grad_norm = max(np.linalg.norm(grad), np.finfo(np.float64).eps ** 2)
            errors.append(float(np.linalg.norm(grad - num_grad) / grad_norm))

            grad_dir = grad / grad_norm
            delta = np.real(grad_dir * tau)
            fobj_delta = objective(thetas + delta)
            residual = abs(fobj + np.dot(grad, delta) - fobj_delta)
            orders.append(
                0.0 if step == 0 else (np.log(residual_prev) - np.log(residual)) / np.log(2.0)
            )
            tau /= 2
            residual_prev = residual

        assert np.all(np.asarray(errors[-4:]) <= 1e-5), errors
        assert np.all(
            (1.8 <= np.asarray(orders[-4:])) & (np.asarray(orders[-4:]) <= 2.2)
        ), orders


class TestPartialGradient:
    """Partial-vs-full gradient under random block insertion
    (utils_dot_gradient_test.py:88-163)."""

    @pytest.mark.parametrize("front_layer", [False, True])
    @pytest.mark.parametrize("trotter", [False, True])
    def test_partial_vs_full(self, trotter, front_layer):
        num_qubits = 3
        tol = SQRT_EPS
        if trotter:
            layers = int(np.random.randint(1, 3))
            circ = TrotterAnsatz.make(
                num_qubits, make_trotter_like_circuit(num_qubits, layers), True
            )
            new_blocks = make_trotter_like_circuit(
                num_qubits, int(np.random.randint(1, 3))
            )
            insert_pos = circ.bpl * int(np.random.randint(0, circ.num_layers + 1))
        else:
            depth = int(np.random.randint(num_qubits, 3 * num_qubits))
            circ = Ansatz.make(num_qubits, "cz", rand_circuit(num_qubits, depth))
            new_blocks = rand_circuit(
                num_qubits, int(np.random.randint(num_qubits // 2, 2 * num_qubits))
            )
            insert_pos = int(np.random.randint(0, circ.num_blocks + 1))

        block_range = (insert_pos, insert_pos + new_blocks.shape[1])
        thetas = rand_thetas(circ.num_thetas)
        circ, thetas, idx = circ.insert_unit_blocks(insert_pos, new_blocks, thetas)
        assert np.all(thetas[idx] == 0)

        x = rand_state(num_qubits)
        y = rand_state(num_qubits)
        vh_y = _vh_y(circ, thetas, y)
        g_full = np.asarray(grad_of_dot_product(circ, thetas, x, vh_y))
        g_part = np.asarray(
            grad_of_dot_product(
                circ, thetas, x, vh_y, block_range=block_range, front_layer=front_layer
            )
        )

        front_part = circ.subset1q(g_part)
        front_full = circ.subset1q(g_full)
        if front_layer:
            assert np.allclose(front_part, front_full, atol=tol, rtol=tol)
        else:
            assert np.allclose(front_part, 0, atol=tol, rtol=tol)

        assert np.allclose(g_part[idx], g_full[idx], atol=tol, rtol=tol)
        old = circ.subset2q(g_part)[0 : block_range[0], :]
        assert old.size == 0 or np.allclose(old, 0, atol=tol, rtol=tol)
        old = circ.subset2q(g_part)[block_range[1] :, :]
        assert old.size == 0 or np.allclose(old, 0, atol=tol, rtol=tol)


class TestParameterShiftGradient:
    """The reference's third independent method: EXACT parameter-shift
    gradients (test_core_op_matrix.py:114-140) — rotation parameters via
    +/- pi shifts (scale 1/4), the CPhase angle via +/- pi/2 (scale 1/2) —
    must match the analytic co-sweep to ~sqrt(eps)."""

    @pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
    def test_shift_rule_vs_cosweep(self, entangler):
        n = 3
        circ = _make_circ(n, entangler, trotter=False)
        thetas = rand_thetas(circ.num_thetas)
        x = rand_state(n)
        y = rand_state(n)
        g_sweep = np.asarray(
            grad_of_dot_product(circ, thetas, x, _vh_y(circ, thetas, y))
        )

        cphase = np.zeros(thetas.size, dtype=bool)
        if circ.entangler == "cp":
            np.asarray(circ.subset2q(cphase))[:, 4] = True
        th_tau = thetas.copy()
        g_shift = np.zeros(thetas.size, dtype=complex)
        for i in range(thetas.size):
            tau, scale = (np.pi / 2, 0.5) if cphase[i] else (np.pi, 0.25)
            th_tau[i] = thetas[i] - tau
            v_m = oracle_matrix(circ, th_tau)
            th_tau[i] = thetas[i] + tau
            v_p = oracle_matrix(circ, th_tau)
            g_shift[i] = scale * np.vdot((v_p - v_m) @ x, y)
            th_tau[i] = thetas[i]

        assert np.max(np.abs(g_sweep - g_shift)) < SQRT_EPS, entangler
