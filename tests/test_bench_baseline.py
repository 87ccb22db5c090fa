"""Parity of the benchmark's NumPy CPU baseline vs the JAX engine.

Guards the honesty of bench.py: the baseline must compute exactly the same
objective and gradient as the TPU path.
"""

import sys

import numpy as np

sys.path.insert(0, ".")  # repo root (benchmarks/ is not a package member)
from benchmarks import numpy_baseline as npb  # noqa: E402

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.gradients import grad_of_dot_product
from aqc_research_tpu.ops.statevector import v_dagger_mul_vec
from aqc_research_tpu.utils import rand_state, rand_thetas


def test_baseline_vdagger_and_grad_parity():
    n = 4
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
    thetas = rand_thetas(circ.num_thetas)
    target = rand_state(n)

    vh_np = npb.v_dagger_mul_vec(circ, thetas, target)
    vh_jax = np.asarray(v_dagger_mul_vec(circ, thetas, target))
    assert np.max(np.abs(vh_np - vh_jax)) < 1e-12

    x = rand_state(n)
    g_np = npb.grad_of_dot_product(circ, thetas, x, vh_np)
    g_jax = np.asarray(grad_of_dot_product(circ, thetas, x, vh_jax))
    assert np.max(np.abs(g_np - g_jax)) < 1e-10


def test_baseline_objective_consistency():
    n = 4
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), False)
    thetas = rand_thetas(circ.num_thetas)
    target = rand_state(n)
    idx0 = 5
    fobj, grad = npb.asp_objective_and_gradient(circ, thetas, target, idx0)
    # Finite-difference check.
    eps = 1e-6
    for i in range(0, circ.num_thetas, 7):
        tp, tm = thetas.copy(), thetas.copy()
        tp[i] += eps
        tm[i] -= eps
        fp, _ = npb.asp_objective_and_gradient(circ, tp, target, idx0)
        fm, _ = npb.asp_objective_and_gradient(circ, tm, target, idx0)
        assert abs((fp - fm) / (2 * eps) - grad[i]) < 1e-6
