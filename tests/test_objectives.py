"""Objective-level and end-to-end optimization tests.

Covers the reference's objective/driver behaviour: flip-state handlers
(test_sp_objective_base.py:36-99), the sur_max surrogate objective math,
small end-to-end ASP (perfect init + L-BFGS improves fidelity), full-AQC
sketching convergence, and coordinate descent.
"""

import numpy as np
import pytest

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    make_trotter_like_circuit,
)
from aqc_research_tpu.models.sketching import sk_core as skc
from aqc_research_tpu.models.sketching import sk_utils as sku
from aqc_research_tpu.models.sp_lhs.objective_base import (
    GenericStateHandler,
    ThinStateHandler,
)
from aqc_research_tpu.models.sp_lhs.sur_max import SpSurrogateObjectiveMax
from aqc_research_tpu.ops.coord_descent import coord_descent_single_sweep
from aqc_research_tpu.ops.statevector import ansatz_to_matrix, v_dagger_mul_vec
from aqc_research_tpu.optim import AqcOptimizer, EarlyStopper, TimeoutChecker
from aqc_research_tpu.targets.generator import make_target_matrix, make_su_matrix
from aqc_research_tpu.utils import rand_state, rand_thetas

from .oracle import oracle_matrix


class TestStateHandlers:
    def test_thin_handler_indices(self):
        """Flip-state nonzero index = XOR of 1<<k over flipped qubits."""
        n = 4
        handler = ThinStateHandler(n, max_flips=2)
        # 1 + n single flips + C(n,2) double flips
        assert handler.num_states == 1 + n + n * (n - 1) // 2
        assert handler.state_indices[0] == 0
        for i in range(1, n + 1):
            assert handler.state_indices[i] == 1 << (i - 1)
        state = handler.init_state(2)
        assert state[2] == 1 and np.sum(np.abs(state)) == 1

    def test_thin_vs_generic_handler(self):
        """Thin (index-pick) and generic (cached-vector) handlers agree."""
        n = 3
        thin = ThinStateHandler(n, max_flips=1)
        generic = GenericStateHandler(n, max_flips=1, state_prep_func=None)
        vec = rand_state(n)
        for i in range(thin.num_states):
            np.testing.assert_allclose(
                thin.state_dot_vector(i, vec), generic.state_dot_vector(i, vec)
            )
            np.testing.assert_allclose(thin.init_state(i), generic.init_state(i))

    def test_generic_handler_with_prep(self):
        """S applied after the flip: states = S X_i |0>."""
        n = 3
        prep = trotop.neel_init_state  # program-producing callable
        handler = GenericStateHandler(n, max_flips=1, state_prep_func=prep)
        from aqc_research_tpu.circuit.program import ProgramBuilder, program_to_state

        for i in range(handler.num_states):
            qb = ProgramBuilder(n)
            if i > 0:
                qb.x(i - 1)
            prog = qb.build() + tuple(prep(n))
            expected = np.asarray(program_to_state(prog, n))
            np.testing.assert_allclose(handler.init_state(i), expected, atol=1e-14)

    def test_composite_states(self):
        n = 3
        handler = ThinStateHandler(n, max_flips=1)
        coefs = np.random.rand(n) + 1j * np.random.rand(n)
        coefs /= np.linalg.norm(coefs)
        state = handler.init_composite_state_no_zero(coefs)
        vec = rand_state(n)
        np.testing.assert_allclose(
            handler.composite_state_dot_vector_no_zero(coefs, vec),
            np.vdot(state, vec),
        )


class TestSurMaxObjective:
    def _params(self, n):
        return {
            "num_qubits": n,
            "max_flips": 1,
            "maxiter": 50,
            "verbose": False,
            "enable_optim_stats": True,
            "num_simulations": 1,
        }

    def test_objective_value(self):
        n = 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), False)
        thetas = rand_thetas(circ.num_thetas)
        target = rand_state(n)
        objv = SpSurrogateObjectiveMax(
            user_parameters=self._params(n), circ=circ
        )
        objv.set_target(target)
        fobj = objv.objective(thetas)

        vh = np.asarray(v_dagger_mul_vec(circ, thetas, target))
        hs2 = np.abs(vh[[0] + [1 << k for k in range(n)]]) ** 2
        # weight starts at 1.0 -> fobj = 1 - hs2[max_selected]
        max_no = objv._max_no
        assert np.isclose(fobj, 1.0 - hs2[max_no], atol=1e-12)
        assert np.isclose(objv.fidelity, hs2[0], atol=1e-12)

    def test_gradient_matches_numeric(self):
        """Finite-difference check of the surrogate gradient (weight frozen)."""
        n = 2
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), False)
        thetas = rand_thetas(circ.num_thetas)
        target = rand_state(n)
        objv = SpSurrogateObjectiveMax(user_parameters=self._params(n), circ=circ)
        objv.set_target(target)
        objv.objective(thetas)
        max_no = objv._max_no
        weight = objv._weight
        grad = objv.gradient(thetas)

        # Numeric gradient of f = 1 - (1-w) hs2[0] - w hs2[max_no] at frozen w.
        def f(th):
            vh = np.asarray(v_dagger_mul_vec(circ, th, target))
            idx = [0] + [1 << k for k in range(n)]
            hs2 = np.abs(vh[idx]) ** 2
            return 1.0 - (1 - weight) * hs2[0] - weight * hs2[max_no]

        eps = 1e-6
        num = np.zeros_like(thetas)
        for i in range(thetas.size):
            tp, tm = thetas.copy(), thetas.copy()
            tp[i] += eps
            tm[i] -= eps
            num[i] = (f(tp) - f(tm)) / (2 * eps)
        assert np.max(np.abs(grad - num)) < 1e-6

    def test_asp_end_to_end(self):
        """Perfect init + L-BFGS reaches the fidelity threshold (mini config
        of the reference run_simulation flow)."""
        n, evol_time, delta = 4, 0.8, 1.0
        num_layers = 2
        # Ground-truth target: precise Trotter from the Neel state.
        ini = trotop.neel_init_state(n)
        target = np.asarray(
            trotop.Trotter(
                num_qubits=n,
                evol_time=evol_time,
                num_steps=20,
                delta=delta,
                second_order=True,
            ).as_vector(ini)
        )
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, num_layers), True)
        thetas0 = trotop.init_ansatz_to_trotter(
            circ,
            np.zeros(circ.num_thetas),
            evol_time=evol_time,
            delta=delta,
        )
        params = self._params(n)
        params["state_prep_func"] = trotop.neel_init_state
        objv = SpSurrogateObjectiveMax(user_parameters=params, circ=circ)
        objv.set_target(target)

        objv.objective(thetas0)
        fid0 = objv.fidelity
        assert fid0 > 0.99  # perfect init is already close

        optimizer = AqcOptimizer(optimizer_name="lbfgs", maxiter=50)
        result = optimizer.optimize(
            objv,
            circ,
            thetas0,
            stopper=EarlyStopper(fidelity_thr=0.999999),
            timeout=TimeoutChecker(time_limit=-1),
        )
        # L-BFGS must not lose the perfect-init quality and should improve it.
        assert result["fidelity"] >= fid0 - 1e-9
        assert result["fidelity"] > 0.9999


class TestSketching:
    def test_full_aqc_converges(self):
        """2-qubit full AQC reaches small fobj (exact-compiling depth)."""
        np.random.seed(7)
        n = 2
        # 4 unit blocks: even CX count keeps det(V) = +1 = det(SU target) so
        # the phase-sensitive objective 1 - Re<V,U>/dim can reach ~0.
        circ = sku.create_ansatz(
            num_qubits=n, num_layers=4, circuit_layout="spin"
        )
        target = make_su_matrix(make_target_matrix("random", n))
        skvecs = skc.skvecs_generator("full", 2**n, target)
        objv = skc.SketchingObjectiveEx(circ=circ, skvecs=skvecs)
        import scipy.optimize as sciopt

        thetas0 = rand_thetas(circ.num_thetas)
        res = sciopt.minimize(
            objv.objective,
            thetas0,
            jac=objv.gradient,
            method="L-BFGS-B",
            options={"maxiter": 300},
        )
        assert res.fun < 1e-3

    def test_sketching_generators_shapes(self):
        n = 3
        dim, m = 2**n, 4
        target = make_su_matrix(make_target_matrix("random", n))
        circ = sku.create_ansatz(num_qubits=n, num_layers=2, circuit_layout="spin")
        thetas = rand_thetas(circ.num_thetas)
        for name in ("rand", "alt", "eigen"):
            gen = skc.skvecs_generator(name, m, target)
            x, y = gen.generate(circ, thetas)
            assert x.shape == (dim, m) and y.shape == (dim, m)
            np.testing.assert_allclose(y, target @ x, atol=1e-10)

    def test_coord_descent_improves(self):
        np.random.seed(11)
        n = 2
        circ = sku.create_ansatz(num_qubits=n, num_layers=3, circuit_layout="spin")
        target = make_su_matrix(make_target_matrix("random", n))
        thetas = rand_thetas(circ.num_thetas)
        dim = 2**n
        v0 = np.asarray(ansatz_to_matrix(circ, thetas))
        fobj0 = 1 - abs(np.vdot(v0, target) / dim) ** 2
        for _ in range(60):
            thetas, fobj = coord_descent_single_sweep(circ, thetas, target)
            thetas = np.asarray(thetas)
        assert float(fobj) < min(0.2, fobj0)

    def test_coord_descent_run_matches_host_loop(self):
        """The on-device multi-sweep loop (coord_descent_run) reproduces the
        host-driven sweep sequence exactly and honors its stop contracts."""
        from aqc_research_tpu.ops.coord_descent import coord_descent_run

        np.random.seed(12)
        n = 2
        circ = sku.create_ansatz(num_qubits=n, num_layers=3, circuit_layout="spin")
        target = make_su_matrix(make_target_matrix("random", n))
        th0 = rand_thetas(circ.num_thetas)

        th = th0.copy()
        best = np.inf
        for _ in range(30):
            prev = th
            th_new, fobj = coord_descent_single_sweep(circ, th, target)
            th = np.asarray(th_new)
            best = min(best, float(fobj))
            if np.max(np.abs(th - prev)) < 1e-8:
                break

        run, timed_out = coord_descent_run(
            circ, th0, target, maxiter=30, chunk_sweeps=7
        )
        assert not timed_out
        np.testing.assert_allclose(float(run.fobj), best, atol=1e-12)
        profile = np.asarray(run.profile)
        sweeps = int(run.num_sweeps)
        assert np.all(np.isfinite(profile[:sweeps]))
        assert np.all(np.isnan(profile[sweeps:]))

        # The wall clock fires between chunks.
        run2, to2 = coord_descent_run(
            circ, th0, target, maxiter=4000, time_limit=1e-9, chunk_sweeps=4
        )
        assert to2 and int(run2.num_sweeps) == 4
