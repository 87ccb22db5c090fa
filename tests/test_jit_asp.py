"""Tests of the fully-jitted ASP optimization path."""

import numpy as np
import pytest

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.models.sp_lhs.jit_asp import (
    flip_state_indices,
    make_surrogate_loss,
    optimize_horizon_jit,
)


def _setup(n=4, layers=1, evol_time=0.8):
    ini = trotop.neel_init_state(n)
    target = np.asarray(
        trotop.Trotter(
            num_qubits=n,
            evol_time=evol_time,
            num_steps=20,
            delta=1.0,
            second_order=True,
        ).as_vector(ini)
    )
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=1.0
    )
    idx = flip_state_indices(n, ini)
    return circ, thetas0, target, idx


class TestJitAsp:
    def test_flip_state_indices(self):
        idx = flip_state_indices(4, trotop.neel_init_state(4))
        neel = 0b0101
        assert idx[0] == neel
        assert list(idx[1:]) == [neel ^ 1, neel ^ 2, neel ^ 4, neel ^ 8]
        with pytest.raises(ValueError):
            flip_state_indices(4, trotop.Trotter(
                num_qubits=4, evol_time=1.0, num_steps=1, delta=1.0,
                second_order=False,
            ).as_program())

    def test_loss_matches_host_objective(self):
        """weight=0 loss == 1 - fidelity of the host sur_max objective."""
        from aqc_research_tpu.models.sp_lhs.sur_max import SpSurrogateObjectiveMax

        circ, thetas0, target, idx = _setup()
        loss = make_surrogate_loss(circ, idx, weight=0.0)
        f_jit = float(loss(thetas0, target))

        params = {
            "num_qubits": circ.num_qubits,
            "max_flips": 1,
            "maxiter": 10,
            "verbose": False,
            "enable_optim_stats": False,
            "num_simulations": 1,
            "state_prep_func": trotop.neel_init_state,
        }
        objv = SpSurrogateObjectiveMax(user_parameters=params, circ=circ)
        objv.set_target(target)
        objv.objective(thetas0)
        assert abs(f_jit - (1.0 - objv.fidelity)) < 1e-12

    def test_surrogate_stateful_matches_host(self):
        """The on-device stateful surrogate reproduces the host sur_max
        fobj / weight / max_no / gradient sequence exactly (VERDICT round-1
        item 2): both are driven with the SAME theta sequence, mimicking the
        paired objective()+gradient() calls of the SciPy L-BFGS-B protocol."""
        import jax.numpy as jnp

        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            SurrogateState,
            make_surrogate_stateful,
        )
        from aqc_research_tpu.models.sp_lhs.sur_max import SpSurrogateObjectiveMax

        circ, thetas0, target, idx = _setup()
        params = {
            "num_qubits": circ.num_qubits,
            "max_flips": 1,
            "maxiter": 50,
            "verbose": False,
            "enable_optim_stats": False,
            "num_simulations": 1,
            "state_prep_func": trotop.neel_init_state,
        }
        objv = SpSurrogateObjectiveMax(user_parameters=params, circ=circ)
        objv.set_target(target)

        _, vgrad = make_surrogate_stateful(circ, idx, gamma=0.1)
        st = SurrogateState(
            jnp.asarray(0, jnp.int32),
            jnp.asarray(1.0, jnp.float64),  # reference initial weight
            jnp.asarray(0.0, jnp.float64),
            jnp.asarray(np.inf, jnp.float64),
        )
        tgt = jnp.asarray(target)

        # A theta walk that visits far-from-optimal points (so the
        # hysteresis actually switches max_no) and near-optimal ones.
        rng = np.random.default_rng(7)
        walk = [thetas0]
        for scale in (2.0, 1.0, 0.5, 0.2, 0.1, 0.05):
            walk.append(thetas0 + scale * rng.standard_normal(thetas0.size))

        saw_nonzero_max = False
        for th in walk:
            f_host = objv.objective(th)
            g_host = objv.gradient(th)
            f_dev, g_dev, st = vgrad(jnp.asarray(th), st, tgt)
            assert abs(float(f_dev) - f_host) < 1e-9
            assert int(st.max_no) == objv._max_no
            assert abs(float(st.weight) - objv._weight) < 1e-9
            assert np.max(np.abs(np.asarray(g_dev) - g_host)) < 1e-9
            saw_nonzero_max = saw_nonzero_max or int(st.max_no) != 0
        assert saw_nonzero_max, "walk never exercised the hysteresis branch"

    def test_optimize_horizon_surrogate(self):
        """Full-surrogate on-device horizon optimization (hysteresis + EMA
        in the loop) reaches the fidelity target."""
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_surrogate_jit,
        )

        circ, thetas0, target, idx = _setup()
        rng = np.random.default_rng(3)
        thetas_p = thetas0 + 0.2 * rng.standard_normal(thetas0.size)
        res = optimize_horizon_surrogate_jit(
            circ,
            thetas_p,
            target,
            state_idx=idx,
            fidelity_thr=0.999,
            maxiter=150,
        )
        assert float(res.fidelity) > 0.999
        assert bool(res.converged)
        assert float(res.weight) > 0.0  # the EMA actually ran

    def test_optimize_horizon(self):
        circ, thetas0, target, idx = _setup()
        res = optimize_horizon_jit(
            circ,
            thetas0,
            target,
            state_idx=idx,
            fidelity_thr=0.9999,
            maxiter=100,
        )
        loss0 = float(make_surrogate_loss(circ, idx)(thetas0, target))
        assert float(res.fobj) <= loss0
        assert float(res.fidelity) > 0.9999
        assert bool(res.converged)

    def test_multistart_horizon(self):
        """BASELINE config 4: vmap multi-start over random initial points."""
        import jax
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_multistart,
        )
        from aqc_research_tpu.parallel.multistart import random_initial_thetas

        circ, thetas0, target, idx = _setup(n=3, layers=1, evol_time=0.6)
        batch = np.stack(
            [thetas0 + 0.2 * np.random.randn(thetas0.size) for _ in range(4)]
        )
        res = optimize_horizon_multistart(
            circ, batch, target, state_idx=idx, fidelity_thr=0.999, maxiter=60
        )
        assert res.fobj.shape == (4,)
        best = int(np.argmin(np.asarray(res.fobj)))
        assert float(res.fidelity[best]) > 0.999

    def test_mps_horizon_jit(self):
        """Fully-jitted MPS horizon optimization reaches the fidelity target
        and agrees with the dense path."""
        import aqc_research_tpu.targets.trotter as trotop2
        from aqc_research_tpu.models.sp_lhs.jit_asp import optimize_horizon_mps_jit
        from aqc_research_tpu.ops import mps as mpsop

        n, evol_time = 4, 0.8
        ini = trotop2.neel_init_state(n)
        target_mps = trotop2.Trotter(
            num_qubits=n, evol_time=evol_time, num_steps=20, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-12, chi_max=16)
        circ, thetas0, target_dense, idx = _setup(n=n, layers=2, evol_time=evol_time)
        base_bits = tuple((1 if k % 2 == 0 else 0) for k in range(n))

        thetas_p = thetas0 + 0.1 * np.random.randn(thetas0.size)
        res = optimize_horizon_mps_jit(
            circ, thetas_p, target_mps,
            base_bits=base_bits, trunc_thr=1e-10,
            fidelity_thr=0.9999, maxiter=150,
        )
        assert float(res.fidelity) > 0.9999
        assert bool(res.converged)

    def test_mps_multistart_horizon(self):
        """Batched MPS fleet: B on-device L-BFGS instances in one program."""
        import aqc_research_tpu.targets.trotter as trotop2
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_mps_multistart,
        )

        n, evol_time = 3, 0.6
        ini = trotop2.neel_init_state(n)
        target_mps = trotop2.Trotter(
            num_qubits=n, evol_time=evol_time, num_steps=20, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-12, chi_max=8)
        circ, thetas0, _, _ = _setup(n=n, layers=1, evol_time=evol_time)
        base_bits = tuple((1 if k % 2 == 0 else 0) for k in range(n))

        batch = np.stack(
            [thetas0 + 0.1 * np.random.randn(thetas0.size) for _ in range(3)]
        )
        res = optimize_horizon_mps_multistart(
            circ, batch, target_mps,
            base_bits=base_bits, trunc_thr=1e-10,
            fidelity_thr=0.999, maxiter=80,
        )
        assert res.fobj.shape == (3,)
        best = int(np.argmin(np.asarray(res.fobj)))
        assert float(res.fidelity[best]) > 0.999
        with pytest.raises(ValueError):
            optimize_horizon_mps_multistart(
                circ, batch, target_mps, base_bits=(1, 0), maxiter=1
            )


class TestTimedHorizons:
    """Chunked time-limited on-device optimization (jit_asp *_timed):
    parity with the one-program runners plus the timeout contract."""

    def test_surrogate_timed_matches_one_program(self):
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_surrogate_jit,
            optimize_horizon_surrogate_timed,
        )

        circ, thetas0, target, idx = _setup()
        rng = np.random.default_rng(3)
        thetas_p = thetas0 + 0.2 * rng.standard_normal(thetas0.size)
        kw = dict(state_idx=idx, fidelity_thr=0.999, maxiter=150)
        ref = optimize_horizon_surrogate_jit(circ, thetas_p, target, **kw)
        res, timed_out = optimize_horizon_surrogate_timed(
            circ, thetas_p, target, time_limit=None, chunk_iters=11, **kw
        )
        assert not timed_out
        assert int(res.num_iters) == int(ref.num_iters)
        np.testing.assert_allclose(
            np.asarray(res.thetas), np.asarray(ref.thetas), atol=1e-10
        )
        np.testing.assert_allclose(
            float(res.fidelity), float(ref.fidelity), atol=1e-10
        )
        np.testing.assert_allclose(
            float(res.weight), float(ref.weight), atol=1e-10
        )

    def test_surrogate_timed_honors_time_limit(self):
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_surrogate_timed,
        )

        circ, thetas0, target, idx = _setup()
        res, timed_out = optimize_horizon_surrogate_timed(
            circ,
            thetas0 + 0.3,
            target,
            state_idx=idx,
            maxiter=5000,
            time_limit=1e-9,
            chunk_iters=3,
        )
        assert timed_out
        assert int(res.num_iters) == 3  # one chunk, then the clock fired
        assert np.isfinite(float(res.fobj))

    def test_mps_timed_matches_one_program(self):
        import aqc_research_tpu.targets.trotter as trotop2
        from aqc_research_tpu.models.sp_lhs.jit_asp import (
            optimize_horizon_mps_jit,
            optimize_horizon_mps_timed,
        )

        n, evol_time = 4, 0.8
        ini = trotop2.neel_init_state(n)
        target_mps = trotop2.Trotter(
            num_qubits=n, evol_time=evol_time, num_steps=20, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-12, chi_max=16)
        circ, thetas0, _, _ = _setup(n=n, layers=2, evol_time=evol_time)
        base_bits = tuple((1 if k % 2 == 0 else 0) for k in range(n))
        rng = np.random.default_rng(7)
        thetas_p = thetas0 + 0.1 * rng.standard_normal(thetas0.size)
        kw = dict(
            base_bits=base_bits, trunc_thr=1e-10, fidelity_thr=0.9999,
            maxiter=150,
        )
        ref = optimize_horizon_mps_jit(circ, thetas_p, target_mps, **kw)
        res, timed_out = optimize_horizon_mps_timed(
            circ, thetas_p, target_mps, time_limit=None, chunk_iters=13, **kw
        )
        assert not timed_out
        assert int(res.num_iters) == int(ref.num_iters)
        np.testing.assert_allclose(
            np.asarray(res.thetas), np.asarray(ref.thetas), atol=1e-10
        )
        assert float(res.fidelity) > 0.9999


class TestMpsWatchdog:
    """The fobj-collapse fence: gross objective disagreement at the returned
    iterate is detected and the horizon re-optimized under the reference
    decomposition (round-4 qrlite findings — RESULTS.md)."""

    def _problem(self):
        import aqc_research_tpu.targets.trotter as trotop2

        n, evol_time = 4, 0.8
        ini = trotop2.neel_init_state(n)
        target_mps = trotop2.Trotter(
            num_qubits=n, evol_time=evol_time, num_steps=20, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-12, chi_max=16)
        circ, thetas0, _, _ = _setup(n=n, layers=2, evol_time=evol_time)
        base_bits = tuple((1 if k % 2 == 0 else 0) for k in range(n))
        rng = np.random.default_rng(5)
        return circ, thetas0 + 0.1 * rng.standard_normal(thetas0.size), \
            target_mps, base_bits

    def test_healthy_run_is_not_flagged(self):
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.models.sp_lhs import jit_asp

        circ, th0, target, bits = self._problem()
        set_svd_impl("rand")  # != the CPU reference impl -> watchdog active
        try:
            before = len(jit_asp.watchdog_events)
            res = jit_asp.optimize_horizon_mps_jit(
                circ, th0, target, base_bits=bits, trunc_thr=1e-10,
                fidelity_thr=0.9999, maxiter=150,
            )
            assert len(jit_asp.watchdog_events) == before
            assert float(res.fidelity) > 0.9999
        finally:
            set_svd_impl(None)

    def test_corrupted_objective_is_detected_and_recovered(self, monkeypatch):
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.models.sp_lhs import jit_asp

        circ, th0, target, bits = self._problem()
        real_program = jit_asp._mps_value_program

        def corrupted(circ_, bits_, thr_, impl_):
            real = real_program(circ_, bits_, thr_, impl_)
            # The reference re-evaluation disagrees by O(1) — exactly the
            # collapse signature (optimized fobj and true fobj diverge).
            return lambda th, tgt: real(th, tgt) + 1.0

        monkeypatch.setattr(jit_asp, "_mps_value_program", corrupted)
        set_svd_impl("rand")
        try:
            before = len(jit_asp.watchdog_events)
            res = jit_asp.optimize_horizon_mps_jit(
                circ, th0, target, base_bits=bits, trunc_thr=1e-10,
                fidelity_thr=0.9999, maxiter=150,
            )
            events = jit_asp.watchdog_events[before:]
            assert len(events) == 1, "the disagreement must be flagged"
            assert events[0]["reference_impl"] == "native"
            # The recovery re-optimized under the reference route and still
            # reached the bar.
            assert float(res.fidelity) > 0.9999
        finally:
            set_svd_impl(None)

    def test_watchdog_disabled_by_env(self, monkeypatch):
        from aqc_research_tpu.config import set_svd_impl
        from aqc_research_tpu.models.sp_lhs import jit_asp

        circ, th0, target, bits = self._problem()
        monkeypatch.setenv("AQC_TPU_MPS_WATCHDOG", "0")
        monkeypatch.setattr(
            jit_asp, "_mps_value_program",
            lambda *a: (_ for _ in ()).throw(AssertionError("must not run")),
        )
        set_svd_impl("rand")
        try:
            res = jit_asp.optimize_horizon_mps_jit(
                circ, th0, target, base_bits=bits, trunc_thr=1e-10,
                fidelity_thr=0.9999, maxiter=150,
            )
            assert float(res.fidelity) > 0.9999
        finally:
            set_svd_impl(None)
