"""Tests of the jitted L-BFGS/Adam loops and stopper semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqc_research_tpu.optim import (
    AqcOptimizer,
    EarlyStopper,
    GradientAmplifier,
    NotImproveStopper,
    SmallObjectiveStopper,
    StagnantOptimizationWarning,
    minimize_adam,
    minimize_lbfgs,
)


def _rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


class TestJitLbfgs:
    def test_rosenbrock(self):
        x0 = jnp.zeros(6, dtype=jnp.float64)
        res = minimize_lbfgs(_rosenbrock, x0, maxiter=200)
        assert float(res.fobj) < 1e-10
        assert np.allclose(np.asarray(res.thetas), 1.0, atol=1e-4)

    def test_fobj_threshold_stop(self):
        x0 = jnp.zeros(4, dtype=jnp.float64)
        res = minimize_lbfgs(_rosenbrock, x0, maxiter=500, fobj_thr=1e-3)
        assert bool(res.converged)
        assert float(res.fobj) < 1e-3
        assert int(res.num_iters) < 500

    def test_adam(self):
        x0 = jnp.full(3, 2.0, dtype=jnp.float64)
        res = minimize_adam(lambda x: jnp.sum(x**2), x0, maxiter=500, learn_rate=0.1)
        assert float(res.fobj) < 1e-3


class _QuadraticObjective:
    """Minimal objective-class contract (objective/gradient/set_status_trackers)."""

    def __init__(self):
        self.ncalls = 0

    def objective(self, th):
        self.ncalls += 1
        return float(np.sum((th - 1.5) ** 2))

    def gradient(self, th):
        return 2.0 * (np.asarray(th) - 1.5)

    def set_status_trackers(self, timeout=None, stopper=None):
        pass


class TestAqcOptimizer:
    @pytest.mark.parametrize("name", ["lbfgs", "adam", "cobyla", "bobyqa"])
    def test_backends(self, name):
        objv = _QuadraticObjective()
        opt = AqcOptimizer(optimizer_name=name, maxiter=200, learn_rate=0.2)
        from aqc_research_tpu.circuit.ansatz import Ansatz
        circ = Ansatz.make(2, "cx", np.array([[0], [1]]))
        x0 = np.zeros(circ.num_thetas)
        result = opt.optimize(objv, circ, x0)
        assert result["cost"] < 1e-2
        assert result["thetas"].shape == x0.shape
        assert result["is_timeout"] is False


class TestStoppers:
    def test_small_objective_stopper(self):
        s = SmallObjectiveStopper(fobj_thr=0.1)
        s.check(0.5)
        with pytest.raises(StopIteration):
            s.check(0.01)

    def test_not_improve_stopper(self):
        s = NotImproveStopper(num_iters=3)
        s.check(1.0, 0)
        with pytest.raises(StagnantOptimizationWarning):
            for i in range(1, 10):
                s.check(1.0, i)
        s.reset()
        s.check(0.5, 0)  # no raise after reset

    def test_early_stopper_fidelity(self):
        s = EarlyStopper(fidelity_thr=0.99)
        captured = {}

        def on_stop(fobj, thetas):
            captured["fobj"] = fobj
            return {"cost": fobj, "thetas": thetas}

        s.check(0.5, 0.5, np.zeros(3), 0, on_stop)
        with pytest.raises(StopIteration):
            s.check(0.4, 0.995, np.zeros(3), 1, on_stop)
        assert captured["fobj"] == 0.4
        assert s.optim_results["cost"] == 0.4

    def test_gradient_amplifier(self):
        g = GradientAmplifier(history=3)
        # Constant fobj (plateau) -> amplification > 1 once history is full.
        scales = [g.estimate(0.5) for _ in range(10)]
        assert scales[0] == 1.0
        assert scales[-1] > 1.0


class TestCompactLbfgs:
    def test_rosenbrock(self):
        from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact

        x0 = jnp.zeros(6, dtype=jnp.float64)
        res = minimize_lbfgs_compact(_rosenbrock, x0, maxiter=400)
        assert float(res.fobj) < 1e-8
        assert np.allclose(np.asarray(res.thetas), 1.0, atol=1e-3)

    def test_threshold_and_no_improve(self):
        from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact

        x0 = jnp.zeros(4, dtype=jnp.float64)
        res = minimize_lbfgs_compact(
            _rosenbrock, x0, maxiter=500, fobj_thr=1e-3
        )
        assert bool(res.converged) and float(res.fobj) < 1e-3

        # A flat function triggers the no-improvement stop quickly.
        res = minimize_lbfgs_compact(
            lambda x: jnp.sum(0.0 * x) + 1.0, x0, maxiter=500, no_improve_iters=3
        )
        assert int(res.num_iters) < 20

    def test_batched_linesearch_converges(self):
        """Fleet-mode batched Armijo grid: same optimum as sequential
        backtracking, and picks the LARGEST passing step (parity of the
        accepted step on a quadratic where step=1 always passes)."""
        from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact

        x0 = jnp.zeros(6, dtype=jnp.float64)
        res = minimize_lbfgs_compact(
            _rosenbrock, x0, maxiter=400, batch_linesearch=16
        )
        assert float(res.fobj) < 1e-8
        assert np.allclose(np.asarray(res.thetas), 1.0, atol=1e-3)

        quad = lambda x: jnp.sum((x - 2.0) ** 2)  # noqa: E731
        r_seq = minimize_lbfgs_compact(quad, x0, maxiter=30)
        r_bat = minimize_lbfgs_compact(quad, x0, maxiter=30, batch_linesearch=8)
        assert float(r_bat.fobj) < 1e-12
        assert int(r_bat.num_iters) == int(r_seq.num_iters)

    def test_fused_linesearch_grad_matches_plain(self):
        """fuse_linesearch_grad folds the accepted-point gradient into the
        batched grid eval — for a stateless objective the iterates must
        match the unfused batched path exactly."""
        from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact

        x0 = jnp.zeros(6, dtype=jnp.float64)
        for fun, k in ((_rosenbrock, 16), (lambda x: jnp.sum((x - 2.0) ** 2), 8)):
            r_plain = minimize_lbfgs_compact(
                fun, x0, maxiter=400, batch_linesearch=k
            )
            r_fused = minimize_lbfgs_compact(
                fun, x0, maxiter=400, batch_linesearch=k,
                fuse_linesearch_grad=True,
            )
            assert int(r_fused.num_iters) == int(r_plain.num_iters)
            np.testing.assert_allclose(
                np.asarray(r_fused.thetas), np.asarray(r_plain.thetas),
                atol=1e-12,
            )

    def test_batched_linesearch_vmapped_fleet(self):
        """The batched grid works under vmap (the multi-start fleet shape)."""
        from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact

        x0s = jnp.stack(
            [jnp.zeros(6), 0.3 * jnp.ones(6), -0.2 * jnp.ones(6)]
        ).astype(jnp.float64)
        res = jax.vmap(
            lambda x0: minimize_lbfgs_compact(
                _rosenbrock, x0, maxiter=400, batch_linesearch=16
            )
        )(x0s)
        assert float(jnp.max(res.fobj)) < 1e-8


class TestChunkedLbfgs:
    """Time-limited chunked dispatch: K iterations per device program entry,
    host clock checked between chunks (the on-device stopper contract of the
    reference's TimeoutChecker, optimizer.py:36-62)."""

    def _programs(self, **opts):
        from aqc_research_tpu.optim.lbfgs import lbfgs_chunk_programs

        return lbfgs_chunk_programs(
            lambda x, st, shift: (_rosenbrock(x - shift), st),
            lambda x, st, shift: jax.value_and_grad(
                lambda y: _rosenbrock(y - shift)
            )(x) + (st,),
            **opts,
        )

    def test_chunked_matches_one_program(self):
        """Same trajectory as the one-shot compact loop: chunking must not
        change a single iterate (the loop carry round-trips exactly)."""
        from aqc_research_tpu.optim.lbfgs import (
            minimize_lbfgs_compact,
            run_lbfgs_chunked,
        )

        x0 = jnp.zeros(6, dtype=jnp.float64)
        shift = jnp.zeros(6, dtype=jnp.float64)
        res_ref = minimize_lbfgs_compact(_rosenbrock, x0, maxiter=90)
        res, _, timed_out = run_lbfgs_chunked(
            self._programs(maxiter=90),
            x0,
            (),
            (shift,),
            maxiter=90,
            time_limit=None,
            chunk_iters=7,
        )
        assert not timed_out
        assert int(res.num_iters) == int(res_ref.num_iters)
        np.testing.assert_allclose(
            np.asarray(res.thetas), np.asarray(res_ref.thetas), atol=1e-12
        )
        np.testing.assert_allclose(
            float(res.fobj), float(res_ref.fobj), atol=1e-14
        )

    def test_chunked_stops_on_threshold_mid_chunk(self):
        from aqc_research_tpu.optim.lbfgs import run_lbfgs_chunked

        x0 = jnp.zeros(6, dtype=jnp.float64)
        res, _, timed_out = run_lbfgs_chunked(
            self._programs(maxiter=400, fobj_thr=1e-3),
            x0,
            (),
            (jnp.zeros(6, dtype=jnp.float64),),
            maxiter=400,
            chunk_iters=50,
        )
        assert not timed_out
        assert bool(res.converged) and float(res.fobj) < 1e-3
        assert int(res.num_iters) < 400

    def test_time_limit_fires_between_chunks(self):
        from aqc_research_tpu.optim.lbfgs import run_lbfgs_chunked

        x0 = jnp.zeros(6, dtype=jnp.float64)
        res, _, timed_out = run_lbfgs_chunked(
            self._programs(maxiter=4000),
            x0,
            (),
            (jnp.zeros(6, dtype=jnp.float64),),
            maxiter=4000,
            time_limit=1e-9,  # already expired after the first chunk
            chunk_iters=2,
        )
        assert timed_out
        assert int(res.num_iters) == 2  # exactly one chunk ran
        assert np.isfinite(float(res.fobj))

    def test_chunk_programs_are_reused_across_targets(self):
        """The same compiled programs serve different objective data — the
        target is a traced argument, not a closure (no retrace per call)."""
        from aqc_research_tpu.optim.lbfgs import run_lbfgs_chunked

        programs = self._programs(maxiter=60)
        x0 = jnp.zeros(4, dtype=jnp.float64)
        for s in (0.0, 0.5):
            shift = jnp.full(4, s, dtype=jnp.float64)
            res, _, _ = run_lbfgs_chunked(
                programs, x0, (), (shift,), maxiter=60, chunk_iters=15
            )
            np.testing.assert_allclose(
                np.asarray(res.thetas), 1.0 + s, atol=1e-3
            )
