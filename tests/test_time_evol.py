"""End-to-end tests of the ASP time-evolution driver and target pipeline.

Ports the reference integration thresholds (test_trotter_targets.py:52-92):
targets vs exact expm evolution fid_gt > 0.99, fid > 0.93; plus a miniature
``run_simulation`` over 2 horizons with both objectives.
"""

import numpy as np
import pytest

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.models.sp_lhs.target_states import (
    get_target_states,
    precise_multiplier,
)
from aqc_research_tpu.models.sp_lhs.time_evol import run_simulation
from aqc_research_tpu.models.sp_lhs.user_options import UserOptions
from aqc_research_tpu.ops import mps as mpsop


def _mini_opts(tmp_path, objective, num_qubits=3, num_horizons=2):
    opts = UserOptions()
    opts.num_qubits = num_qubits
    opts.result_dir = str(tmp_path)
    opts.objective = objective
    opts.maxiter = 8
    opts.verbose = False
    opts.chi_max = 8
    step_range = 1 + np.arange(num_horizons)
    opts.trotter_steps = step_range * 3
    opts.evol_times = np.round(step_range * 1.2, 3)
    opts.num_layers_inc = 1
    opts.fidelity_thr = 0.9
    opts.seed = 7
    return opts


class TestTargetPipeline:
    @pytest.mark.parametrize("objective", ["sur_max", "sur_fast_mps_trotter"])
    def test_targets_vs_exact_evolution(self, tmp_path, objective):
        """Target states match exact expm evolution up to the Trotter global
        phase (reference test_trotter_targets.py:52-92)."""
        opts = _mini_opts(tmp_path, objective)
        n = opts.num_qubits
        targets = get_target_states(opts)
        assert len(targets) == len(opts.evol_times)

        hamiltonian = trotop.make_hamiltonian(n, opts.delta)
        ini = opts.ini_state_func[0](n)
        for targ in targets:
            exact = trotop.exact_evolution(hamiltonian, ini, targ.evol_time)
            t1_gt = (
                np.asarray(mpsop.mps_to_vector(targ.t1_gt))
                if opts.use_mps
                else targ.t1_gt
            )
            t1 = (
                np.asarray(mpsop.mps_to_vector(targ.t1))
                if opts.use_mps
                else targ.t1
            )
            fid_gt = trotop.fidelity(t1_gt, exact)
            fid = trotop.fidelity(t1, exact)
            assert fid_gt > 0.99, (targ.evol_time, fid_gt)
            assert fid > 0.93, (targ.evol_time, fid)

    def test_cache_roundtrip(self, tmp_path):
        """Second call loads from the cache (results identical)."""
        opts = _mini_opts(tmp_path, "sur_fast_mps_trotter", num_horizons=1)
        t1 = get_target_states(opts)
        t2 = get_target_states(opts)
        np.testing.assert_allclose(
            np.asarray(t1[0].t1_gt.gammas), np.asarray(t2[0].t1_gt.gammas)
        )
        # Changing an option invalidates the cache.
        opts.chi_max = 16
        t3 = get_target_states(opts)
        assert t3[0].chi_max == 16


class TestRunSimulation:
    @pytest.mark.parametrize("objective", ["sur_max", "sur_fast_mps_trotter"])
    def test_mini_run(self, tmp_path, objective):
        opts = _mini_opts(tmp_path, objective, num_qubits=3, num_horizons=2)
        output_dir = run_simulation(opts)
        import os
        import pickle

        with open(os.path.join(output_dir, "all_results.pkl"), "rb") as fld:
            results = pickle.load(fld)
        assert len(results) == 2
        for res in results:
            # Perfect init + a few L-BFGS steps must stay near the Trotter
            # reference quality.
            assert res["fid_a1_vs_gt"] > 0.9
            assert res["fid_a1_vs_t1"] > 0.9
        assert any(
            f.startswith("fidelity_profiles") for f in os.listdir(output_dir)
        )

    @pytest.mark.parametrize("objective", ["sur_max", "sur_fast_mps_trotter"])
    def test_mini_run_jit_lbfgs(self, tmp_path, objective):
        """run_simulation with the fully on-device optimizer loop
        (use_jit_lbfgs=True): same quality bars as the host path."""
        opts = _mini_opts(tmp_path, objective, num_qubits=3, num_horizons=2)
        opts.use_jit_lbfgs = True
        opts.maxiter = 30
        output_dir = run_simulation(opts)
        import os
        import pickle

        with open(os.path.join(output_dir, "all_results.pkl"), "rb") as fld:
            results = pickle.load(fld)
        assert len(results) == 2
        for res in results:
            assert res["fid_a1_vs_gt"] > 0.9
            assert res["fid_a1_vs_t1"] > 0.9
            assert res["stats"]["use_jit_lbfgs"]

    def test_jit_lbfgs_time_limit(self, tmp_path):
        """The on-device path honors time_limit (chunked dispatch): with an
        already-expired clock every horizon stops after ONE chunk and the
        result is flagged is_timeout — the jitted twin of the host path's
        TimeoutChecker contract."""
        opts = _mini_opts(
            tmp_path, "sur_max", num_qubits=3, num_horizons=1
        )
        opts.use_jit_lbfgs = True
        opts.maxiter = 500
        opts.time_limit = 1e-9
        opts.jit_chunk_iters = 2
        opts.fidelity_thr = 0.9999999  # unreachable -> cannot stop early
        output_dir = run_simulation(opts)
        import os
        import pickle

        with open(os.path.join(output_dir, "all_results.pkl"), "rb") as fld:
            results = pickle.load(fld)
        assert results[0]["is_timeout"]
        assert results[0]["num_iters"] == 2  # one chunk, then the clock

    def test_use_jit_lbfgs_auto_resolution(self, monkeypatch):
        """use_jit_lbfgs=None resolves to the backend: on-device on TPU,
        host path on CPU; an explicit setting always wins."""
        import aqc_research_tpu.config as cfg

        opts = UserOptions()
        assert opts.use_jit_lbfgs is None
        monkeypatch.setattr(cfg, "is_tpu", lambda: True)
        assert opts.resolve_use_jit_lbfgs() is True
        monkeypatch.setattr(cfg, "is_tpu", lambda: False)
        assert opts.resolve_use_jit_lbfgs() is False
        opts.use_jit_lbfgs = False
        monkeypatch.setattr(cfg, "is_tpu", lambda: True)
        assert opts.resolve_use_jit_lbfgs() is False
        opts.use_jit_lbfgs = True
        assert opts.resolve_use_jit_lbfgs() is True


class TestWarmStartHorizons:
    """Horizon warm start (_warm_start_thetas): exact-consistency invariant
    and shape guards.  When the previous 'solution' is itself the perfect
    Trotter init at the same dt, the warm start must EQUAL the cold perfect
    init (copying perfect layers + perfect tail at the same dt is the same
    circuit) — measured A/B showed optimized-prev warm starts lose 2nd-order
    accuracy in the tail, so the option defaults off."""

    def test_warm_equals_cold_for_perfect_prev(self):
        import aqc_research_tpu.targets.trotter as trotop
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.models.sp_lhs.time_evol import _warm_start_thetas
        from aqc_research_tpu.models.sp_lhs.user_options import UserOptions

        n = 5
        opts = UserOptions()
        opts.num_qubits = n
        t1, L1, t2, L2 = 1.2, 2, 2.4, 4
        c1 = TrotterAnsatz.make(n, make_trotter_like_circuit(n, L1), True)
        th1 = trotop.init_ansatz_to_trotter(
            c1, np.zeros(c1.num_thetas), evol_time=t1, delta=opts.delta
        )
        prev = {
            "thetas": th1, "num_layers": L1, "evol_time": t1, "num_qubits": n,
        }
        c2 = TrotterAnsatz.make(n, make_trotter_like_circuit(n, L2), True)
        warm = _warm_start_thetas(c2, opts, t2, prev)
        cold = trotop.init_ansatz_to_trotter(
            c2, np.zeros(c2.num_thetas), evol_time=t2, delta=opts.delta
        )
        np.testing.assert_allclose(warm, cold, atol=1e-14)

    def test_warm_start_guards(self):
        import aqc_research_tpu.targets.trotter as trotop
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.models.sp_lhs.time_evol import _warm_start_thetas
        from aqc_research_tpu.models.sp_lhs.user_options import UserOptions

        n = 4
        opts = UserOptions()
        opts.num_qubits = n
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        base = {
            "thetas": np.zeros(3 * n + circ.tpb * circ.bpl * 2),
            "num_layers": 2, "evol_time": 1.2, "num_qubits": n,
        }
        # same layer count -> no warm start
        assert _warm_start_thetas(circ, opts, 2.4, base) is None
        # wrong qubit count
        c4 = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 4), True)
        bad = dict(base, num_qubits=n + 1)
        assert _warm_start_thetas(c4, opts, 2.4, bad) is None
        # non-increasing time
        bad = dict(base, evol_time=2.4)
        assert _warm_start_thetas(c4, opts, 2.4, bad) is None


class TestHorizonResume:
    """Per-horizon checkpoint/resume (opts.resume_dir): a run that dies at
    horizon k restarts from its results folder, restores the k-1 completed
    horizons from horizon_checkpoint.pkl, and only computes the remainder.
    (The reference driver persists nothing until the very end,
    time_evol_best_init.py:385.)"""

    def _crashed_run(self, tmp_path, monkeypatch, objective="sur_max"):
        """Runs a 2-horizon simulation that crashes entering horizon 2;
        returns (opts, output_dir with a 1-horizon checkpoint)."""
        import glob
        import os

        import aqc_research_tpu.models.sp_lhs.time_evol as te

        opts = _mini_opts(tmp_path, objective, num_qubits=3, num_horizons=2)
        opts.maxiter = 4
        real = te._time_evolution
        calls = {"n": 0}

        def crash_on_second(**kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated crash")
            return real(**kw)

        monkeypatch.setattr(te, "_time_evolution", crash_on_second)
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_simulation(opts)
        monkeypatch.setattr(te, "_time_evolution", real)

        dirs = glob.glob(os.path.join(str(tmp_path), "3qubits", "*"))
        assert len(dirs) == 1
        assert os.path.isfile(os.path.join(dirs[0], te._CHECKPOINT_FILE))
        return opts, dirs[0]

    @pytest.mark.parametrize("objective", ["sur_max", "sur_fast_mps_trotter"])
    def test_resume_completes_schedule(self, tmp_path, monkeypatch, objective):
        import os
        import pickle

        import aqc_research_tpu.models.sp_lhs.time_evol as te

        opts, out_dir = self._crashed_run(tmp_path, monkeypatch, objective)

        real = te._time_evolution
        calls = {"n": 0}

        def counting(**kw):
            calls["n"] += 1
            return real(**kw)

        monkeypatch.setattr(te, "_time_evolution", counting)
        opts.resume_dir = out_dir
        resumed_dir = run_simulation(opts)

        assert resumed_dir == out_dir
        assert calls["n"] == 1  # only the missing horizon was computed
        with open(os.path.join(out_dir, "all_results.pkl"), "rb") as fld:
            results = pickle.load(fld)
        assert len(results) == 2
        assert [r["evol_time1"] for r in results] == list(opts.evol_times)
        for res in results:
            assert res["fid_a1_vs_gt"] > 0.9

    def test_resume_refuses_schedule_mismatch(self, tmp_path, monkeypatch):
        opts, out_dir = self._crashed_run(tmp_path, monkeypatch)
        opts.resume_dir = out_dir
        opts.trunc_thr = 1e-8  # different physics -> different fingerprint
        with pytest.raises(ValueError, match="resume refused"):
            run_simulation(opts)

    def test_resume_refuses_missing_dir(self, tmp_path):
        opts = _mini_opts(tmp_path, "sur_max", num_qubits=3, num_horizons=2)
        opts.resume_dir = str(tmp_path / "no_such_dir")
        with pytest.raises(ValueError, match="resume_dir does not exist"):
            run_simulation(opts)


class TestExpansionLoop:
    def test_layer_expansion_engages(self, tmp_path):
        """num_expansions > 0: an undersized ansatz with an unreachable-at-
        depth-1 fidelity threshold triggers layer insertion (the reference's
        expansion loop, time_evol_best_init.py:259-298)."""
        opts = _mini_opts(tmp_path, "sur_fast_mps_trotter", num_horizons=1)
        opts.manual_num_layers = [1]
        opts.num_expansions = 2
        opts.fidelity_thr = 0.999999
        opts.maxiter = 3
        out = run_simulation(opts)
        import os
        import pickle

        with open(os.path.join(out, "all_results.pkl"), "rb") as fld:
            results = pickle.load(fld)
        assert results[0]["num_layers"] > 1  # the loop actually expanded
