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
