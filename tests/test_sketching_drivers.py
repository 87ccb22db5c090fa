"""Smoke tests of the top-level sketching drivers (reference has none —
SURVEY.md §4 notes the drivers are exercised only by notebooks; we do better)."""

import os
import pickle

import numpy as np
import pytest

from aqc_research_tpu.models.sketching.aqc_coord_descent import aqc_coordinate_descent
from aqc_research_tpu.models.sketching.aqc_sketching import aqc_sketching


class TestSketchingDrivers:
    def test_full_aqc_driver(self, tmp_path):
        out = aqc_sketching(
            num_qubits=2,
            num_layers=4,
            num_skvecs=4,  # == dim -> full AQC
            circ_layout="spin",
            maxiter=120,
            learn_rate=0.1,
            skvecs_type="full",
            target_name_or_func="random",
            result_folder=str(tmp_path),
            seed=11,
            num_simulations=2,
        )
        with open(os.path.join(out, "simulation_results.pkl"), "rb") as fld:
            payload = pickle.load(fld)
        best = payload["best_result"]
        assert best["accuracy_metrics"]["fidelity"] > 0.9
        assert len(payload["sorted_results"]) == 2
        assert os.path.isfile(os.path.join(out, "qcircuit.pkl"))

    def test_sketched_adam_driver(self, tmp_path):
        out = aqc_sketching(
            num_qubits=3,
            num_layers=3,
            num_skvecs=2,
            circ_layout="spin",
            maxiter=30,
            learn_rate=0.1,
            skvecs_type="alt",
            target_name_or_func="shift1",
            result_folder=str(tmp_path),
            seed=3,
        )
        with open(os.path.join(out, "simulation_results.pkl"), "rb") as fld:
            payload = pickle.load(fld)
        assert "thetas" in payload["best_result"]

    def test_coord_descent_driver(self, tmp_path):
        out = aqc_coordinate_descent(
            num_qubits=2,
            num_layers=4,
            circ_layout="spin",
            maxiter=40,
            target_name_or_func="random",
            result_folder=str(tmp_path),
            seed=5,
        )
        with open(os.path.join(out, "simulation_results.pkl"), "rb") as fld:
            payload = pickle.load(fld)
        assert payload["sorted_results"][0]["cost"] < 0.5


class TestDriverResume:
    def test_sketched_resume_reuses_persisted_seed(self, tmp_path):
        """job_cache_dir without an explicit seed: the first run persists its
        base seed; a resume reuses it, so cached restarts actually hit
        (the wall-clock default used to invalidate the cache silently)."""
        cache = str(tmp_path / "cache")
        kw = dict(
            num_qubits=2,
            num_layers=2,
            num_skvecs=2,
            circ_layout="spin",
            maxiter=6,
            learn_rate=0.1,
            skvecs_type="alt",
            target_name_or_func="shift1",
            num_simulations=2,
            job_cache_dir=cache,
        )
        out1 = aqc_sketching(result_folder=str(tmp_path / "r1"), **kw)
        out2 = aqc_sketching(result_folder=str(tmp_path / "r2"), **kw)
        with open(os.path.join(out1, "simulation_results.pkl"), "rb") as fld:
            res1 = pickle.load(fld)["sorted_results"]
        with open(os.path.join(out2, "simulation_results.pkl"), "rb") as fld:
            res2 = pickle.load(fld)["sorted_results"]
        assert all(r.get("cached") for r in res2), "resume must hit the cache"
        assert [r["cost"] for r in res2] == [r["cost"] for r in res1]

    def test_coord_descent_time_limit(self, tmp_path):
        out = aqc_coordinate_descent(
            num_qubits=2,
            num_layers=4,
            circ_layout="spin",
            maxiter=5000,
            target_name_or_func="random",
            result_folder=str(tmp_path),
            seed=5,
            time_limit=1,  # expires between the first chunks
        )
        with open(os.path.join(out, "simulation_results.pkl"), "rb") as fld:
            payload = pickle.load(fld)
        res = payload["sorted_results"][0]
        assert res["exit_status"] in ("timeout", "early")
        assert res["nit"] < 5000
