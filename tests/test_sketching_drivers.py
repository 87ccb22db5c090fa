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
