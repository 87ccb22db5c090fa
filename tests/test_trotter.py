"""Physics-level tests of the Trotter module.

Ports the reference integration thresholds (BASELINE.md / test_trotter.py:39-99
and test_trotter_initial_point.py:54-109): Trotter vs exact expm evolution
fidelity > 0.9 at 30 steps, fused-block vs gate-program consistency, and
perfect ansatz initialization reproducing the genuine Trotter matrix.
"""

import numpy as np
import pytest

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.export import ansatz_to_program
from aqc_research_tpu.circuit.program import (
    ProgramBuilder,
    apply_program,
    program_to_matrix,
    program_to_state,
)
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.statevector import ansatz_to_matrix
from aqc_research_tpu.utils import rand_thetas

from .oracle import relative_diff

SQRT_EPS = float(np.sqrt(np.finfo(np.float64).eps))


class TestTrotterEvolution:
    @pytest.mark.parametrize("second_order", [False, True])
    @pytest.mark.parametrize("num_qubits", [2, 3, 4, 5])
    def test_trotter_vs_exact(self, num_qubits, second_order):
        """Trotter fidelity vs exact expm evolution (>0.9 at 30 steps),
        with global-phase compensation (reference test_trotter.py:39-99)."""
        nsteps, delta = 30, 1.0
        hamiltonian = trotop.make_hamiltonian(num_qubits, delta)
        for evol_tm in [0.5, 1.0, 2.0]:
            ini = trotop.neel_init_state(num_qubits)
            exact_state = trotop.exact_evolution(hamiltonian, ini, evol_tm)
            exact_state = exact_state * np.exp(
                -1j * trotop.trotter_global_phase(num_qubits, nsteps, second_order)
            )
            # Trotter applied twice over half-time intervals.
            half1 = trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=evol_tm * 0.5,
                num_steps=nsteps // 2,
                delta=delta,
                second_order=second_order,
            )
            half2 = trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=evol_tm * 0.5,
                num_steps=nsteps - nsteps // 2,
                delta=delta,
                second_order=second_order,
            )
            trot_state = np.asarray(half2.as_vector(half1.as_vector(ini)))
            fid = trotop.fidelity(trot_state, exact_state)
            assert fid > 0.9, (num_qubits, second_order, evol_tm, fid)
            if second_order:
                # 2nd order at 30 steps should be extremely accurate.
                assert fid > 0.999
                assert trotop.state_difference(trot_state, exact_state) < 0.05

    @pytest.mark.parametrize("second_order", [False, True])
    def test_fused_blocks_vs_program(self, second_order):
        """The fused 4x4 evolution must equal the explicit gate program."""
        num_qubits, nsteps, delta, evol_tm = 4, 5, 1.0, 0.8
        trot = trotop.Trotter(
            num_qubits=num_qubits,
            evol_time=evol_tm,
            num_steps=nsteps,
            delta=delta,
            second_order=second_order,
        )
        ini = trotop.neel_init_state(num_qubits)
        fused = np.asarray(trot.as_vector(ini))
        via_program = np.asarray(
            program_to_state(trot.as_program(ini), num_qubits)
        )
        assert relative_diff(fused, via_program) < 1e-12


class TestPerfectInit:
    @pytest.mark.parametrize("second_order", [False, True])
    @pytest.mark.parametrize("num_qubits", [2, 3, 4])
    @pytest.mark.parametrize("num_steps", [1, 2, 3])
    def test_init_ansatz_to_trotter(self, num_qubits, num_steps, second_order):
        """Perfect initialization reproduces the genuine Trotter circuit
        matrix (reference test_trotter_initial_point.py:54-109)."""
        delta_t = 1.0
        qb = ProgramBuilder(num_qubits)
        genuine = trotop.trotter_program(
            qb,
            dt=delta_t,
            delta=1.0,
            num_trotter_steps=num_steps,
            second_order=second_order,
        )
        mat1 = np.asarray(program_to_matrix(genuine, num_qubits))

        blocks = make_trotter_like_circuit(num_qubits, num_layers=num_steps)
        circ = TrotterAnsatz.make(num_qubits, blocks, second_order)
        evol_time = delta_t * circ.num_layers
        thetas = rand_thetas(circ.num_thetas)
        thetas = trotop.init_ansatz_to_trotter(
            circ, thetas, evol_time=evol_time, delta=1.0, layer_range=None
        )
        mat2 = np.asarray(ansatz_to_matrix(circ, thetas))
        assert relative_diff(mat2, mat1) < SQRT_EPS

        # Re-initialize a random sub-range with matching per-layer dt: the
        # circuit must still equal the genuine Trotter.
        low, high = 0, 0
        while low == high:
            rng = np.random.randint(0, num_steps + 1, size=2)
            low, high = int(np.amin(rng)), int(np.amax(rng))
        thetas = trotop.init_ansatz_to_trotter(
            circ,
            thetas,
            evol_time=delta_t * (high - low),
            delta=1.0,
            layer_range=(low, high),
        )
        mat3 = np.asarray(ansatz_to_matrix(circ, thetas))
        assert relative_diff(mat3, mat1) < SQRT_EPS

    def test_ansatz_to_program_matches_matrix(self):
        """Trotter-ansatz gate-program export equals the dense engine."""
        circ = TrotterAnsatz.make(3, make_trotter_like_circuit(3, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        mat_engine = np.asarray(ansatz_to_matrix(circ, thetas))
        mat_prog = np.asarray(
            program_to_matrix(ansatz_to_program(circ, thetas), 3)
        )
        assert relative_diff(mat_prog, mat_engine) < 1e-12


class TestTrotterMps:
    @pytest.mark.parametrize("second_order", [False, True])
    def test_as_mps_vs_dense(self, second_order):
        """Fused-block MPS Trotter evolution equals the dense evolution."""
        from aqc_research_tpu.ops import mps as mpsop

        n, nsteps, evol_tm = 4, 6, 0.9
        trot = trotop.Trotter(
            num_qubits=n,
            evol_time=evol_tm,
            num_steps=nsteps,
            delta=1.0,
            second_order=second_order,
        )
        ini = trotop.neel_init_state(n)
        dense = np.asarray(trot.as_vector(ini))
        mps = trot.as_mps(ini, trunc_thr=1e-14, chi_max=2**n)
        assert relative_diff(np.asarray(mpsop.mps_to_vector(mps)), dense) < 1e-7

    def test_as_mps_incremental(self):
        """Incremental evolution (MPS input) matches one-shot evolution."""
        from aqc_research_tpu.ops import mps as mpsop

        n = 4
        ini = trotop.neel_init_state(n)
        half1 = trotop.Trotter(
            num_qubits=n, evol_time=0.5, num_steps=3, delta=1.0, second_order=False
        )
        half2 = trotop.Trotter(
            num_qubits=n, evol_time=0.5, num_steps=3, delta=1.0, second_order=False
        )
        full = trotop.Trotter(
            num_qubits=n, evol_time=1.0, num_steps=6, delta=1.0, second_order=False
        )
        m_inc = half2.as_mps(half1.as_mps(ini, trunc_thr=1e-14, chi_max=16), trunc_thr=1e-14)
        m_full = full.as_mps(ini, trunc_thr=1e-14, chi_max=16)
        assert (
            relative_diff(
                np.asarray(mpsop.mps_to_vector(m_inc)),
                np.asarray(mpsop.mps_to_vector(m_full)),
            )
            < 1e-7
        )
