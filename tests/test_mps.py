"""MPS engine tests against the dense statevector ground truth.

Mirrors the reference MPS test strategy (test_mps.py:57-199): mps_to_vector,
mps_dot, program application vs dense state, and V/V† identities — with the
dense engine (itself oracle-verified) as the ground truth.
"""

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.export import ansatz_to_program
from aqc_research_tpu.circuit.program import (
    Gate,
    ProgramBuilder,
    program_to_state,
)
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    make_trotter_like_circuit,
)
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.ops.statevector import v_dagger_mul_vec, v_mul_vec
from aqc_research_tpu.utils import rand_state, rand_thetas

from .oracle import relative_diff

TOL = 1e-10


def _rand_program(n, depth, rng):
    qb = ProgramBuilder(n)
    for _ in range(depth):
        kind = rng.integers(0, 6)
        q = int(rng.integers(0, n))
        if kind == 0:
            qb.rx(float(rng.normal()), q)
        elif kind == 1:
            qb.ry(float(rng.normal()), q)
        elif kind == 2:
            qb.rz(float(rng.normal()), q)
        elif kind == 3:
            qb.h(q)
        else:
            q2 = int(rng.integers(0, n))
            while q2 == q:
                q2 = int(rng.integers(0, n))
            if kind == 4:
                qb.cx(q, q2)
            else:
                qb.cp(float(rng.normal()), q, q2)
    return qb.build()


class TestMpsBasics:
    def test_zero_state(self):
        mps = mpsop.mps_zero(4, 8)
        vec = np.asarray(mpsop.mps_to_vector(mps))
        expected = np.zeros(16)
        expected[0] = 1
        assert relative_diff(vec, expected) < TOL
        assert mpsop.check_mps(mps)

    @pytest.mark.parametrize("n", [2, 3, 5])
    def test_program_vs_dense(self, n):
        """Random program applied in MPS form equals the dense state."""
        rng = np.random.default_rng(42 + n)
        prog = _rand_program(n, 4 * n, rng)
        dense = np.asarray(program_to_state(prog, n))
        mps = mpsop.mps_from_program(prog, n, chi_max=2 ** ((n + 1) // 2 + 1))
        assert relative_diff(np.asarray(mpsop.mps_to_vector(mps)), dense) < 1e-8
        assert abs(float(mpsop.mps_norm(mps)) - 1) < 1e-9

    def test_mps_dot_vs_dense(self):
        n = 4
        rng = np.random.default_rng(3)
        p1 = _rand_program(n, 10, rng)
        p2 = _rand_program(n, 10, rng)
        d1 = np.asarray(program_to_state(p1, n))
        d2 = np.asarray(program_to_state(p2, n))
        m1 = mpsop.mps_from_program(p1, n, chi_max=8)
        m2 = mpsop.mps_from_program(p2, n, chi_max=8)
        got = complex(np.asarray(mpsop.mps_dot(m1, m2)))
        assert abs(got - np.vdot(d1, d2)) < 1e-9

    def test_mps_from_dense_roundtrip(self):
        n = 4
        state = rand_state(n)
        mps = mpsop.mps_from_dense(state, chi_max=2**n)
        assert relative_diff(np.asarray(mpsop.mps_to_vector(mps)), state) < 1e-10
        assert mpsop.check_mps(mps)

    def test_nonadjacent_gate_swap_network(self):
        """CX(0, 3) through the swap network equals the dense application."""
        n = 4
        rng = np.random.default_rng(5)
        prep = _rand_program(n, 8, rng)
        dense = np.asarray(program_to_state(prep + (Gate("cx", (0, 3)),), n))
        mps = mpsop.mps_from_program(prep + (Gate("cx", (0, 3)),), n, chi_max=16)
        assert relative_diff(np.asarray(mpsop.mps_to_vector(mps)), dense) < 1e-8


class TestMpsTruncation:
    def test_truncation_preserves_norm(self):
        n = 5
        rng = np.random.default_rng(9)
        prog = _rand_program(n, 30, rng)
        mps = mpsop.mps_from_program(prog, n, chi_max=4, trunc_thr=1e-3)
        assert abs(float(mpsop.mps_norm(mps)) - 1) < 1e-8

    def test_product_state_untouched(self):
        """A product state has rank-1 bonds — truncation must be exact."""
        n = 4
        qb = ProgramBuilder(n)
        for q in range(n):
            qb.ry(0.3 * (q + 1), q)
        prog = qb.build()
        dense = np.asarray(program_to_state(prog, n))
        mps = mpsop.mps_from_program(prog, n, chi_max=2, trunc_thr=1e-2)
        assert relative_diff(np.asarray(mpsop.mps_to_vector(mps)), dense) < 1e-10

    def test_truncated_fidelity_reasonable(self):
        """chi=4 truncation of a moderately entangled state keeps high overlap."""
        n = 6
        rng = np.random.default_rng(17)
        prog = _rand_program(n, 12, rng)
        dense = np.asarray(program_to_state(prog, n))
        mps = mpsop.mps_from_program(prog, n, chi_max=4, trunc_thr=1e-8)
        vec = np.asarray(mpsop.mps_to_vector(mps))
        overlap = abs(np.vdot(vec / np.linalg.norm(vec), dense))
        assert overlap > 0.8


class TestAnsatzOnMps:
    @pytest.mark.parametrize("second_order", [False, True])
    def test_v_mul_mps_vs_dense(self, second_order):
        n = 4
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), second_order)
        thetas = rand_thetas(circ.num_thetas)
        rng = np.random.default_rng(23)
        prep = _rand_program(n, 6, rng)
        ini_dense = np.asarray(program_to_state(prep, n))
        ini_mps = mpsop.mps_from_program(prep, n, chi_max=16)

        out = mpsop.v_mul_mps(circ, thetas, ini_mps)
        expected = np.asarray(v_mul_vec(circ, thetas, ini_dense))
        assert relative_diff(np.asarray(mpsop.mps_to_vector(out)), expected) < 1e-8

        out_d = mpsop.v_dagger_mul_mps(circ, thetas, ini_mps)
        expected_d = np.asarray(v_dagger_mul_vec(circ, thetas, ini_dense))
        assert relative_diff(np.asarray(mpsop.mps_to_vector(out_d)), expected_d) < 1e-8

    def test_v_vdagger_identity(self):
        """V† V x == x in MPS form (reference test_mps.py:151-194)."""
        n = 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), False)
        thetas = rand_thetas(circ.num_thetas)
        mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=8)
        vec0 = np.asarray(mpsop.mps_to_vector(mps))
        out = mpsop.v_dagger_mul_mps(circ, thetas, mpsop.v_mul_mps(circ, thetas, mps))
        assert relative_diff(np.asarray(mpsop.mps_to_vector(out)), vec0) < 1e-8


class TestFlipAmplitudes:
    def test_flip_amplitudes_vs_dense(self):
        """One-sweep flip amplitudes match dense-state gathers."""
        n = 5
        rng = np.random.default_rng(31)
        prog = _rand_program(n, 15, rng)
        mps = mpsop.mps_from_program(prog, n, chi_max=8)
        dense = np.asarray(mpsop.mps_to_vector(mps))
        base_bits = (1, 0, 1, 1, 0)
        base = sum(b << q for q, b in enumerate(base_bits))
        amps = np.asarray(mpsop.mps_flip_amplitudes(mps, base_bits))
        assert abs(amps[0] - dense[base]) < 1e-10
        for q in range(n):
            assert abs(amps[1 + q] - dense[base ^ (1 << q)]) < 1e-10


class TestCircuitPowerMps:
    def test_power_parity_vs_dense(self):
        """V^p on the MPS fast path matches the dense engine (the reference's
        MPS path honors power via ansatz_to_qcircuit,
        circuit_transform.py:200-201)."""
        from aqc_research_tpu.circuit.ansatz import Ansatz
        from aqc_research_tpu.circuit.structures import create_ansatz_structure
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.ops.statevector import v_dagger_mul_vec, v_mul_vec
        from aqc_research_tpu.utils import rand_thetas

        n = 4
        blocks = create_ansatz_structure(n, "spin", "full", 6)
        circ = Ansatz.make(n, "cx", blocks, power=3)
        thetas = rand_thetas(circ.num_thetas)
        m0 = mpsop.rand_mps_vec(n, num_layers=1, chi_max=16)
        v0 = np.asarray(mpsop.mps_to_vector(m0))
        ref = np.asarray(v_mul_vec(circ, thetas, v0))
        got = np.asarray(mpsop.mps_to_vector(mpsop.v_mul_mps(circ, thetas, m0)))
        assert np.max(np.abs(got - ref)) < 1e-9
        refd = np.asarray(v_dagger_mul_vec(circ, thetas, v0))
        gotd = np.asarray(
            mpsop.mps_to_vector(mpsop.v_dagger_mul_mps(circ, thetas, m0))
        )
        assert np.max(np.abs(gotd - refd)) < 1e-9
