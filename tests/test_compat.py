"""Tests of the reference-API compatibility wrappers."""

import numpy as np

from aqc_research_tpu import compat
from aqc_research_tpu.circuit.gates import np_rx, np_ry, np_rz, np_x, np_y, np_z
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.utils import rand_state

from .oracle import np_gate_on_qubit, relative_diff


def test_vector_kernels():
    n = 3
    vec = rand_state(n)
    for q in range(n):
        got = np.asarray(compat.rx_mul_vec(0.7, q, vec))
        expected = np_gate_on_qubit(np_rx(0.7), q, n) @ vec
        assert relative_diff(got, expected) < 1e-12
        got = np.asarray(compat.proj00_mul_vec(vec, q))
        p0 = np.array([[1, 0], [0, 0]], dtype=complex)
        assert relative_diff(got, np_gate_on_qubit(p0, q, n) @ vec) < 1e-12

    got = np.asarray(compat.cx_mul_vec(0, 2, vec))
    cx = np.eye(4, dtype=complex)
    cx[2:, 2:] = np_x()
    from .oracle import np_two_qubit_on

    assert relative_diff(got, np_two_qubit_on(cx, 0, 2, n) @ vec) < 1e-12


def test_dot_kernels():
    n = 3
    w, z = rand_state(n), rand_state(n)
    for q in range(n):
        expected = 0.5j * np.vdot(np_gate_on_qubit(np_y(), q, n) @ w, z)
        assert abs(complex(np.asarray(compat.dot_y(q, w, z))) - expected) < 1e-12


def test_matrix_kernels():
    n, m = 3, 4
    mat = np.random.rand(2**n, m) + 1j * np.random.rand(2**n, m)
    got = np.asarray(compat.rz_mul_mat(0.3, 1, mat))
    expected = np_gate_on_qubit(np_rz(0.3), 1, n) @ mat
    assert relative_diff(got, expected) < 1e-12


def test_mps_gate_wrappers():
    n = 4
    mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=8)
    dense = np.asarray(mpsop.mps_to_vector(mps))
    out = compat.ry_mul_mps(0.5, 2, mps)
    expected = np_gate_on_qubit(np_ry(0.5), 2, n) @ dense
    assert relative_diff(np.asarray(mpsop.mps_to_vector(out)), expected) < 1e-9

    out = compat.cx_mul_mps(1, 2, mps)
    cx = np.eye(4, dtype=complex)
    cx[2:, 2:] = np_x()
    from .oracle import np_two_qubit_on

    expected = np_two_qubit_on(cx, 1, 2, n) @ dense
    assert relative_diff(np.asarray(mpsop.mps_to_vector(out)), expected) < 1e-9

    d = complex(np.asarray(compat.mps_dot_z(0, mps, mps)))
    expected = 0.5j * np.vdot(np_gate_on_qubit(np_z(), 0, n) @ dense, dense)
    assert abs(d - expected) < 1e-9
