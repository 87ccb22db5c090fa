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


def test_remaining_reference_symbols():
    """bit2bit_transform, dense kron builders, out-param constructors,
    derv_cphase, and the circuit-level MPS entry points."""
    n = 3
    assert compat.bit2bit_transform(n, 0) == 2

    cx_full = np.asarray(compat.np_cx_matrix(n, 0, 2))
    state = np.zeros(2**n, complex)
    state[0b001] = 1  # qubit 0 set -> CX(0->2) flips qubit 2
    assert abs((cx_full @ state)[0b101] - 1) < 1e-12

    blk = np.asarray(
        compat.np_block_matrix(2, 0, 1, compat.make_ry(0.3), compat.make_rz(0.4),
                               np_x())
    )
    # Unitary, and equals c_mat/t_mat expansion after the CX entangler.
    assert np.allclose(blk @ blk.conj().T, np.eye(4), atol=1e-12)
    expected = (
        np_gate_on_qubit(np.asarray(compat.make_ry(0.3)), 0, 2)
        @ np_gate_on_qubit(np.asarray(compat.make_rz(0.4)), 1, 2)
        @ np.asarray(compat.np_cx_matrix(2, 0, 1))
    )
    assert np.allclose(blk, expected, atol=1e-12)

    out = np.zeros((2, 2), complex)
    assert compat.make_rx(0.7, out) is out
    assert np.allclose(out, np.asarray(compat.make_rx(0.7)))

    # derv_cphase vs numeric difference of <CP(a) w | z>.  Reference
    # contract (core_op_matrix.py:430-477): w is POST-gate (already contains
    # CP(a)); result is -1j * <P11 w | z>.
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))
    z = rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))
    a, eps = 0.3, 1e-6

    def f(aa):
        cp = np.diag([1, 1, 1, np.exp(1j * aa)])
        return np.sum(np.conj(cp @ w) * z)

    num = (f(a + eps) - f(a - eps)) / (2 * eps)
    w_post = np.diag([1, 1, 1, np.exp(1j * a)]) @ w
    got = complex(np.asarray(compat.derv_cphase(0, 1, w_post, z)))
    assert abs(got - num) < 1e-6

    # Circuit-level MPS entry points.
    from aqc_research_tpu.circuit.program import ProgramBuilder, program_to_state

    pb = ProgramBuilder(n)
    pb.x(0)
    pb.cx(0, 1)
    prog = pb.build()
    mps = compat.mps_from_circuit(prog, n, chi_max=4)
    ref = np.asarray(program_to_state(prog, n))
    assert np.allclose(np.asarray(mpsop.mps_to_vector(mps)), ref, atol=1e-10)
    mps2 = compat.qcircuit_mul_mps(prog, mps)
    v2 = np.asarray(mpsop.mps_to_vector(mps2))
    assert abs(np.linalg.norm(v2) - 1) < 1e-9


def test_as_device_complex_safety():
    """utils.as_device: complex host arrays via from_host; device/real pass."""
    import jax.numpy as jnp

    from aqc_research_tpu.utils import as_device, to_host

    x = np.arange(8, dtype=np.float64)
    assert np.allclose(np.asarray(as_device(x)), x)
    c = (np.arange(8) + 1j * np.arange(8)).astype(np.complex128)
    dev = as_device(c)
    assert np.allclose(to_host(dev), c)
    # device arrays pass through untouched
    again = as_device(dev)
    assert isinstance(again, type(dev))
    y = as_device(jnp.ones(4))
    assert np.allclose(np.asarray(y), 1.0)
