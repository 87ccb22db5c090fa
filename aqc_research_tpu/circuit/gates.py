"""Elementary 2x2 / 4x4 gate constructors.

TPU-native counterpart of the reference's dense gate constructors
(``/root/reference/aqc_research/elementary_operations.py:39-291``).  All
constructors are pure jnp functions of (traced) angles, so they can sit inside
``jit`` / ``grad`` / ``vmap``; batched angle arrays produce batched gates.

Conventions (identical to the reference / Qiskit):

* ``rx(a) = [[cos a/2, -i sin a/2], [-i sin a/2, cos a/2]]``
* ``ry(a) = [[cos a/2, -sin a/2], [sin a/2, cos a/2]]``
* ``rz(a) = diag(e^{-i a/2}, e^{+i a/2})``
* ``phase(a) = diag(1, e^{i a})``
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import complex_dtype


def _cdtype(dtype=None):
    return complex_dtype() if dtype is None else dtype


def _stack22(a, b, c, d, dtype):
    """Builds (..., 2, 2) from four (...,) entries."""
    a, b, c, d = (jnp.asarray(v, dtype) for v in (a, b, c, d))
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    return jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)], axis=-2
    )


def rx(angle, dtype=None):
    """X-rotation gate, cf. reference ``np_rx`` (elementary_operations.py:123)."""
    dtype = _cdtype(dtype)
    a = 0.5 * jnp.asarray(angle)
    cs = jnp.cos(a).astype(dtype)
    sn = (-1j * jnp.sin(a)).astype(dtype)
    return _stack22(cs, sn, sn, cs, dtype)


def ry(angle, dtype=None):
    """Y-rotation gate, cf. reference ``np_ry`` (elementary_operations.py:168)."""
    dtype = _cdtype(dtype)
    a = 0.5 * jnp.asarray(angle)
    cs = jnp.cos(a).astype(dtype)
    sn = jnp.sin(a).astype(dtype)
    return _stack22(cs, -sn, sn, cs, dtype)


def rz(angle, dtype=None):
    """Z-rotation gate, cf. reference ``np_rz`` (elementary_operations.py:213)."""
    dtype = _cdtype(dtype)
    a = jnp.asarray(angle)
    ep = jnp.exp(0.5j * a).astype(dtype)
    em = jnp.exp(-0.5j * a).astype(dtype)
    zero = jnp.zeros_like(ep)
    return _stack22(em, zero, zero, ep, dtype)


def phase(angle, dtype=None):
    """Phase gate diag(1, e^{ia}), cf. reference ``np_phase``."""
    dtype = _cdtype(dtype)
    e = jnp.exp(1j * jnp.asarray(angle)).astype(dtype)
    one = jnp.ones_like(e)
    zero = jnp.zeros_like(e)
    return _stack22(one, zero, zero, e, dtype)


def x(dtype=None):
    return jnp.asarray([[0, 1], [1, 0]], _cdtype(dtype))


def y(dtype=None):
    return jnp.asarray([[0, -1j], [1j, 0]], _cdtype(dtype))


def z(dtype=None):
    return jnp.asarray([[1, 0], [0, -1]], _cdtype(dtype))


def eye2(dtype=None):
    return jnp.eye(2, dtype=_cdtype(dtype))


def proj0(dtype=None):
    """Projector |0><0|."""
    return jnp.asarray([[1, 0], [0, 0]], _cdtype(dtype))


def proj1(dtype=None):
    """Projector |1><1|."""
    return jnp.asarray([[0, 0], [0, 1]], _cdtype(dtype))


def controlled(gate2x2, dtype=None):
    """4x4 controlled gate in (control, target) index order:
    ``|0><0| (x) I + |1><1| (x) G``.  Supports batched (..., 2, 2) gates."""
    dtype = _cdtype(dtype)
    g = jnp.asarray(gate2x2, dtype)
    batch = g.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=dtype), batch + (2, 2))
    zero = jnp.zeros(batch + (2, 2), dtype)
    top = jnp.concatenate([eye, zero], axis=-1)
    bot = jnp.concatenate([zero, g], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def kron2(a, b):
    """Kronecker product of two (..., 2, 2) gates -> (..., 4, 4); supports
    batched leading dims (jnp.kron does not)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    out = jnp.einsum("...ij,...kl->...ikjl", a, b)
    return out.reshape(out.shape[:-4] + (4, 4))


# -----------------------------------------------------------------------------
# NumPy twins — used by test oracles (Kronecker-product constructions) so that
# parity tests do not depend on the JAX code they verify.
# -----------------------------------------------------------------------------


def np_rx(angle: float) -> np.ndarray:
    a = 0.5 * float(angle)
    cs, sn = np.cos(a), -1j * np.sin(a)
    return np.array([[cs, sn], [sn, cs]], dtype=np.complex128)


def np_ry(angle: float) -> np.ndarray:
    a = 0.5 * float(angle)
    cs, sn = np.cos(a), np.sin(a)
    return np.array([[cs, -sn], [sn, cs]], dtype=np.complex128)


def np_rz(angle: float) -> np.ndarray:
    e = np.exp(0.5j * float(angle))
    return np.array([[1.0 / e, 0], [0, e]], dtype=np.complex128)


def np_phase(angle: float) -> np.ndarray:
    return np.array([[1, 0], [0, np.exp(1j * float(angle))]], dtype=np.complex128)


def np_x() -> np.ndarray:
    return np.array([[0, 1], [1, 0]], dtype=np.complex128)


def np_y() -> np.ndarray:
    return np.array([[0, -1j], [1j, 0]], dtype=np.complex128)


def np_z() -> np.ndarray:
    return np.array([[1, 0], [0, -1]], dtype=np.complex128)


def np_gate_on_qubit(gate: np.ndarray, qubit: int, num_qubits: int) -> np.ndarray:
    """Expands a 2x2 gate at ``qubit`` (little-endian/Qiskit index) to the
    full ``2^n x 2^n`` operator via Kronecker products.  Oracle-only."""
    eye_hi = np.eye(2 ** (num_qubits - qubit - 1), dtype=np.complex128)
    eye_lo = np.eye(2**qubit, dtype=np.complex128)
    return np.kron(np.kron(eye_hi, gate), eye_lo)


def np_two_qubit_on(gate4x4: np.ndarray, ctrl: int, targ: int, num_qubits: int) -> np.ndarray:
    """Expands a 4x4 gate given in (ctrl, targ) index order to the full
    operator, for arbitrary (possibly non-adjacent) qubits.  Oracle-only."""
    g = np.asarray(gate4x4, dtype=np.complex128).reshape(2, 2, 2, 2)
    full = np.zeros((2**num_qubits, 2**num_qubits), dtype=np.complex128)
    for co in range(2):
        for to in range(2):
            for ci in range(2):
                for ti in range(2):
                    if g[co, to, ci, ti] == 0:
                        continue
                    op_c = np.zeros((2, 2), dtype=np.complex128)
                    op_c[co, ci] = 1
                    op_t = np.zeros((2, 2), dtype=np.complex128)
                    op_t[to, ti] = 1
                    term = np_gate_on_qubit(op_c, ctrl, num_qubits) @ np_gate_on_qubit(
                        op_t, targ, num_qubits
                    )
                    full += g[co, to, ci, ti] * term
    return full
