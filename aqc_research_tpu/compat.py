"""Reference-API compatibility layer: every public symbol of
``qiskit-community/aqc-research`` mapped to its TPU-native equivalent.

The framework is a re-design, not a port — in-place workspaces, explicit
bit-order flips and per-gate Aer round trips have no TPU-native counterpart —
but every *capability* does.  This module gives reference users a 1:1 symbol
map: thin functional wrappers where signatures translate directly, and
documented pointers where the idiomatic API differs.

Reference module -> new home (full map):

=========================  =============================================
aqc_research.checking       aqc_research_tpu.checking
aqc_research.utils          aqc_research_tpu.utils
parametric_circuit          circuit.ansatz (Ansatz / TrotterAnsatz)
circuit_structures          circuit.structures
elementary_operations       circuit.gates
core_operations             ops.statevector + ops.gradients (+ wrappers here)
core_op_matrix              ops.statevector/gradients via tail + ops.coord_descent
mps_operations              ops.mps
mps_dot_objective           ops.mps_gradient (+ per-gate wrappers here)
circuit_transform           circuit.export + circuit.program
target_generator            targets.generator
optimizer                   optim (stoppers, AqcOptimizer) + optim.lbfgs (jitted)
job_executor                parallel.executor (+ parallel.multistart for vmap)
model_sp_lhs.*              models.sp_lhs.*
model_sketching.*           models.sketching.*
=========================  =============================================
"""

from __future__ import annotations

import jax.numpy as jnp

from .circuit import gates as G
from .circuit.gates import np_gate_on_qubit, np_two_qubit_on
from .circuit.ansatz import Ansatz
from .ops import mps as mpsop
from .ops.statevector import apply_1q, apply_2q, pauli_dot


# -----------------------------------------------------------------------------
# core_operations-style per-gate vector kernels (functional: return new array).
# Reference: core_operations.py:122-603.  ``qubit`` is the little-endian
# Qiskit index (the reference's internal MSB `pos` plus bit2bit flip).
# -----------------------------------------------------------------------------


def gate2x2_mul_vec(gate2x2, vec, qubit: int):
    """``G_qubit @ vec`` (reference gate2x2_mul_vec, core_operations.py:46)."""
    return apply_1q(jnp.asarray(vec), jnp.asarray(gate2x2), qubit)


def rx_mul_vec(angle, qubit: int, vec):
    return apply_1q(jnp.asarray(vec), G.rx(angle, jnp.asarray(vec).dtype), qubit)


def ry_mul_vec(angle, qubit: int, vec):
    return apply_1q(jnp.asarray(vec), G.ry(angle, jnp.asarray(vec).dtype), qubit)


def rz_mul_vec(angle, qubit: int, vec):
    return apply_1q(jnp.asarray(vec), G.rz(angle, jnp.asarray(vec).dtype), qubit)


def proj00_mul_vec(vec, qubit: int):
    """|0><0| projector at ``qubit`` (core_operations.py:122)."""
    return apply_1q(jnp.asarray(vec), G.proj0(jnp.asarray(vec).dtype), qubit)


def proj11_mul_vec(vec, qubit: int):
    """|1><1| projector at ``qubit`` (core_operations.py:143)."""
    return apply_1q(jnp.asarray(vec), G.proj1(jnp.asarray(vec).dtype), qubit)


def cx_mul_vec(ctrl: int, targ: int, vec):
    v = jnp.asarray(vec)
    return apply_2q(v, G.controlled(G.x(v.dtype), v.dtype), ctrl, targ)


def cz_mul_vec(ctrl: int, targ: int, vec):
    v = jnp.asarray(vec)
    return apply_2q(v, G.controlled(G.z(v.dtype), v.dtype), ctrl, targ)


def cp_mul_vec(angle, ctrl: int, targ: int, vec):
    v = jnp.asarray(vec)
    return apply_2q(v, G.controlled(G.phase(angle, v.dtype), v.dtype), ctrl, targ)


def block_mul_vec(circ: Ansatz, tht, ctrl: int, targ: int, vec, dagger: bool = False):
    """One fused unit block applied to a vector (reference block_mul_vec,
    core_operations.py:354 — five sparse passes there, one 4x4 pass here)."""
    from .ops.statevector import block_gates

    v = jnp.asarray(vec)
    gates = block_gates(circ, jnp.asarray(tht)[None, :], v.dtype, dagger=dagger)
    return apply_2q(v, gates[0], ctrl, targ)


def derv_cphase_mul_vec(angle, ctrl: int, targ: int, vec):
    """d/da CPhase(a) applied to a vector (core_operations.py:561)."""
    from .ops.gradients import _cp_derv_4x4

    v = jnp.asarray(vec)
    return apply_2q(v, _cp_derv_4x4(jnp.asarray(angle), v.dtype), ctrl, targ)


def dot_x(qubit: int, w_vec, z_vec):
    """``0.5j * <X w | z>`` (core_operations.py:267)."""
    return pauli_dot(jnp.asarray(w_vec), jnp.asarray(z_vec), "x", qubit)


def dot_y(qubit: int, w_vec, z_vec):
    return pauli_dot(jnp.asarray(w_vec), jnp.asarray(z_vec), "y", qubit)


def dot_z(qubit: int, w_vec, z_vec):
    return pauli_dot(jnp.asarray(w_vec), jnp.asarray(z_vec), "z", qubit)


# -----------------------------------------------------------------------------
# core_op_matrix-style kernels: identical entry points with a (2^n, m) matrix.
# Reference: core_op_matrix.py:32-477.
# -----------------------------------------------------------------------------


def rx_mul_mat(angle, qubit: int, mat):
    m = jnp.asarray(mat)
    return apply_1q(m, G.rx(angle, m.dtype), qubit, tail=int(m.shape[-1]))


def ry_mul_mat(angle, qubit: int, mat):
    m = jnp.asarray(mat)
    return apply_1q(m, G.ry(angle, m.dtype), qubit, tail=int(m.shape[-1]))


def rz_mul_mat(angle, qubit: int, mat):
    m = jnp.asarray(mat)
    return apply_1q(m, G.rz(angle, m.dtype), qubit, tail=int(m.shape[-1]))


def gate2x2_mul_mat(gate2x2, mat, qubit: int):
    m = jnp.asarray(mat)
    return apply_1q(m, jnp.asarray(gate2x2), qubit, tail=int(m.shape[-1]))


def cx_mul_mat(ctrl: int, targ: int, mat):
    m = jnp.asarray(mat)
    return apply_2q(m, G.controlled(G.x(m.dtype), m.dtype), ctrl, targ, tail=int(m.shape[-1]))


def cz_mul_mat(ctrl: int, targ: int, mat):
    m = jnp.asarray(mat)
    return apply_2q(m, G.controlled(G.z(m.dtype), m.dtype), ctrl, targ, tail=int(m.shape[-1]))


def cp_mul_mat(angle, ctrl: int, targ: int, mat):
    m = jnp.asarray(mat)
    return apply_2q(
        m, G.controlled(G.phase(angle, m.dtype), m.dtype), ctrl, targ, tail=int(m.shape[-1])
    )


def x_dot_mat(qubit: int, w_mat, z_mat):
    m = jnp.asarray(w_mat)
    return pauli_dot(m, jnp.asarray(z_mat), "x", qubit, tail=int(m.shape[-1]))


def y_dot_mat(qubit: int, w_mat, z_mat):
    m = jnp.asarray(w_mat)
    return pauli_dot(m, jnp.asarray(z_mat), "y", qubit, tail=int(m.shape[-1]))


def z_dot_mat(qubit: int, w_mat, z_mat):
    m = jnp.asarray(w_mat)
    return pauli_dot(m, jnp.asarray(z_mat), "z", qubit, tail=int(m.shape[-1]))


# -----------------------------------------------------------------------------
# mps_dot_objective-style per-gate MPS primitives.
# Reference: mps_dot_objective.py:245-516 (each was a full Aer re-simulation).
# -----------------------------------------------------------------------------


def x_mul_mps(qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.x(mps.gammas.dtype), qubit)


def y_mul_mps(qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.y(mps.gammas.dtype), qubit)


def z_mul_mps(qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.z(mps.gammas.dtype), qubit)


def rx_mul_mps(angle, qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.rx(angle, mps.gammas.dtype), qubit)


def ry_mul_mps(angle, qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.ry(angle, mps.gammas.dtype), qubit)


def rz_mul_mps(angle, qubit: int, mps: mpsop.MPS) -> mpsop.MPS:
    return mpsop.apply_1q_mps(mps, G.rz(angle, mps.gammas.dtype), qubit)


def _two_q_mps(mps, gate, ctrl, targ, trunc_thr):
    lo, hi = min(ctrl, targ), max(ctrl, targ)
    mat = gate.reshape(2, 2, 2, 2)
    if ctrl > targ:
        mat = jnp.transpose(mat, (1, 0, 3, 2))
    # Arbitrary site pairs, matching the reference contract (Aer handles the
    # swap network internally; here apply_2q_any_mps does).
    return mpsop.apply_2q_any_mps(mps, mat.reshape(4, 4), lo, hi, trunc_thr=trunc_thr)


def cx_mul_mps(ctrl: int, targ: int, mps: mpsop.MPS, *, trunc_thr=None) -> mpsop.MPS:
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
    return _two_q_mps(mps, G.controlled(G.x(mps.gammas.dtype), mps.gammas.dtype), ctrl, targ, thr)


def cz_mul_mps(ctrl: int, targ: int, mps: mpsop.MPS, *, trunc_thr=None) -> mpsop.MPS:
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
    return _two_q_mps(mps, G.controlled(G.z(mps.gammas.dtype), mps.gammas.dtype), ctrl, targ, thr)


def cp_mul_mps(angle, ctrl: int, targ: int, mps: mpsop.MPS, *, trunc_thr=None) -> mpsop.MPS:
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
    return _two_q_mps(
        mps, G.controlled(G.phase(angle, mps.gammas.dtype), mps.gammas.dtype), ctrl, targ, thr
    )


def mps_dot_x(qubit: int, w: mpsop.MPS, z: mpsop.MPS):
    """``0.5j * <X w | z>`` in MPS form (mps_dot_objective.py:471)."""
    return 0.5j * mpsop.mps_dot(x_mul_mps(qubit, w), z)


def mps_dot_y(qubit: int, w: mpsop.MPS, z: mpsop.MPS):
    return 0.5j * mpsop.mps_dot(y_mul_mps(qubit, w), z)


def mps_dot_z(qubit: int, w: mpsop.MPS, z: mpsop.MPS):
    return 0.5j * mpsop.mps_dot(z_mul_mps(qubit, w), z)


# -----------------------------------------------------------------------------
# Remaining reference-named entry points (symbol-level parity).
# -----------------------------------------------------------------------------


def bit2bit_transform(n: int, i: int) -> int:
    """Bit-ordering flip between MSB-first internal positions and Qiskit's
    little-endian qubit indices (core_operations.py:34-44).  This framework is
    little-endian THROUGHOUT, so the helper exists only for code ported from
    the reference's internal convention."""
    return n - 1 - int(i)


def derv_cphase(ctrl: int, targ: int, w_mat, z_mat):
    """``d<w|z>/d(angle)`` of the CPhase parameter against matrix states,
    matching the reference contract EXACTLY (core_op_matrix.py:430-477):
    ``w_mat`` is assumed to already contain the CP(a) gate (post-gate w),
    and the result is ``-1j * <P11 w | z>`` with P11 the ctrl=targ=1
    projector.  (No workspace argument — functional arrays.)"""
    import jax.numpy as jnp

    from .ops.statevector import apply_2q

    w_mat = jnp.asarray(w_mat)
    p11 = jnp.zeros((4, 4), w_mat.dtype).at[3, 3].set(1.0)
    tail = int(w_mat.shape[-1]) if w_mat.ndim == 2 else None
    w = apply_2q(w_mat, p11, ctrl, targ, tail=tail)
    return -1j * jnp.sum(jnp.conj(w) * jnp.asarray(z_mat))


def np_block_matrix(n: int, c: int, t: int, c_mat, t_mat, gate_mat) -> "np.ndarray":
    """Dense unit-block unitary: controlled-``gate_mat`` entangler at (c, t)
    followed by 1-qubit ``c_mat`` on the control and ``t_mat`` on the target
    (elementary_operations.py:39-81; ``gate_mat`` is the 2x2 gate G of the
    controlled entangler).  Qubit indices are little-endian (Qiskit), like
    the rest of this framework — the reference's internal MSB-first variant
    relates via :func:`bit2bit_transform`."""
    import numpy as np

    ent4 = np.asarray(G.controlled(np.asarray(gate_mat)))
    ent = np_two_qubit_on(ent4, c, t, n)
    mc = np_gate_on_qubit(np.asarray(c_mat), c, n)
    mt = np_gate_on_qubit(np.asarray(t_mat), t, n)
    return mc @ mt @ ent


def np_cx_matrix(n: int, c: int, t: int) -> "np.ndarray":
    """Dense CX unitary on ``n`` qubits (elementary_operations.py:84-120)."""
    import numpy as np

    return np_two_qubit_on(np.asarray(G.controlled(G.np_x())), c, t, n)


def make_rx(phi: float, out=None):
    """Reference out-param constructor (elementary_operations.py:143-165);
    arrays are immutable here, so ``out`` is filled if given (NumPy only)."""
    import numpy as np

    mat = G.np_rx(phi)
    if out is not None:
        np.copyto(out, mat)
        return out
    return mat


def make_ry(phi: float, out=None):
    import numpy as np

    mat = G.np_ry(phi)
    if out is not None:
        np.copyto(out, mat)
        return out
    return mat


def make_rz(phi: float, out=None):
    import numpy as np

    mat = G.np_rz(phi)
    if out is not None:
        np.copyto(out, mat)
        return out
    return mat


def mps_from_circuit(program, num_qubits: int, *, trunc_thr=None, chi_max: int = 64):
    """MPS of ``program`` applied to |0...0> — the reference's Aer-backed
    entry point (mps_operations.py:216-265) with a GateProgram instead of a
    QuantumCircuit."""
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
    return mpsop.mps_from_program(program, num_qubits, chi_max=chi_max, trunc_thr=thr)


def qcircuit_mul_mps(program, mps: "mpsop.MPS", *, trunc_thr=None):
    """Applies a gate program to an existing MPS (mps_operations.py:268-298)."""
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
    return mpsop.apply_program_mps(mps, program, trunc_thr=thr)
