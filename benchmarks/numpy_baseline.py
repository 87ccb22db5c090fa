"""NumPy CPU baseline of the ASP hot loop — the benchmark denominator.

The reference library (qiskit-community/aqc-research) publishes no benchmark
numbers and its Qiskit/Aer dependencies are not installed in this
environment, so the ≥20x target (BASELINE.md) is measured against this
faithful NumPy re-implementation of the reference's CPU hot loop:
``v_dagger_mul_vec`` + the analytic co-sweep gradient
(``/root/reference/aqc_research/core_operations.py:606-1019``), using the
same reshape-based sparsity kernels the reference uses (with blocks folded
to single 4x4 applications — a strictly FASTER variant than the reference's
five sparse passes per block, making the baseline conservative).

This module is also parity-tested against the JAX engine (tests/test_bench_
baseline.py), guarding the benchmark's honesty.
"""

from __future__ import annotations

import numpy as np

from aqc_research_tpu.circuit.ansatz import Ansatz
from aqc_research_tpu.circuit.gates import np_phase, np_rx, np_ry, np_rz, np_x, np_y, np_z


def apply_1q(state: np.ndarray, gate: np.ndarray, qubit: int) -> np.ndarray:
    """2x2 gate at ``qubit`` via the reshape trick (one pass)."""
    m = state.reshape(-1, 2, 2**qubit)
    return np.einsum("ij,ajb->aib", gate, m).reshape(state.shape)


def apply_2q(state: np.ndarray, gate4: np.ndarray, ctrl: int, targ: int) -> np.ndarray:
    """4x4 gate in (ctrl, targ) order at arbitrary qubits (one pass)."""
    q_hi, q_lo = (ctrl, targ) if ctrl > targ else (targ, ctrl)
    g = gate4.reshape(2, 2, 2, 2)
    if ctrl < targ:
        g = np.transpose(g, (1, 0, 3, 2))
    mid = 2 ** (q_hi - q_lo - 1)
    m = state.reshape(-1, 2, mid, 2, 2**q_lo)
    return np.einsum("hlHL,aHbLc->ahblc", g, m).reshape(state.shape)


def _controlled(g2):
    out = np.eye(4, dtype=np.complex128)
    out[2:, 2:] = g2
    return out


def _entangler(circ: Ansatz, tht, dagger: bool):
    if circ.entangler == "cp":
        ang = -tht[4] if dagger else tht[4]
        return _controlled(np_phase(ang))
    if circ.entangler == "cz":
        return _controlled(np_z())
    return _controlled(np_x())


def _rs(circ: Ansatz):
    return np_rx if circ.entangler == "cx" else np_rz


def v_dagger_mul_vec(circ: Ansatz, thetas: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """``V(Θ)† @ vec`` — NumPy twin of the engine (reference
    core_operations.py:713-820 semantics)."""
    th1 = np.asarray(circ.subset1q(thetas))
    th2 = np.asarray(circ.subset2q(thetas))
    trot = circ.is_trotterized
    half = circ.half_layer_num_blocks if trot else 0
    rs = _rs(circ)
    state = vec.astype(np.complex128).copy()

    order = list(range(circ.num_blocks)) + list(range(half))
    for pos in range(len(order) - 1, -1, -1):
        i, k = pos, order[pos]
        ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
        t = th2[k]
        if trot and i % 3 == 2:
            state = apply_1q(state, np_rz(-np.pi / 2), targ)
        c_mat = np_ry(-t[0]) @ np_rz(-t[1])
        t_mat = np_ry(-t[2]) @ rs(-t[3])
        block = _entangler(circ, t, True) @ np.kron(c_mat, t_mat)
        state = apply_2q(state, block, ctrl, targ)
        if trot and i % 3 == 0:
            state = apply_1q(state, np_rz(np.pi / 2), ctrl)

    for q in range(circ.num_qubits):
        t = th1[q]
        state = apply_1q(state, np_rz(-t[2]) @ np_ry(-t[1]) @ np_rz(-t[0]), q)
    return state


def _pauli_dot(w, z, pauli, qubit):
    mats = {"x": np_x(), "y": np_y(), "z": np_z()}
    return 0.5j * np.vdot(apply_1q(w, mats[pauli], qubit), z)


def grad_of_dot_product(
    circ: Ansatz, thetas: np.ndarray, x_vec: np.ndarray, vh_y_vec: np.ndarray
) -> np.ndarray:
    """Complex co-sweep gradient of ``<x, V† y>`` — NumPy twin of the engine
    (reference core_operations.py:823-1019 semantics, full range)."""
    th1 = np.asarray(circ.subset1q(thetas))
    th2 = np.asarray(circ.subset2q(thetas))
    trot = circ.is_trotterized
    half = circ.half_layer_num_blocks if trot else 0
    rs = _rs(circ)
    s_char = "x" if circ.entangler == "cx" else "z"
    cp = circ.entangler == "cp"

    w = x_vec.astype(np.complex128).copy()
    z = vh_y_vec.astype(np.complex128).copy()
    grad = np.zeros(circ.num_thetas, dtype=np.complex128)
    g1 = circ.subset1q(grad)
    g2 = circ.subset2q(grad)

    for q in range(circ.num_qubits):
        t = th1[q]
        w, z = apply_1q(w, np_rz(t[2]), q), apply_1q(z, np_rz(t[2]), q)
        g1[q, 2] = _pauli_dot(w, z, "z", q)
        w, z = apply_1q(w, np_ry(t[1]), q), apply_1q(z, np_ry(t[1]), q)
        g1[q, 1] = _pauli_dot(w, z, "y", q)
        w, z = apply_1q(w, np_rz(t[0]), q), apply_1q(z, np_rz(t[0]), q)
        g1[q, 0] = _pauli_dot(w, z, "z", q)

    order = list(range(circ.num_blocks)) + list(range(half))
    for i, k in enumerate(order):
        ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
        t = th2[k]
        if trot and i % 3 == 0:
            w = apply_1q(w, np_rz(-np.pi / 2), ctrl)
            z = apply_1q(z, np_rz(-np.pi / 2), ctrl)
        ent = _entangler(circ, t, False)
        z = apply_2q(z, ent, ctrl, targ)
        if cp:
            derv = np.zeros((4, 4), dtype=np.complex128)
            derv[3, 3] = 1j * np.exp(1j * t[4])
            g2[k, 4] += np.vdot(apply_2q(w, derv, ctrl, targ), z)
        w = apply_2q(w, ent, ctrl, targ)
        w, z = apply_1q(w, np_ry(t[0]), ctrl), apply_1q(z, np_ry(t[0]), ctrl)
        g2[k, 0] += _pauli_dot(w, z, "y", ctrl)
        w, z = apply_1q(w, np_rz(t[1]), ctrl), apply_1q(z, np_rz(t[1]), ctrl)
        g2[k, 1] += _pauli_dot(w, z, "z", ctrl)
        w, z = apply_1q(w, np_ry(t[2]), targ), apply_1q(z, np_ry(t[2]), targ)
        g2[k, 2] += _pauli_dot(w, z, "y", targ)
        w, z = apply_1q(w, rs(t[3]), targ), apply_1q(z, rs(t[3]), targ)
        g2[k, 3] += _pauli_dot(w, z, s_char, targ)
        if trot and i % 3 == 2:
            w = apply_1q(w, np_rz(np.pi / 2), targ)
            z = apply_1q(z, np_rz(np.pi / 2), targ)
    return grad


def asp_objective_and_gradient(
    circ: Ansatz, thetas: np.ndarray, target: np.ndarray, idx0: int
):
    """The ASP fidelity-term objective + gradient (the bench hot loop):
    ``fobj = 1 - |<e_idx0, V† t>|^2``."""
    vh = v_dagger_mul_vec(circ, thetas, target)
    hs0 = vh[idx0]
    fobj = 1.0 - abs(hs0) ** 2
    x0 = np.zeros_like(target)
    x0[idx0] = 1
    grad = grad_of_dot_product(circ, thetas, x0, vh)
    return fobj, np.real(-2.0 * np.conj(hs0) * grad)
