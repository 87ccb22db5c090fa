"""Brute-force NumPy oracles for parity tests.

Builds dense circuit operators via explicit Kronecker products — an
independent, slow construction mirroring the reference's test oracle approach
(``/root/reference/test/utils_for_testing.py`` + ``ansatz_to_numpy_trotter``,
circuit_transform.py:290-390) but without any Qiskit dependency.  The oracle
never calls into the JAX engines it verifies.
"""

from __future__ import annotations

import numpy as np

from aqc_research_tpu.circuit.ansatz import Ansatz
from aqc_research_tpu.circuit.gates import (
    np_gate_on_qubit,
    np_phase,
    np_rx,
    np_ry,
    np_rz,
    np_two_qubit_on,
    np_x,
    np_z,
)


def np_controlled(gate2x2: np.ndarray) -> np.ndarray:
    """4x4 controlled gate in (control, target) index order."""
    out = np.eye(4, dtype=np.complex128)
    out[2:, 2:] = gate2x2
    return out


def oracle_matrix(circ: Ansatz, thetas: np.ndarray) -> np.ndarray:
    """Dense V(Θ) built gate-by-gate with Kronecker products (little-endian)."""
    n = circ.num_qubits
    dim = 2**n
    thetas = np.asarray(thetas, dtype=np.float64)
    th1 = np.asarray(circ.subset1q(thetas))
    th2 = np.asarray(circ.subset2q(thetas))
    trotterized = circ.is_trotterized
    half = circ.half_layer_num_blocks if trotterized else 0

    if circ.entangler == "cp":
        swappable = np_rz

        def ent_gate(t):
            return np_phase(t[4])

    elif circ.entangler == "cz":
        swappable = np_rz

        def ent_gate(_):
            return np_z()

    else:
        swappable = np_rx

        def ent_gate(_):
            return np_x()

    v = np.eye(dim, dtype=np.complex128)
    for _ in range(circ.circuit_power):
        for q in range(n):
            zyz = np_rz(th1[q, 0]) @ np_ry(th1[q, 1]) @ np_rz(th1[q, 2])
            v = np_gate_on_qubit(zyz, q, n) @ v

        for i in range(circ.num_blocks + half):
            k = i % circ.num_blocks
            ctrl = int(circ.blocks[0, k])
            targ = int(circ.blocks[1, k])
            t = th2[k]
            if trotterized and i % 3 == 0:
                v = np_gate_on_qubit(np_rz(-np.pi / 2), ctrl, n) @ v
            c_mat = np_rz(t[1]) @ np_ry(t[0])
            t_mat = swappable(t[3]) @ np_ry(t[2])
            b4 = np.kron(c_mat, t_mat) @ np_controlled(ent_gate(t))
            v = np_two_qubit_on(b4, ctrl, targ, n) @ v
            if trotterized and i % 3 == 2:
                v = np_gate_on_qubit(np_rz(np.pi / 2), targ, n) @ v
    return v


def relative_diff(a: np.ndarray, b: np.ndarray) -> float:
    """||a - b|| / max(||b||, eps)."""
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))
