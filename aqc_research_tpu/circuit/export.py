"""Ansatz -> gate-program / dense-matrix conversion.

TPU-native counterpart of the reference circuit exporters
(``/root/reference/aqc_research/circuit_transform.py:104-390``).  Where the
reference emits Qiskit circuits, this emits :class:`GateProgram` records —
consumed by the statevector applier and the MPS engine alike.  The dense
converters live in ops/statevector.py (``ansatz_to_matrix``).
"""

from __future__ import annotations

import numpy as np

from .. import checking as chk
from .ansatz import Ansatz
from .program import GateProgram, ProgramBuilder


def ansatz_to_program(
    circ: Ansatz,
    thetas: np.ndarray,
    *,
    tol: float = 0.0,
) -> GateProgram:
    """Expands an ansatz + Θ into an explicit gate program.

    Mirrors reference ``ansatz_to_qcircuit`` (circuit_transform.py:104-246):
    front Rz/Ry/Rz triplets, entangler + Ry/Rz (ctrl) + Ry/Rs (targ) per unit
    block, Trotter ±pi/2 framing, near-zero-angle gate pruning via ``tol``,
    2nd-order implicit trailing half-layer expansion, circuit power repeats.
    """
    assert isinstance(circ, Ansatz)
    thetas = np.asarray(thetas, dtype=np.float64)
    assert chk.float_1d(thetas, thetas.size == circ.num_thetas)

    n = circ.num_qubits
    th1 = np.asarray(circ.subset1q(thetas))
    th2 = np.asarray(circ.subset2q(thetas))
    trotterized = circ.is_trotterized
    half = circ.half_layer_num_blocks if trotterized else 0

    qb = ProgramBuilder(n)

    if circ.entangler == "cp":

        def entangler(t, c, tg):
            qb.cp(t[4], c, tg)

        def swappable(angle, tg):
            qb.rz(angle, tg)

    elif circ.entangler == "cz":

        def entangler(t, c, tg):
            qb.cz(c, tg)

        def swappable(angle, tg):
            qb.rz(angle, tg)

    else:

        def entangler(t, c, tg):
            qb.cx(c, tg)

        def swappable(angle, tg):
            qb.rx(angle, tg)

    for _ in range(circ.circuit_power):
        for q in range(n):
            t = th1[q]
            if abs(t[2]) > tol:
                qb.rz(t[2], q)
            if abs(t[1]) > tol:
                qb.ry(t[1], q)
            if abs(t[0]) > tol:
                qb.rz(t[0], q)

        for k in range(circ.num_blocks + half):
            k_mod = k % circ.num_blocks
            ctrl = int(circ.blocks[0, k_mod])
            targ = int(circ.blocks[1, k_mod])
            t = th2[k_mod]

            if trotterized and k % 3 == 0:
                qb.rz(-np.pi / 2, ctrl)
            entangler(t, ctrl, targ)
            if abs(t[0]) > tol:
                qb.ry(t[0], ctrl)
            if abs(t[1]) > tol:
                qb.rz(t[1], ctrl)
            if abs(t[2]) > tol:
                qb.ry(t[2], targ)
            if abs(t[3]) > tol:
                swappable(t[3], targ)
            if trotterized and k % 3 == 2:
                qb.rz(np.pi / 2, targ)

    return qb.build()


# -----------------------------------------------------------------------------
# Reference-named aliases (circuit_transform.py): "qcircuit" = GateProgram.
# -----------------------------------------------------------------------------

from .program import (  # noqa: E402
    program_to_matrix as qcircuit_to_matrix,
    program_to_state as qcircuit_to_state,
    state_preparation_program as state_preparation_qcircuit,
)

ansatz_to_qcircuit = ansatz_to_program


def ansatz_to_numpy_fast(circ, thetas):
    """Dense ansatz matrix via the matrix engine (circuit_transform.py:273)."""
    from ..ops.statevector import ansatz_to_matrix

    return ansatz_to_matrix(circ, thetas)


def ansatz_to_numpy_trotter(circ, thetas):
    """Dense matrix of a (possibly Trotterized) ansatz
    (circuit_transform.py:290) — same engine here (it supports Trotter)."""
    from ..ops.statevector import ansatz_to_matrix

    return ansatz_to_matrix(circ, thetas)


def ansatz_to_numpy_by_qiskit(circ, thetas, tol: float = 0.0):
    """Dense matrix via the gate-program route (the reference's Qiskit route,
    circuit_transform.py:249) — a cross-check of ansatz_to_numpy_fast."""
    from .program import program_to_matrix

    return program_to_matrix(ansatz_to_program(circ, thetas, tol=tol), circ.num_qubits)
