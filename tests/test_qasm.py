"""OpenQASM 3 round-trip parity vs the dense oracle (VERDICT round-2 item 8).

The reference's interoperable deliverable is a Qiskit circuit
(``circuit_transform.py:104-246``); here the contract is: compile the ansatz
to a GateProgram, emit QASM3 text, parse it back, and the dense operator of
the reparsed program must match the independent Kronecker oracle elementwise.
"""

from __future__ import annotations

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.export import ansatz_to_program
from aqc_research_tpu.circuit.program import program_to_matrix
from aqc_research_tpu.circuit.qasm import (
    program_from_qasm3,
    program_to_qasm3,
    save_qasm3,
)
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    make_trotter_like_circuit,
)
from aqc_research_tpu.utils import rand_thetas

from .oracle import oracle_matrix, relative_diff


def _roundtrip(circ, thetas, num_qubits):
    program = ansatz_to_program(circ, thetas)
    text = program_to_qasm3(program, num_qubits)
    reparsed, n2 = program_from_qasm3(text)
    assert n2 == num_qubits
    assert reparsed == program or len(reparsed) == len(program)
    mat = np.asarray(program_to_matrix(reparsed, num_qubits))
    oracle = oracle_matrix(circ, np.asarray(thetas))
    assert relative_diff(mat, oracle) < 1e-10
    return text


@pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
def test_qasm3_roundtrip_plain(entangler):
    np.random.seed(0x696969 + hash(entangler) % 97)
    n = 3
    blocks = create_ansatz_structure(n, "spin", "full", 3 * (n - 1))
    circ = Ansatz.make(n, entangler, blocks)
    thetas = rand_thetas(circ.num_thetas)
    text = _roundtrip(circ, thetas, n)
    assert text.startswith("OPENQASM 3.0;")
    assert 'include "stdgates.inc";' in text
    assert f"qubit[{n}] q;" in text


def test_qasm3_roundtrip_trotter():
    np.random.seed(0x696969)
    n = 3
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
    thetas = rand_thetas(circ.num_thetas)
    text = _roundtrip(circ, thetas, n)
    # Trotter framings emit symbolic pi/2 angles.
    assert "rz(-pi/2)" in text and "rz(pi/2)" in text


def test_qasm3_pruning_tol():
    """Zero-angle pruning (ansatz_to_program tol) shortens the text while the
    operator stays the same up to pruned-rotation error."""
    n = 3
    circ = Ansatz.make(n, "cx", create_ansatz_structure(n, "spin", "full", 4))
    thetas = np.full(circ.num_thetas, 1e-14)
    thetas[0] = 1.2345
    full = program_to_qasm3(ansatz_to_program(circ, thetas), n)
    pruned = program_to_qasm3(ansatz_to_program(circ, thetas, tol=1e-12), n)
    assert len(pruned) < len(full)
    prog, _ = program_from_qasm3(pruned)
    mat = np.asarray(program_to_matrix(prog, n))
    assert relative_diff(mat, oracle_matrix(circ, thetas)) < 1e-10


def test_qasm3_save(tmp_path):
    n = 2
    circ = Ansatz.make(n, "cx", create_ansatz_structure(n, "spin", "full", 2))
    thetas = rand_thetas(circ.num_thetas)
    program = ansatz_to_program(circ, thetas)
    path = tmp_path / "qcircuit.qasm"
    save_qasm3(program, n, path)
    reparsed, n2 = program_from_qasm3(path.read_text())
    assert n2 == n and len(reparsed) == len(program)


def test_qasm3_rejects_outside_subset():
    with pytest.raises(ValueError):
        program_from_qasm3('OPENQASM 3.0;\nqubit[2] q;\nmeasure q[0];\n')
    with pytest.raises(ValueError):
        program_from_qasm3("x q[0];\n")  # no register
