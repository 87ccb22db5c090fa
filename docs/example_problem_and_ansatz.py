"""Example: the optimization problem and the ansatz circuit families.

TPU-native twin of the reference's ``docs/problem_and_ansatz.ipynb``:
unit blocks and entanglers, the layered spin / cyclic_spin layouts and the
exact-compiling lower bound, the first/second-order Trotter circuits, and
the Trotterized ansatz's triplet blocks — rendered through the framework's
interchange format (OpenQASM 3, ``circuit/qasm.py``) instead of Qiskit
drawings, and backed by the numeric checks a notebook drawing cannot give
(unitarity, QASM round-trip, and the exact ansatz == Trotter equivalence of
the perfect initialization).

Run:  python docs/example_problem_and_ansatz.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # structure demo: CPU f64 is ideal

from aqc_research_tpu.config import set_precision

set_precision("high")

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.export import ansatz_to_numpy_fast, ansatz_to_program
from aqc_research_tpu.circuit.qasm import program_from_qasm3, program_to_qasm3
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    fraction_of_lower_bound,
    lower_limit,
    make_trotter_like_circuit,
    num_blocks_per_layer,
)
from aqc_research_tpu.targets.trotter import (
    Trotter,
    init_ansatz_to_trotter,
    neel_init_state,
    trotter_circuit,
)

SEED = 1234567


def rand_thetas(num: int, rng) -> np.ndarray:
    # The reference's exemplar angles: round, bounded away from zero
    # (a theta of exactly 0 prunes the gate in the exporter).
    return np.round(2 * np.pi * (0.01 + 0.98 * rng.random(num)), 2)


def show(title: str, text: str) -> None:
    print(f"\n--- {title} " + "-" * max(0, 60 - len(title)))
    print(text)


if __name__ == "__main__":
    rng = np.random.default_rng(SEED)

    # ------------------------------------------------------------------
    # 1. Unit blocks.  Every 2-qubit unit block is  [1q triplet on ctrl,
    #    1q triplet on targ] -> entangler -> Ry/Rz on ctrl, Ry/Rx|Rz on
    #    targ; the entangler is cx, cz, or cp (5th angle).
    # ------------------------------------------------------------------
    for ent in ("cx", "cz", "cp"):
        circ = Ansatz.make(2, ent, np.array([[0], [1]]))
        thetas = rand_thetas(circ.num_thetas, rng)
        prog = ansatz_to_program(circ, thetas[: circ.num_thetas])
        show(
            f"unit block, entangler={ent} "
            f"({circ.tpb} block angles + 3 front angles/qubit)",
            program_to_qasm3(prog, 2),
        )

    # ------------------------------------------------------------------
    # 2. The layered "spin" ansatz.  A random SU(2^n) target needs depth
    #    L >= (4^n - 3n - 1)/4 for exact compiling; layered ansatz depth
    #    is reported as a fraction of that bound.
    # ------------------------------------------------------------------
    n = 5
    bpl = num_blocks_per_layer(n, "spin")
    depth = 2 * bpl  # two layers
    blocks = create_ansatz_structure(n, "spin", "full", depth)
    circ = Ansatz.make(n, "cx", blocks)
    show(
        f"spin layout, n={n}: lower bound L >= {lower_limit(n)}, "
        f"this ansatz depth={depth} "
        f"({100 * depth / lower_limit(n):.0f}% of bound; "
        f"fraction 0.63 -> {fraction_of_lower_bound(0.63, n, 'spin')} layers)",
        f"blocks (ctrl row / targ row):\n{blocks}",
    )
    thetas = rand_thetas(circ.num_thetas, rng)
    v = ansatz_to_numpy_fast(circ, thetas)
    unit_err = np.abs(v.conj().T @ v - np.eye(circ.dimension)).max()
    print(f"V(Theta) unitarity: |V^H V - I|_max = {unit_err:.2e}")

    # The OpenQASM 3 interchange surface round-trips the whole circuit.
    prog = ansatz_to_program(circ, thetas)
    qasm = program_to_qasm3(prog, n)
    prog2, n2 = program_from_qasm3(qasm)
    assert n2 == n and len(prog2) == len(prog)
    print(f"OpenQASM 3 round-trip: {len(prog)} gates -> emit -> parse -> OK")

    # ------------------------------------------------------------------
    # 3. "cyclic_spin": also layered, with the pair pattern advanced by
    #    one qubit per block (harder to spot the layers by eye).
    # ------------------------------------------------------------------
    cblocks = create_ansatz_structure(n, "cyclic_spin", "full", depth)
    show("cyclic_spin layout, same depth", f"{cblocks}")

    # ------------------------------------------------------------------
    # 4. Trotter circuits (the ASP target).  First order: chessboard
    #    layers of two-site XXZ blocks.  Second order: the leading and
    #    trailing HALF-layers carry dt/2 angles.
    # ------------------------------------------------------------------
    for second in (False, True):
        prog = trotter_circuit(
            n, dt=0.4, delta=1.0, num_trotter_steps=1, second_order=second
        )
        show(
            f"{'second' if second else 'first'}-order Trotter step "
            f"(n={n}, dt=0.4, delta=1.0): {len(prog)} gates",
            "\n".join(program_to_qasm3(prog, n).splitlines()[:12]) + "\n...",
        )

    # ------------------------------------------------------------------
    # 5. The Trotterized ansatz: layers of TRIPLE unit blocks (ctrl/targ
    #    swapped in the middle block), one triplet per adjacent pair —
    #    the same chessboard as the Trotter circuit, so the 'perfect'
    #    initialization reproduces Trotter EXACTLY.
    # ------------------------------------------------------------------
    layers = 2
    tblocks = make_trotter_like_circuit(n, layers)
    tcirc = TrotterAnsatz.make(n, tblocks, second_order=True)
    triplets = tblocks.reshape(2, layers, n - 1, 3)
    show(
        f"Trotterized ansatz, n={n}, {layers} layers "
        f"({tcirc.num_thetas} parameters)",
        f"layer-0 triplets (ctrl/targ per column):\n{triplets[:, 0]}",
    )

    evol_time, delta = 0.8, 1.0
    th0 = init_ansatz_to_trotter(
        tcirc, np.zeros(tcirc.num_thetas), evol_time=evol_time, delta=delta
    )
    v = ansatz_to_numpy_fast(tcirc, th0)
    trot = Trotter(
        num_qubits=n,
        evol_time=evol_time,
        num_steps=layers,
        delta=delta,
        second_order=True,
    )
    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1.0
    ini = neel_init_state(n)
    psi_t = np.asarray(trot.as_vector(ini))
    # V(theta_perfect) |neel> must equal the Trotter evolution exactly.
    neel_idx = sum(1 << k for k in range(0, n, 2))
    fid = abs(np.vdot(psi_t, v[:, neel_idx])) ** 2
    print(f"perfect-init equivalence: |<Trotter psi, V(th0) psi>|^2 = {fid:.12f}")
    assert fid > 1.0 - 1e-12
    print("\nall checks passed")
