"""Structure-generator and circuit-transform bookkeeping tests.

Ports the reference's structural coverage: layout generators, the
exact-compiling lower bound, theta bookkeeping under block insertion
(test_circuit_transform.py:92-121), and gate-program export pruning.
"""

import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.export import ansatz_to_program
from aqc_research_tpu.circuit.program import (
    inverse_program,
    program_to_matrix,
    state_preparation_program,
)
from aqc_research_tpu.circuit.structures import (
    create_ansatz_structure,
    fraction_of_lower_bound,
    lower_limit,
    make_trotter_like_circuit,
    num_blocks_per_layer,
)
from aqc_research_tpu.utils import rand_thetas

from .oracle import relative_diff


class TestStructures:
    def test_lower_limit(self):
        # ceil((4^n - 3n - 1)/4), reference circuit_structures.py:42
        assert lower_limit(2) == 3
        assert lower_limit(3) == 14
        assert lower_limit(5) == 252

    @pytest.mark.parametrize("layout", ["spin", "line", "cyclic_spin", "cyclic_line"])
    def test_layout_validity(self, layout):
        for n in (2, 3, 5):
            depth = 3 * n
            blocks = create_ansatz_structure(n, layout, "full", depth)
            assert blocks.shape == (2, depth)
            assert np.all((0 <= blocks) & (blocks < n))
            assert np.all(blocks[0] != blocks[1])

    def test_spin_is_chessboard(self):
        blocks = create_ansatz_structure(4, "spin", "full", 6)
        np.testing.assert_array_equal(blocks[0], [0, 2, 1, 0, 2, 1])
        np.testing.assert_array_equal(blocks[1], [1, 3, 2, 1, 3, 2])

    def test_block_repeat(self):
        blocks = create_ansatz_structure(3, "spin", "full", 2, block_repeat=3)
        assert blocks.shape == (2, 6)
        np.testing.assert_array_equal(blocks[:, 0], blocks[:, 1])
        np.testing.assert_array_equal(blocks[:, 0], blocks[:, 2])

    def test_trotter_like_structure(self):
        blocks = make_trotter_like_circuit(4, 2)
        assert blocks.shape == (2, 2 * 3 * 3)
        bls = blocks.reshape(2, -1, 3)
        # triplets: 1st == 3rd, middle flipped, adjacent qubits
        assert np.all(bls[:, :, 0] == bls[:, :, 2])
        assert np.all(bls[0, :, 0] == bls[1, :, 1])
        assert np.all(bls[0, :, 0] == bls[1, :, 0] + 1)
        # structure is a valid TrotterAnsatz
        TrotterAnsatz.make(4, blocks, True)

    def test_fraction_of_lower_bound(self):
        layers = fraction_of_lower_bound(0.5, 3, "spin")
        assert layers == max(1, (round(0.5 * 14) + 1) // 2)
        assert num_blocks_per_layer(5, "cyclic_spin") == 5
        assert num_blocks_per_layer(5, "line") == 4

    def test_invalid_inputs(self):
        with pytest.raises(ValueError):
            create_ansatz_structure(1, "spin")
        with pytest.raises(ValueError):
            create_ansatz_structure(3, "hexagonal")
        with pytest.raises(ValueError):
            create_ansatz_structure(3, "spin", depth=4, block_repeat=5)
        with pytest.raises(ValueError):
            make_trotter_like_circuit(3, -1)


class TestInsertion:
    def test_theta_bookkeeping(self):
        """Theta layout preserved under insertion (reference
        test_circuit_transform.py:92-121)."""
        n = 3
        circ = Ansatz.make(n, "cp", create_ansatz_structure(n, "spin", "full", 4))
        thetas = rand_thetas(circ.num_thetas)
        extra = create_ansatz_structure(n, "spin", "full", 2)
        pos = 2
        new_circ, new_thetas, idx = circ.insert_unit_blocks(pos, extra, thetas)
        assert new_circ.num_blocks == 6
        assert new_thetas.size == new_circ.num_thetas
        assert np.all(new_thetas[idx] == 0)
        # old thetas preserved around the insertion
        tpb = circ.tpb
        head = 3 * n + pos * tpb
        np.testing.assert_array_equal(new_thetas[:head], thetas[:head])
        np.testing.assert_array_equal(
            new_thetas[head + extra.shape[1] * tpb :], thetas[head:]
        )
        # the original ansatz is untouched (functional update)
        assert circ.num_blocks == 4

    def test_trotter_insertion_alignment(self):
        circ = TrotterAnsatz.make(3, make_trotter_like_circuit(3, 1), False)
        with pytest.raises(ValueError):
            circ.insert_unit_blocks(1, make_trotter_like_circuit(3, 1))


class TestProgramExport:
    def test_tol_pruning_preserves_matrix(self):
        """Near-zero angles pruned from the export still give ~same matrix
        (reference ansatz_to_qcircuit tol semantics)."""
        n = 3
        circ = Ansatz.make(n, "cx", create_ansatz_structure(n, "spin", "full", 4))
        thetas = rand_thetas(circ.num_thetas)
        thetas[::3] = 1e-12  # many near-zero angles
        full = np.asarray(program_to_matrix(ansatz_to_program(circ, thetas), n))
        pruned_prog = ansatz_to_program(circ, thetas, tol=1e-10)
        pruned = np.asarray(program_to_matrix(pruned_prog, n))
        assert len(pruned_prog) < len(ansatz_to_program(circ, thetas))
        assert relative_diff(pruned, full) < 1e-9

    def test_inverse_program(self):
        n = 3
        circ = Ansatz.make(n, "cp", create_ansatz_structure(n, "spin", "full", 3))
        thetas = rand_thetas(circ.num_thetas)
        prog = ansatz_to_program(circ, thetas)
        inv = inverse_program(prog)
        mat = np.asarray(program_to_matrix(prog, n))
        mat_inv = np.asarray(program_to_matrix(inv, n))
        assert relative_diff(mat_inv, mat.conj().T) < 1e-12

    def test_state_preparation_program(self):
        from aqc_research_tpu.circuit.program import program_to_state
        from aqc_research_tpu.targets.trotter import neel_init_state

        n = 4
        prog = state_preparation_program(n, flip_bit=2, state_prep_func=neel_init_state)
        state = np.asarray(program_to_state(prog, n))
        # X_2 then neel (X on 0, 2): bit2 flips twice -> |0101 ^ 0100> = bit0 set...
        neel = sum(1 << k for k in range(0, n, 2))
        expected_index = neel ^ (1 << 2)
        assert abs(state[expected_index]) == pytest.approx(1.0)
