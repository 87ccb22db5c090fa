"""Targets: Trotter evolution, target state/unitary generators."""

from .generator import (
    available_target_matrix_types,
    available_target_state_types,
    make_su_matrix,
    make_target_matrix,
    make_target_state,
    target_state_from_circuit,
)
