"""Compute engines: statevector, dense matrix, MPS, and gradients."""

from .statevector import (
    ansatz_to_matrix,
    apply_1q,
    apply_2q,
    pauli_dot,
    v_dagger_mul_mat,
    v_dagger_mul_vec,
    v_mul_mat,
    v_mul_vec,
)
