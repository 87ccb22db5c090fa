"""Compute engines: statevector, dense matrix, MPS, and gradients."""

from .coord_descent import coord_descent_single_sweep
from .gradients import (
    dot_product,
    grad_of_dot_product,
    grad_of_dot_product_autodiff,
    grad_of_matrix_dot_product,
)
from .mps import (
    MPS,
    apply_1q_mps,
    apply_2q_mps,
    apply_pairs_mps,
    apply_program_mps,
    check_mps,
    mps_dot,
    mps_flip_amplitudes,
    mps_from_dense,
    mps_from_program,
    mps_norm,
    mps_to_vector,
    mps_zero,
    no_truncation_threshold,
    rand_mps_vec,
    v_dagger_mul_mps,
    v_mul_mps,
)
from .mps_gradient import fast_dot_gradient
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
