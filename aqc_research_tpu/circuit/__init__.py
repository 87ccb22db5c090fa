"""Circuit IR: ansatz dataclasses, structure generators, elementary gates."""

from .ansatz import (
    Ansatz,
    TrotterAnsatz,
    first_layer_included,
    layer_to_block_range,
)
from .structures import (
    circuit_connectivity_list,
    circuit_layout_list,
    create_ansatz_structure,
    fraction_of_lower_bound,
    lower_limit,
    make_trotter_like_circuit,
    num_blocks_per_layer,
)
