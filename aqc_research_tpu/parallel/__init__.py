"""Device-parallel layer: multi-start execution, vmap fleets, mesh sharding."""

from .executor import run_jobs
from .mesh import (
    batch_sharding,
    make_mesh,
    num_local_qubits,
    replicated,
    shard_batch,
    shard_state,
    state_sharding,
)
from .multistart import (
    MultistartResult,
    multistart_minimize,
    random_initial_thetas,
)
