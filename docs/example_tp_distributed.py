"""Example: tensor-parallel statevector + multi-host mesh construction.

The reference has no distributed design (joblib fan-out only); this
framework scales two ways:

1. **TP-sharded statevector** (`parallel/statevector_tp.py`): the 2^n state
   is sharded across the mesh's `tp` axis; gates on sharded qubits exchange
   shard-halves with explicit `ppermute` collectives (zero all-gathers —
   the compiled HLO profile is pinned by tests/test_parallel.py).
2. **Multi-host runtime** (`parallel/distributed.py`): every process joins
   one JAX runtime via `jax.distributed`; `global_mesh` lays axes out
   DCN-aware (multi-start `dp` across slices, `tp` inside a slice).

Run (8 virtual CPU devices — no TPU pod required):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python docs/example_tp_distributed.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from aqc_research_tpu.config import set_precision

set_precision("high")

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.statevector import v_mul_vec
from aqc_research_tpu.parallel.distributed import global_mesh, initialize_distributed
from aqc_research_tpu.parallel.statevector_tp import v_mul_vec_tp
from aqc_research_tpu.utils import rand_state, rand_thetas


def main() -> None:
    # Multi-host init: engages only when a coordinator is configured
    # (AQC_TPU_COORDINATOR / JAX_COORDINATOR_ADDRESS); single-process
    # runs are untouched.
    engaged = initialize_distributed()
    print(f"distributed runtime engaged: {engaged} "
          f"(process {jax.process_index()}/{jax.process_count()})")

    # DCN-aware mesh: on multi-slice hardware the dp axis spans slices.
    n_dev = len(jax.devices())
    mesh = global_mesh((1, n_dev), ("dp", "tp"))
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # TP-sharded circuit application: the top log2(tp) qubits index the
    # shard; parity vs the single-device engine.
    n = 10
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
    thetas = rand_thetas(circ.num_thetas)
    state = rand_state(n)

    sharded = jax.device_put(jnp.asarray(state), NamedSharding(mesh, P("tp")))
    out_tp = v_mul_vec_tp(circ, jnp.asarray(thetas), sharded, mesh)
    out_ref = v_mul_vec(circ, thetas, jnp.asarray(state))
    err = float(jnp.max(jnp.abs(out_tp - out_ref)))
    print(f"tp-sharded vs single-device parity: {err:.2e}")
    assert err < 1e-12


if __name__ == "__main__":
    main()
