"""Worker process for the two-process jax.distributed smoke test
(tests/test_distributed.py).  Run as:  python _dist_worker.py <port> <pid>."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from aqc_research_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    initialize_distributed,
    is_multiprocess,
    process_info,
)


def main(port: str, pid: int) -> None:
    engaged = initialize_distributed(f"127.0.0.1:{port}", 2, pid)
    assert engaged
    idx, count = process_info()
    assert count == 2 and idx == pid, (idx, count, pid)
    assert is_multiprocess()

    # Global mesh across both processes: 2 local devices each -> 4 total.
    mesh = global_mesh((4,), ("dp",))
    assert mesh.devices.shape == (4,)
    sh = NamedSharding(mesh, P("dp"))

    # A dp-sharded global array assembled from process-local shards, reduced
    # globally by one jitted program: the distributed-runtime round trip.
    local = np.arange(idx * 2, idx * 2 + 2, dtype=np.float32)
    garr = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    val = float(jax.device_get(total))
    assert val == 6.0, val
    print(f"proc {idx} OK total={val}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
