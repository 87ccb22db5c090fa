"""Device-mesh utilities and sharded-statevector support.

The reference has NO distributed design (joblib shares nothing,
SURVEY.md §2.4); this module is the scaling layer built for TPU hardware:

* ``make_mesh`` — named meshes over the available devices
  (``dp`` = data-parallel multi-start batch, ``tp`` = tensor-parallel
  statevector sharding).
* Sharded statevector: a ``2^n`` state sharded over its single axis puts the
  TOP ``log2(T)`` qubits on the mesh.  Gates on local (low) qubits partition
  cleanly; gates touching sharded qubits make XLA's SPMD partitioner insert
  the all-to-all / collective-permute over ICI — the scaling-book recipe:
  annotate shardings, jit the whole step, let XLA place collectives.

The driver's multi-chip dry run (``__graft_entry__.dryrun_multichip``) builds
a (dp, tp) mesh, shards a multi-start ASP training step over it, and executes
one step — validating that the sharded program compiles and runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("dp", "tp"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Creates a named mesh over ``prod(axis_sizes)`` devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    total = int(np.prod(axis_sizes))
    assert total <= len(devices), (total, len(devices))
    arr = np.asarray(devices[:total]).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names[: len(axis_sizes)]))


def shard_state(state: jax.Array, mesh: Mesh, axis: str = "tp") -> jax.Array:
    """Shards a dense state vector over its (single / last) axis."""
    spec = P(*([None] * (state.ndim - 1) + [axis]))
    return jax.device_put(state, NamedSharding(mesh, spec))


def shard_batch(batch: jax.Array, mesh: Mesh, axis: str = "dp") -> jax.Array:
    """Shards the leading (multi-start) axis of a batch."""
    spec = P(*([axis] + [None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def state_sharding(mesh: Mesh, axis: str = "tp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_local_qubits(num_qubits: int, tp_size: int) -> Tuple[int, int]:
    """Splits qubits into (local, sharded): the top log2(tp) qubits live on
    the mesh axis."""
    k = int(np.log2(tp_size))
    assert 2**k == tp_size, "tp axis size must be a power of 2"
    assert k < num_qubits
    return num_qubits - k, k
