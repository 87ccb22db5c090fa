"""Multi-host / multi-slice distributed runtime skeleton.

The reference has NO distributed communication backend — joblib processes
share nothing (`/root/reference/aqc_research/job_executor.py:141-143`).  The
TPU-native equivalent (SURVEY.md §2.4 "Distributed comm backend") is
`jax.distributed` + XLA collectives: every process joins one JAX runtime,
sees the global device set, and jitted programs communicate over ICI within
a slice and DCN across slices.  This module is that skeleton:

* :func:`initialize_distributed` — guarded `jax.distributed.initialize`;
  engages only when a coordinator is configured (args or env), so
  single-process runs are completely unaffected.
* :func:`global_mesh` — DCN-aware mesh over ALL devices: when several TPU
  slices are present, the designated axis (default ``dp`` — multi-start /
  data parallel, the only cross-slice traffic this workload needs) maps to
  DCN and the remaining axes ride ICI, via
  ``mesh_utils.create_hybrid_device_mesh``.
* small topology helpers for drivers (process count/index, local devices).

Layout guidance (scaling-book recipe): keep tensor-parallel state sharding
(``tp``) inside a slice; put only embarrassingly-parallel axes (multi-start
``dp``) across DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_COORD_ENVS = ("AQC_TPU_COORDINATOR", "JAX_COORDINATOR_ADDRESS")


def _env_int(*names: str) -> Optional[int]:
    for name in names:
        val = os.environ.get(name)
        if val:
            return int(val)
    return None


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Joins the multi-process JAX runtime when a coordinator is configured.

    Resolution order: explicit arguments, then ``AQC_TPU_COORDINATOR`` /
    ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) environment variables, then TPU-pod auto-detection
    (``jax.distributed.initialize()`` with no arguments, which reads the
    cloud metadata — only attempted when ``AQC_TPU_AUTO_DIST=1``).

    Returns True when the distributed runtime is (already) engaged, False
    for ordinary single-process runs.  Safe to call more than once.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return True  # already initialized

    coord = coordinator_address or next(
        (os.environ[e] for e in _COORD_ENVS if os.environ.get(e)), None
    )
    if coord is not None:
        nproc = (
            num_processes
            if num_processes is not None
            else _env_int("JAX_NUM_PROCESSES", "AQC_TPU_NUM_PROCESSES")
        )
        pid = (
            process_id
            if process_id is not None
            else _env_int("JAX_PROCESS_ID", "AQC_TPU_PROCESS_ID")
        )
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        return True
    if os.environ.get("AQC_TPU_AUTO_DIST") == "1":
        # TPU pod / multi-slice metadata auto-detection.
        jax.distributed.initialize()
        return True
    return False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_info() -> Tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def _num_slices(devices) -> int:
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    return max(len(slice_ids), 1)


def global_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    *,
    dcn_axis: str = "dp",
) -> Mesh:
    """Named mesh over ALL devices (all processes, all slices).

    * one slice (or CPU/virtual devices): ``mesh_utils.create_device_mesh``
      for ICI-aware ordering, plain reshape as fallback;
    * multiple slices: ``mesh_utils.create_hybrid_device_mesh`` with the
      ``dcn_axis`` spanning slices (its size must be a multiple of the
      slice count) and every other axis inside a slice.

    ``axis_sizes`` defaults to putting ALL devices on the first axis.
    """
    from jax.experimental import mesh_utils

    devices = jax.devices()
    total = len(devices)
    if axis_sizes is None:
        axis_sizes = (total,) + (1,) * (len(axis_names) - 1)
    axis_sizes = tuple(int(s) for s in axis_sizes)
    assert int(np.prod(axis_sizes)) == total, (axis_sizes, total)
    names = tuple(axis_names[: len(axis_sizes)])

    n_slices = _num_slices(devices)
    if n_slices > 1:
        di = names.index(dcn_axis)
        assert axis_sizes[di] % n_slices == 0, (
            f"dcn axis {dcn_axis}={axis_sizes[di]} must be a multiple of the "
            f"slice count {n_slices}"
        )
        dcn_sizes = tuple(
            n_slices if i == di else 1 for i in range(len(axis_sizes))
        )
        per_slice = tuple(
            s // (n_slices if i == di else 1) for i, s in enumerate(axis_sizes)
        )
        arr = mesh_utils.create_hybrid_device_mesh(
            per_slice, dcn_sizes, devices=devices
        )
        return Mesh(arr, names)
    try:
        arr = mesh_utils.create_device_mesh(axis_sizes, devices=devices)
    except Exception:  # virtual/CPU devices: plain ordering
        arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, names)
