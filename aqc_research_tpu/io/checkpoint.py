"""Checkpoint / resume of optimization state.

TPU-native upgrade of the reference's pickle-everything persistence
(SURVEY.md §5: target caches + per-stage result pickles, but NO
mid-optimization checkpointing).  Here the full optimization state —
(Θ, best-so-far, horizon index, PRNG key, optimizer bookkeeping) — round
trips through ``.npz`` archives; large MPS states ride along as named arrays.
Orbax is used for pytree checkpoints when available, with the npz path as
the portable fallback.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..ops.mps import MPS
from ..utils import create_logger

_logger = create_logger(__file__)


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    """Saves a flat dict of arrays / scalars / MPS states to ``<path>.npz``.

    Scalars and strings go into a JSON side-channel entry; MPS states are
    stored as ``<key>.gammas`` / ``<key>.lambdas`` pairs.
    """
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    for key, val in state.items():
        assert "." not in key, f"checkpoint keys must not contain '.': {key}"
        if isinstance(val, MPS):
            arrays[f"{key}.gammas"] = np.asarray(val.gammas)
            arrays[f"{key}.lambdas"] = np.asarray(val.lambdas)
            meta[key] = "__mps__"
        elif isinstance(val, (np.ndarray,)) or hasattr(val, "shape"):
            arrays[key] = np.asarray(val)
        else:
            meta[key] = val
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    path = path if path.endswith(".npz") else path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)  # atomic
    _logger.info("checkpoint saved: %s", path)
    return path


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    """Loads a checkpoint saved by :func:`save_checkpoint`; None if absent."""
    from ..utils import as_device

    path = path if path.endswith(".npz") else path + ".npz"
    if not os.path.isfile(path):
        return None
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
        state: Dict[str, Any] = dict(meta)
        for key in data.files:
            if key == "__meta__" or "." in key:
                continue
            state[key] = data[key]
        for key, val in meta.items():
            if val == "__mps__":
                # Complex host->device must go through as_device/from_host:
                # eager jnp.asarray on complex NumPy arrays produces
                # lazily-invalid buffers on the axon TPU runtime.
                state[key] = MPS(
                    as_device(data[f"{key}.gammas"]),
                    as_device(data[f"{key}.lambdas"]),
                )
    _logger.info("checkpoint loaded: %s", path)
    return state


def save_pytree(path: str, tree: Any) -> str:
    """Orbax checkpoint of an arbitrary pytree (optimizer states etc.)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, tree, force=True)
    checkpointer.wait_until_finished()
    return path


def load_pytree(path: str, like: Any) -> Any:
    """Restores an Orbax checkpoint with ``like`` as the structure template."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path), target=like)
