"""Profiling helpers: jax.profiler traces + device-aware timers.

The reference's only profiling facility is the accumulating ``MyTimer``
(utils.py:150-231, SURVEY.md §5).  On TPU that is insufficient — dispatch
returns before the device finishes — so this module adds:

* :func:`trace` — context manager writing a jax.profiler trace viewable in
  TensorBoard / Perfetto,
* :func:`device_timer` — wall-clock timing with ``block_until_ready`` on a
  result pytree,
* :func:`time_jitted` — steady-state timing of a jitted callable
  (warm-up + repeats).
"""

from __future__ import annotations

import contextlib
from time import perf_counter
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/jax-trace"): ...`` — records a profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(tree: Any) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


@contextlib.contextmanager
def device_timer(label: str, results: dict):
    """Times a block and blocks on ``results['out']`` (set inside the block)."""
    tic = perf_counter()
    try:
        yield results
    finally:
        _block(results.get("out"))
        results[label] = perf_counter() - tic


def time_jitted(
    fn: Callable, *args, repeats: int = 10, warmup: int = 1
) -> Tuple[float, Any]:
    """Returns (seconds per call in steady state, last result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _block(out)
    tic = perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _block(out)
    return (perf_counter() - tic) / repeats, out
