"""Batched multi-start optimization: vmap / shard_map over initial points.

The TPU-native replacement of the reference's joblib process fan-out
(``/root/reference/aqc_research/job_executor.py:96-161``): a batch of B
initial Θ vectors is optimized simultaneously — ``vmap`` turns the whole
jitted L-BFGS loop into one batched XLA program (one compilation, B
optimizations in lock-step on one chip), and a data-parallel mesh axis shards
the batch across chips.

Per-start PRNG: ``jax.random.split`` of a base key replaces the reference's
``seed + 7 * (job_index + 1)`` convention (job_executor.py:64).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..optim.lbfgs import JitMinimizeResult, minimize_adam, minimize_lbfgs
from ..utils import rand_thetas_key


class MultistartResult(NamedTuple):
    thetas: jax.Array  # (B, P) best parameters per start
    fobj: jax.Array  # (B,) best objective values
    num_iters: jax.Array  # (B,)
    best_index: jax.Array  # argmin of fobj


def random_initial_thetas(key: jax.Array, num_starts: int, num_thetas: int):
    """B random Θ0 vectors in (-pi, pi) from per-start PRNG keys."""
    keys = jax.random.split(key, num_starts)
    return jax.vmap(lambda k: rand_thetas_key(k, num_thetas))(keys)


def multistart_minimize(
    fun: Callable[[jax.Array], jax.Array],
    thetas_batch: jax.Array,
    *,
    method: str = "lbfgs",
    maxiter: int = 100,
    learn_rate: float = 0.1,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "dp",
) -> MultistartResult:
    """Optimizes ``fun`` from every row of ``thetas_batch`` simultaneously.

    Args:
        fun: pure scalar objective Θ -> fobj (jit-traceable).
        thetas_batch: (B, P) initial points.
        method: "lbfgs" or "adam".
        mesh: optional device mesh; when given, the batch axis is sharded over
            ``mesh[batch_axis]`` (data-parallel multi-start across chips).
    """
    if method == "lbfgs":
        single = partial(
            minimize_lbfgs,
            fun,
            maxiter=maxiter,
            fobj_thr=fobj_thr,
            no_improve_iters=no_improve_iters,
        )
    elif method == "adam":
        single = partial(
            minimize_adam,
            fun,
            maxiter=maxiter,
            learn_rate=learn_rate,
            fobj_thr=fobj_thr,
            no_improve_iters=no_improve_iters,
        )
    else:
        raise ValueError(f"unknown method: {method}")

    batched = jax.vmap(lambda x0: single(x0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(batch_axis))
        thetas_batch = jax.device_put(thetas_batch, sharding)
        batched = jax.jit(batched, in_shardings=sharding)

    res: JitMinimizeResult = batched(jnp.asarray(thetas_batch))
    best = jnp.argmin(res.fobj)
    return MultistartResult(res.thetas, res.fobj, res.num_iters, best)
