"""Fully-jitted L-BFGS / Adam loops for pure-JAX objectives.

The reference runs SciPy's Fortran L-BFGS-B with Python objective callbacks —
every iteration round-trips host<->device.  This module runs the ENTIRE
optimization as one XLA program: ``optax.lbfgs`` (with zoom linesearch) inside
``lax.while_loop``, with the reference's stopping conditions
(fobj threshold, fidelity threshold, no-improvement window — cf.
``optimizer.py:228-336``) expressed as carry flags.  Best-so-far (fobj, Θ)
snapshots are part of the carry, so early termination keeps the reference's
"best result survives" semantics.

``vmap`` over the carry gives batched multi-start optimization — the
TPU-native replacement of the reference's joblib process fan-out
(``job_executor.py:96-161``); see parallel/multistart.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class JitMinimizeResult(NamedTuple):
    thetas: jax.Array  # best parameters found
    fobj: jax.Array  # best objective value
    num_iters: jax.Array  # iterations actually executed
    converged: jax.Array  # True if a stop condition fired before maxiter
    last_thetas: jax.Array  # final iterate (not necessarily the best)


def minimize_lbfgs(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    *,
    maxiter: int,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
    grad_tol: float = 0.0,
    memory_size: int = 10,
) -> JitMinimizeResult:
    """Minimizes a scalar pure-JAX function with on-device L-BFGS.

    Args:
        fun: pure function Θ -> scalar objective (must be jit-traceable).
        x0: initial parameters.
        maxiter: maximum number of L-BFGS iterations.
        fobj_thr: stop once fobj < fobj_thr (reference SmallObjectiveStopper).
        no_improve_iters: stop after this many non-improving iterations
            (reference NotImproveStopper semantics).
        grad_tol: stop once ||grad||_inf <= grad_tol (0 disables).
        memory_size: L-BFGS history length (reference lbfgs_maxcor).
    """
    solver = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20),
    )
    value_and_grad = optax.value_and_grad_from_state(fun)

    fobj_thr_v = -jnp.inf if fobj_thr is None else fobj_thr
    no_imp = maxiter + 1 if no_improve_iters is None else int(no_improve_iters)

    def cond(carry):
        _, _, it, stop, *_ = carry
        return jnp.logical_and(it < maxiter, jnp.logical_not(stop))

    def body(carry):
        params, state, it, _, best_f, best_x, since_best = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = solver.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        params = optax.apply_updates(params, updates)
        new_value = optax.tree.get(state, "value")

        improved = new_value < best_f
        best_f = jnp.where(improved, new_value, best_f)
        best_x = jnp.where(improved, params, best_x)
        since_best = jnp.where(improved, 0, since_best + 1)

        stop = jnp.logical_or(
            new_value < fobj_thr_v,
            jnp.logical_or(
                since_best > no_imp,
                jnp.logical_and(
                    grad_tol > 0, jnp.max(jnp.abs(grad)) <= grad_tol
                ),
            ),
        )
        return params, state, it + 1, stop, best_f, best_x, since_best

    x0 = jnp.asarray(x0)
    state0 = solver.init(x0)
    f0 = fun(x0)
    carry = (x0, state0, jnp.asarray(0), jnp.asarray(False), f0, x0, jnp.asarray(0))
    params, _, it, stop, best_f, best_x, _ = jax.lax.while_loop(cond, body, carry)
    return JitMinimizeResult(best_x, best_f, it, stop, params)


def minimize_adam(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    *,
    maxiter: int,
    learn_rate: float = 0.1,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
) -> JitMinimizeResult:
    """On-device Adam loop with the same stopping semantics."""
    solver = optax.adam(learning_rate=learn_rate)
    vg = jax.value_and_grad(fun)
    fobj_thr_v = -jnp.inf if fobj_thr is None else fobj_thr
    no_imp = maxiter + 1 if no_improve_iters is None else int(no_improve_iters)

    def cond(carry):
        _, _, it, stop, *_ = carry
        return jnp.logical_and(it < maxiter, jnp.logical_not(stop))

    def body(carry):
        params, state, it, _, best_f, best_x, since_best = carry
        value, grad = vg(params)
        updates, state = solver.update(grad, state, params)
        params = optax.apply_updates(params, updates)

        improved = value < best_f
        best_f = jnp.where(improved, value, best_f)
        best_x = jnp.where(improved, params, best_x)
        since_best = jnp.where(improved, 0, since_best + 1)
        stop = jnp.logical_or(value < fobj_thr_v, since_best > no_imp)
        return params, state, it + 1, stop, best_f, best_x, since_best

    x0 = jnp.asarray(x0)
    carry = (
        x0,
        solver.init(x0),
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, x0.dtype),
        x0,
        jnp.asarray(0),
    )
    params, _, it, stop, best_f, best_x, _ = jax.lax.while_loop(cond, body, carry)
    return JitMinimizeResult(best_x, best_f, it, stop, params)
