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


def minimize_lbfgs_compact(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    *,
    maxiter: int,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
    memory_size: int = 10,
    max_backtracks: int = 20,
    c1: float = 1e-4,
    value_and_grad_fn: Optional[Callable] = None,
    batch_linesearch: Optional[int] = None,
    fuse_linesearch_grad: bool = False,
) -> JitMinimizeResult:
    """Compact jitted L-BFGS: two-loop recursion + Armijo backtracking.

    Functionally a lighter sibling of :func:`minimize_lbfgs` (optax + zoom
    linesearch).  The zoom machinery compiles to a large nest of while loops
    that some TPU toolchains (remote-compile AOT) take tens of minutes to
    compile; this variant keeps the program small — one fori over the
    history, one fori over backtracking steps — at the cost of a slightly
    weaker linesearch.  Same stopping semantics and best-so-far carry.

    ``value_and_grad_fn`` overrides autodiff with an explicit
    (value, gradient) function — e.g. the analytic MPS co-sweep, where
    differentiating through truncated SVDs is ill-conditioned.

    ``batch_linesearch``: evaluate a geometric grid of K Armijo trial steps
    in ONE batched call instead of sequential backtracking — the fleet mode
    (see :func:`minimize_lbfgs_compact_stateful`).
    """
    vgrad = (
        jax.value_and_grad(fun) if value_and_grad_fn is None else value_and_grad_fn
    )
    res, _ = minimize_lbfgs_compact_stateful(
        lambda x, st: (fun(x), st),
        lambda x, st: vgrad(x) + (st,),
        x0,
        (),
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
        memory_size=memory_size,
        max_backtracks=max_backtracks,
        c1=c1,
        batch_linesearch=batch_linesearch,
        fuse_linesearch_grad=fuse_linesearch_grad,
    )
    return res


def minimize_lbfgs_compact_stateful(
    value_fn: Callable,
    value_and_grad_fn: Callable,
    x0: jax.Array,
    obj_state0,
    *,
    maxiter: int,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
    memory_size: int = 10,
    max_backtracks: int = 20,
    c1: float = 1e-4,
    stop_fn: Optional[Callable] = None,
    batch_linesearch: Optional[int] = None,
    fuse_linesearch_grad: bool = False,
):
    """Compact jitted L-BFGS threading an objective-state pytree through
    every evaluation — the functional form of the reference's STATEFUL
    objectives (hysteresis / EMA bookkeeping in
    ``objective_lhs_sur_max.py:110-117,185-186``).

    Args:
        value_fn: ``(x, obj_state) -> (f, obj_state')`` — one objective
            evaluation; mutations here mirror the reference ``objective()``
            (e.g. max-projection hysteresis).  Called at linesearch trials.
        value_and_grad_fn: ``(x, obj_state) -> (f, g, obj_state')`` — a
            fused objective+gradient evaluation; mutations here additionally
            mirror the reference ``gradient()`` (e.g. the weight EMA).
        obj_state0: initial objective-state pytree (arrays only).
        stop_fn: optional ``obj_state -> bool`` extra stop condition,
            checked after each accepted step (e.g. fidelity threshold).
        batch_linesearch: when set to K, the Armijo linesearch evaluates the
            WHOLE geometric step grid (1, 1/2, ..., 2^-(K-1)) in ONE batched
            ``value_fn`` call and takes the largest passing step.  This is
            the FLEET mode: under ``vmap`` the sequential backtrack runs in
            lock-step — every lane pays the max trial count across lanes,
            each trial a separate batched dispatch phase (the measured cause
            of the round-1/2 multi-start amortization gap, RESULTS.md) —
            whereas one batched K-grid eval costs a single phase.  State
            semantics: the objective state ticks ONCE per linesearch (with
            the accepted trial's state) instead of once per trial; exact for
            stateless objectives (``obj_state = ()``).
        fuse_linesearch_grad: with ``batch_linesearch``, evaluate
            value_and_grad at every grid step in the ONE batched call and
            reuse the selected trial's gradient as the next iterate's —
            one evaluation phase per iteration instead of two, at k x the
            gradient flops.  State ticks once per iteration via
            ``value_and_grad_fn`` only (the reference's fused
            ``objective_and_gradient`` policy, sk_core.py:167).

    Returns:
        (JitMinimizeResult, final objective state).
    """
    init, cond, body, extract = _compact_lbfgs_machinery(
        value_fn,
        value_and_grad_fn,
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
        memory_size=memory_size,
        max_backtracks=max_backtracks,
        c1=c1,
        stop_fn=stop_fn,
        batch_linesearch=batch_linesearch,
        fuse_linesearch_grad=fuse_linesearch_grad,
    )
    carry = init(x0, obj_state0, maxiter)
    return extract(jax.lax.while_loop(cond, body, carry))


def _compact_lbfgs_machinery(
    value_fn: Callable,
    value_and_grad_fn: Callable,
    *,
    maxiter: int,
    fobj_thr: Optional[float] = None,
    no_improve_iters: Optional[int] = None,
    memory_size: int = 10,
    max_backtracks: int = 20,
    c1: float = 1e-4,
    stop_fn: Optional[Callable] = None,
    batch_linesearch: Optional[int] = None,
    fuse_linesearch_grad: bool = False,
):
    """Builds the compact-L-BFGS loop pieces: ``(init, cond, body, extract)``.

    The carry's LAST element is a traced iteration LIMIT — ``cond`` stops at
    ``it >= limit`` — so a host-side driver can run the loop in CHUNKS of K
    iterations per dispatch (replace the limit, re-enter the while_loop) and
    check the wall clock between chunks.  That is how the on-device path
    honors the reference's ``time_limit`` stopper contract
    (``/root/reference/aqc_research/optimizer.py:36-62``) without leaving XLA:
    one compiled chunk program, re-dispatched with a moving limit.
    ``init(x0, obj_state0, limit) -> carry``; ``extract(carry) ->
    (JitMinimizeResult, obj_state)``.
    """
    m = int(memory_size)
    vgrad = value_and_grad_fn
    fobj_thr_v = -jnp.inf if fobj_thr is None else fobj_thr
    no_imp = maxiter + 1 if no_improve_iters is None else int(no_improve_iters)

    def two_loop(grad, s_hist, y_hist, rho_hist, hist_len):
        """Two-loop recursion: H . grad with the stored (s, y) pairs."""
        def bwd(i, carry):
            q, alphas = carry
            idx = jnp.mod(hist_len - 1 - i, m)
            valid = i < hist_len
            alpha = jnp.where(valid, rho_hist[idx] * jnp.dot(s_hist[idx], q), 0.0)
            q = q - alpha * y_hist[idx] * jnp.where(valid, 1.0, 0.0)
            return q, alphas.at[idx].set(alpha)

        q, alphas = jax.lax.fori_loop(
            0, m, bwd, (grad, jnp.zeros((m,), grad.dtype))
        )
        # Initial Hessian scale gamma = s.y / y.y of the newest pair.
        newest = jnp.mod(hist_len - 1, m)
        ys = jnp.dot(s_hist[newest], y_hist[newest])
        yy = jnp.dot(y_hist[newest], y_hist[newest])
        gamma = jnp.where(
            jnp.logical_and(hist_len > 0, yy > 0), ys / jnp.maximum(yy, 1e-30), 1.0
        )
        r = gamma * q

        def fwd(i, r_):
            idx = jnp.mod(hist_len - m + i, m)
            valid = i >= (m - hist_len)
            beta = jnp.where(valid, rho_hist[idx] * jnp.dot(y_hist[idx], r_), 0.0)
            return r_ + (alphas[idx] - beta) * s_hist[idx] * jnp.where(valid, 1.0, 0.0)

        return jax.lax.fori_loop(0, m, fwd, r)

    def backtrack(x, f, grad, direction, ost):
        """Armijo backtracking along ``direction`` (a descent direction)."""
        slope = jnp.dot(grad, direction)

        def eval_at(step, ost):
            f_new, ost = value_fn(x + step * direction, ost)
            ok = f_new <= f + c1 * step * slope
            return f_new, ok, ost

        def bt_cond(carry):
            _step, _f, ok, it, _ost = carry
            return jnp.logical_and(jnp.logical_not(ok), it < max_backtracks)

        def bt_body(carry):
            step, _f, _ok, it, ost = carry
            new_step = step * 0.5
            f_new, ok, ost = eval_at(new_step, ost)
            return new_step, f_new, ok, it + 1, ost

        one = jnp.asarray(1.0, x.dtype)
        f1, ok1, ost = eval_at(one, ost)
        step, f_new, ok, _, ost = jax.lax.while_loop(
            bt_cond, bt_body, (one, f1, ok1, jnp.asarray(0), ost)
        )
        return step, f_new, ok, ost

    def backtrack_batched(x, f, grad, direction, ost):
        """Fleet-mode Armijo: ONE batched eval of the whole step grid."""
        k = int(batch_linesearch)
        slope = jnp.dot(grad, direction)
        steps = (2.0 ** -jnp.arange(k)).astype(x.dtype)
        f_news, osts = jax.vmap(
            lambda s: value_fn(x + s * direction, ost)
        )(steps)
        ok_vec = f_news <= f + c1 * steps * slope
        any_ok = jnp.any(ok_vec)
        # First (largest) passing step; if NONE passes, take the SMALLEST
        # grid step (matches the sequential backtracker, which ends at the
        # smallest tried step) so the carry/stop_fn never observe a rejected
        # full-step iterate.
        idx = jnp.where(any_ok, jnp.argmax(ok_vec), k - 1)
        step = steps[idx]
        f_new = f_news[idx]
        ost = jax.tree_util.tree_map(lambda a: a[idx], osts)
        return step, f_new, any_ok, ost

    def backtrack_batched_fused(x, f, grad, direction, ost):
        """Fleet-mode Armijo with the GRADIENT fused into the grid eval:
        one batched value_and_grad call covers the whole step grid, and the
        selected trial's gradient is reused as the next iterate's gradient
        — the iteration has ONE evaluation phase instead of two (grid
        values + separate grad at the accepted point).  Trades k*grad
        flops for the removed phase; wins when the fleet is
        serialization-bound, not flops-bound (measure, don't assume)."""
        k = int(batch_linesearch)
        slope = jnp.dot(grad, direction)
        steps = (2.0 ** -jnp.arange(k)).astype(x.dtype)
        f_news, g_news, osts = jax.vmap(
            lambda s: vgrad(x + s * direction, ost)
        )(steps)
        ok_vec = f_news <= f + c1 * steps * slope
        any_ok = jnp.any(ok_vec)
        # See backtrack_batched: fall back to the smallest grid step, never
        # the rejected full step.
        idx = jnp.where(any_ok, jnp.argmax(ok_vec), k - 1)
        step = steps[idx]
        ost = jax.tree_util.tree_map(lambda a: a[idx], osts)
        return step, f_news[idx], g_news[idx], any_ok, ost

    def cond(carry):
        it, stop, limit = carry[0], carry[1], carry[-1]
        return jnp.logical_and(it < limit, jnp.logical_not(stop))

    def body(carry):
        (it, _, x, f, grad, s_hist, y_hist, rho_hist, hist_len,
         best_f, best_x, since_best, ost, limit) = carry
        direction = -two_loop(grad, s_hist, y_hist, rho_hist, hist_len)
        # Fall back to steepest descent when the direction is not descent.
        descent = jnp.dot(grad, direction) < 0
        direction = jnp.where(descent, direction, -grad)

        if batch_linesearch is not None and fuse_linesearch_grad:
            step, f_new, g_new, ok, ost = backtrack_batched_fused(
                x, f, grad, direction, ost
            )
            x_new = x + step * direction
        else:
            linesearch = (
                backtrack if batch_linesearch is None else backtrack_batched
            )
            step, f_new, ok, ost = linesearch(x, f, grad, direction, ost)
            x_new = x + step * direction
            _, g_new, ost = vgrad(x_new, ost)

        s = x_new - x
        y = g_new - grad
        sy = jnp.dot(s, y)
        slot = jnp.mod(hist_len, m)
        accept = sy > 1e-10
        s_hist = jnp.where(accept, s_hist.at[slot].set(s), s_hist)
        y_hist = jnp.where(accept, y_hist.at[slot].set(y), y_hist)
        rho_hist = jnp.where(
            accept, rho_hist.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), rho_hist
        )
        hist_len = jnp.where(accept, hist_len + 1, hist_len)

        improved = f_new < best_f
        best_f = jnp.where(improved, f_new, best_f)
        best_x = jnp.where(improved, x_new, best_x)
        since_best = jnp.where(improved, 0, since_best + 1)
        stop = jnp.logical_or(
            f_new < fobj_thr_v,
            jnp.logical_or(since_best > no_imp, jnp.logical_not(ok)),
        )
        if stop_fn is not None:
            stop = jnp.logical_or(stop, stop_fn(ost))
        return (it + 1, stop, x_new, f_new, g_new, s_hist, y_hist, rho_hist,
                hist_len, best_f, best_x, since_best, ost, limit)

    def init(x0, obj_state0, limit):
        x0 = jnp.asarray(x0)
        n = x0.shape[0]
        dtype = x0.dtype
        f0, g0, ost0 = vgrad(x0, obj_state0)
        stop0 = f0 < fobj_thr_v
        if stop_fn is not None:
            stop0 = jnp.logical_or(stop0, stop_fn(ost0))
        return (
            jnp.asarray(0),
            stop0,
            x0,
            f0,
            g0,
            jnp.zeros((m, n), dtype),
            jnp.zeros((m, n), dtype),
            jnp.zeros((m,), dtype),
            jnp.asarray(0),
            f0,
            x0,
            jnp.asarray(0),
            ost0,
            jnp.asarray(limit),
        )

    def extract(carry):
        (it, stop, x_last, _, _, _, _, _, _, best_f, best_x, _, ost, _) = carry
        return JitMinimizeResult(best_x, best_f, it, stop, x_last), ost

    return init, cond, body, extract


def lbfgs_chunk_programs(
    value_fn: Callable,
    value_and_grad_fn: Callable,
    **opts,
):
    """Jitted (init, chunk, extract) programs for time-limited L-BFGS.

    ``value_fn(x, obj_state, *args)`` / ``value_and_grad_fn(x, obj_state,
    *args)`` take the objective's data (e.g. the target state) as EXPLICIT
    trailing arguments — the programs thread them through as traced inputs,
    so no device-resident array is ever closed over (the lazily-invalid
    complex-closure trap, CLAUDE.md).  ``opts`` are the
    :func:`minimize_lbfgs_compact_stateful` options (maxiter, fobj_thr, ...).

    Returns:
        ``init(x0, obj_state0, *args) -> carry`` (jitted),
        ``chunk(carry, limit, *args) -> carry`` (jitted; runs the loop until
        ``it >= limit`` or a stop condition fires),
        ``extract(carry) -> (JitMinimizeResult, obj_state)`` (host-side).

    Cache the returned triple per static configuration (the callers in
    ``models/sp_lhs/jit_asp.py`` use ``lru_cache``): each triple compiles to
    exactly two XLA programs reused across every chunk and every horizon.
    """

    def _machinery(args):
        return _compact_lbfgs_machinery(
            lambda x, st: value_fn(x, st, *args),
            lambda x, st: value_and_grad_fn(x, st, *args),
            **opts,
        )

    def init_impl(x0, ost0, *args):
        init, _, _, _ = _machinery(args)
        return init(x0, ost0, 0)

    def chunk_impl(carry, limit, *args):
        _, cond, body, _ = _machinery(args)
        carry = carry[:-1] + (jnp.asarray(limit),)
        return jax.lax.while_loop(cond, body, carry)

    def extract(carry):
        _, _, _, ex = _machinery(())
        return ex(carry)

    return jax.jit(init_impl), jax.jit(chunk_impl), extract


def run_lbfgs_chunked(
    programs,
    x0,
    obj_state0,
    args: tuple,
    *,
    maxiter: int,
    time_limit: Optional[float] = None,
    chunk_iters: int = 25,
):
    """Host-chunked driver over :func:`lbfgs_chunk_programs`.

    Runs K = ``chunk_iters`` L-BFGS iterations per dispatch and checks the
    wall clock between chunks — the on-device analogue of the reference's
    host-loop ``TimeoutChecker`` (optimizer.py:36-62): near-single-program
    throughput (one device->host sync of two scalars per chunk, ~60 ms
    through the remote tunnel) while honoring ``time_limit``.

    Returns ``(JitMinimizeResult, obj_state, timed_out)``.  ``time_limit``
    of ``None`` or <= 0 disables the clock (pure chunked execution).
    """
    import time as _time

    import numpy as np

    init_j, chunk_j, extract = programs
    deadline = (
        None
        if time_limit is None or time_limit <= 0
        else _time.perf_counter() + float(time_limit)
    )
    carry = init_j(x0, obj_state0, *args)
    it, timed_out = 0, False
    while it < maxiter:
        nxt = min(it + int(chunk_iters), int(maxiter))
        carry = chunk_j(carry, nxt, *args)
        it = int(np.asarray(carry[0]))
        if bool(np.asarray(carry[1])):  # a stop condition fired on device
            break
        if deadline is not None and _time.perf_counter() >= deadline:
            timed_out = it < maxiter
            break
    res, ost = extract(carry)
    return res, ost, timed_out


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
