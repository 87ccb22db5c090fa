"""Fully-jitted ASP optimization path (one XLA program per horizon).

The class-based objectives (sur_max.py / sur_fast_mps.py) keep the
reference's host-side optimizer protocol.  This module is the TPU-first
alternative: the surrogate loss is a pure function and the WHOLE L-BFGS
optimization of a horizon runs on device (optim/lbfgs.py), with no host
round trips — the production fast path for time-to-solution benchmarks.

Two surrogate variants live here:

* :func:`make_surrogate_loss` — the STATELESS simplification (fixed weight,
  hard argmax) used by the pure-fidelity benchmarks;
* :func:`make_surrogate_stateful` + :func:`optimize_horizon_surrogate_jit` —
  the FULL reference semantics on device: the 1.1x max-projection hysteresis
  (objective_lhs_sur_max.py:110-117) and the weight EMA
  ``w += 0.1(sqrt|fobj| - w)`` (:185-186) are two scalars carried through the
  jitted L-BFGS loop (optim/lbfgs.py minimize_lbfgs_compact_stateful).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...circuit.ansatz import Ansatz
from ...ops.gradients import grad_of_dot_product
from ...ops.statevector import v_dagger_mul_vec
from ...optim.lbfgs import (
    JitMinimizeResult,
    lbfgs_chunk_programs,
    minimize_lbfgs,
    minimize_lbfgs_compact,
    minimize_lbfgs_compact_stateful,
    run_lbfgs_chunked,
)


def flip_state_indices(
    num_qubits: int, state_prep_program=None
) -> np.ndarray:
    """Dense-basis indices of {S|0>, S X_i|0>} when S is an X-layer product
    program (identity / Neel / half-zero preps); general S requires the
    GenericStateHandler path."""
    base = 0
    if state_prep_program is not None:
        for gate in state_prep_program:
            if gate.name != "x":
                raise ValueError(
                    "flip_state_indices expects an X-layer product prep; "
                    "use GenericStateHandler for general state preps"
                )
            base ^= 1 << gate.qubits[0]
    return np.asarray([base] + [base ^ (1 << k) for k in range(num_qubits)])


def make_surrogate_loss(
    circ: Ansatz,
    state_idx: Sequence[int],
    weight: float = 0.0,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns ``loss(thetas, target)`` = the max-projection surrogate
    ``1 - (1-w)·hs2[0] - w·max_i hs2[i]`` as a pure jittable function."""
    idx = jnp.asarray(np.asarray(state_idx, dtype=np.int64))
    w = float(weight)

    def loss(thetas, target):
        vh = v_dagger_mul_vec(circ, thetas, target)
        hs2 = jnp.abs(vh[idx]) ** 2
        if w == 0.0:
            return 1.0 - hs2[0]
        return 1.0 - (1.0 - w) * hs2[0] - w * jnp.max(hs2)

    return loss


class SurrogateState(NamedTuple):
    """The host-side objective state of the reference ``sur_max``, as a jit
    carry: hysteresis-selected leading flip state + EMA weight (cf.
    objective_lhs_sur_max.py:110-117,185-186)."""

    max_no: jax.Array  # i32 — leading flip-state index
    weight: jax.Array  # EMA weight of the max-projection term
    fidelity: jax.Array  # hs2[0] at the latest evaluation
    fobj: jax.Array  # fobj at the latest evaluation


def make_surrogate_stateful(
    circ: Ansatz,
    state_idx: Sequence[int],
    gamma: float = 0.1,
):
    """Pure-functional twin of the host ``SpSurrogateObjectiveMax``: returns
    ``(value, value_and_grad)`` with signatures

        value(thetas, state, target)          -> (fobj, state')
        value_and_grad(thetas, state, target) -> (fobj, grad, state')

    reproducing the reference semantics EXACTLY (tested to 1e-6 against the
    host class in tests/test_jit_asp.py):

    * every evaluation applies the 1.1x max-projection hysteresis (the
      sequential loop of objective_lhs_sur_max.py:110-117 as a fori over
      flip states) and ticks the weight EMA ``w += gamma (sqrt|fobj| - w)``
      (:185-186) — under SciPy L-BFGS-B the reference ``objective`` and
      ``gradient`` are ALWAYS called as a pair, so both state updates fire
      at every evaluation point, including linesearch trials;
    * ``value_and_grad`` additionally evaluates the analytic co-sweep
      gradient (1 sweep when max_no == 0, 2 otherwise — lax.cond).

    ``state_idx`` are the dense-basis indices of the flip states (X-layer
    product preps — :func:`flip_state_indices`).
    """
    idx_np = np.asarray(state_idx, dtype=np.int64)
    num_states = int(idx_np.size)
    dim = 2**circ.num_qubits

    def _project(thetas, target, st):
        vh = v_dagger_mul_vec(circ, thetas, target)
        idx = jnp.asarray(idx_np)
        hs = vh[idx]
        hs2 = jnp.abs(hs) ** 2

        def hyst(i, carry):
            max_proj, max_no = carry
            better = 1.1 * max_proj < hs2[i]
            return (
                jnp.where(better, hs2[i], max_proj),
                jnp.where(better, i, max_no),
            )

        max_no0 = jnp.asarray(st.max_no, jnp.int32)
        _, max_no = jax.lax.fori_loop(
            0, num_states, hyst, (hs2[max_no0], max_no0)
        )
        w = st.weight
        fobj = (1.0 - (1.0 - w) * hs2[0] - w * hs2[max_no]).astype(thetas.dtype)
        return vh, hs, hs2, max_no, fobj

    def value(thetas, st, target):
        _, _, hs2, max_no, fobj = _project(thetas, target, st)
        w_new = st.weight + gamma * (jnp.sqrt(jnp.abs(fobj)) - st.weight)
        return fobj, SurrogateState(
            max_no, w_new, hs2[0].astype(thetas.dtype), fobj
        )

    def value_and_grad(thetas, st, target):
        vh, hs, hs2, max_no, fobj = _project(thetas, target, st)
        x0_state = jnp.zeros(dim, vh.dtype).at[int(idx_np[0])].set(1.0)
        grad0 = grad_of_dot_product(circ, thetas, x0_state, vh, front_layer=True)
        w = st.weight.astype(grad0.real.dtype)

        def grad_two_sweeps(_):
            idx = jnp.asarray(idx_np)
            xm = jnp.zeros(dim, vh.dtype).at[idx[max_no]].set(1.0)
            grad_m = grad_of_dot_product(circ, thetas, xm, vh, front_layer=True)
            g = -2.0 * (1.0 - w) * jnp.conj(hs[0]) * grad0
            g = g - 2.0 * w * jnp.conj(hs[max_no]) * grad_m
            return jnp.real(g)

        def grad_one_sweep(_):
            return jnp.real(-2.0 * jnp.conj(hs[0]) * grad0)

        grad = jax.lax.cond(max_no == 0, grad_one_sweep, grad_two_sweeps, None)
        w_new = st.weight + gamma * (jnp.sqrt(jnp.abs(fobj)) - st.weight)
        new_st = SurrogateState(
            max_no, w_new, hs2[0].astype(thetas.dtype), fobj
        )
        return fobj, grad.astype(thetas.dtype), new_st

    return value, value_and_grad


class JitHorizonResult(NamedTuple):
    thetas: jax.Array
    fobj: jax.Array  # best (lowest) surrogate value
    fidelity: jax.Array  # hs2[0] at the best thetas
    num_iters: jax.Array
    converged: jax.Array


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8, 9, 10))
def _optimize_horizon(
    circ: Ansatz,
    x0,
    tgt,
    state_idx_t: tuple,
    weight: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
    solver: str,
    batch_ls=None,
    fuse_ls_grad: bool = False,
) -> JitHorizonResult:
    loss = make_surrogate_loss(circ, state_idx_t, weight)
    idx0 = int(state_idx_t[0])
    if solver == "compact":
        minimize = _partial(
            minimize_lbfgs_compact,
            batch_linesearch=batch_ls,
            fuse_linesearch_grad=fuse_ls_grad,
        )
    else:
        minimize = minimize_lbfgs
    res: JitMinimizeResult = minimize(
        lambda th: loss(th, tgt),
        x0,
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
    )
    vh = v_dagger_mul_vec(circ, res.thetas, tgt)
    fid = jnp.abs(vh[idx0]) ** 2
    return JitHorizonResult(res.thetas, res.fobj, fid, res.num_iters, res.converged)


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8, 9, 10))
def _optimize_horizon_batch(
    circ: Ansatz,
    x0_batch,
    tgt,
    state_idx_t: tuple,
    weight: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
    solver: str,
    batch_ls=None,
    fuse_ls_grad: bool = False,
) -> JitHorizonResult:
    return jax.vmap(
        lambda x0: _optimize_horizon(
            circ, x0, tgt, state_idx_t, weight, fobj_thr, maxiter,
            no_improve_iters, solver, batch_ls, fuse_ls_grad,
        )
    )(x0_batch)


def optimize_horizon_multistart(
    circ: Ansatz,
    thetas0_batch,
    target,
    *,
    state_idx: Sequence[int],
    weight: float = 0.0,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
    solver: str = "compact",
    batch_linesearch: Optional[int] = 2,
    fuse_linesearch_grad: bool = False,
) -> JitHorizonResult:
    """Multi-start ASP horizon optimization: one batched XLA program runs B
    L-BFGS instances in lock-step (BASELINE.md config 4 — the vmap
    replacement of the reference's joblib fan-out).  Returns batched results;
    pick ``argmin(res.fobj)`` for the winner.

    ``batch_linesearch`` (default 2): lanes evaluate a SHORT Armijo step grid
    in ONE batched eval per iteration instead of lock-step sequential
    backtracking — the fix for the measured fleet-amortization gap.
    Measured on TPU (12q x 8 starts, 150 iters): K=2 gives 3.93x
    amortization vs 2.24x sequential, with equal converged quality; larger
    grids lose to batch-eval scaling (K=4: 3.08x, K=8: 2.05x, K=16: 1.5x).
    Failure semantics at small K: a lane whose whole grid fails Armijo
    stops with its best-so-far (the reference L-BFGS-B linesearch-failure
    behavior).  ``None`` restores sequential backtracking."""
    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    return _optimize_horizon_batch(
        circ,
        jnp.asarray(thetas0_batch),
        jnp.asarray(target),
        tuple(int(i) for i in np.asarray(state_idx)),
        float(weight),
        fobj_thr,
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
        solver,
        None if batch_linesearch is None else int(batch_linesearch),
        bool(fuse_linesearch_grad),
    )


class JitSurrogateResult(NamedTuple):
    thetas: jax.Array
    fobj: jax.Array  # best (lowest) surrogate value
    fidelity: jax.Array  # hs2[0] at the best thetas
    num_iters: jax.Array
    converged: jax.Array
    weight: jax.Array  # final EMA weight
    max_no: jax.Array  # final hysteresis-selected flip state


@_partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8))
def _optimize_horizon_surrogate(
    circ: Ansatz,
    x0,
    tgt,
    state_idx_t: tuple,
    weight0,
    gamma: float,
    fid_thr,
    maxiter: int,
    no_improve_iters,
) -> JitSurrogateResult:
    value, vgrad = make_surrogate_stateful(circ, state_idx_t, gamma)
    st0 = SurrogateState(
        jnp.asarray(0, jnp.int32),
        jnp.asarray(weight0, x0.dtype),
        jnp.asarray(0.0, x0.dtype),
        jnp.asarray(jnp.inf, x0.dtype),
    )
    stop_fn = None
    if fid_thr is not None:
        stop_fn = lambda st: st.fidelity > fid_thr  # noqa: E731
    res, st = minimize_lbfgs_compact_stateful(
        lambda x, s: value(x, s, tgt),
        lambda x, s: vgrad(x, s, tgt),
        x0,
        st0,
        maxiter=maxiter,
        no_improve_iters=no_improve_iters,
        stop_fn=stop_fn,
    )
    vh = v_dagger_mul_vec(circ, res.thetas, tgt)
    fid = jnp.abs(vh[int(state_idx_t[0])]) ** 2
    return JitSurrogateResult(
        res.thetas, res.fobj, fid, res.num_iters, res.converged,
        st.weight, st.max_no,
    )


def optimize_horizon_surrogate_jit(
    circ: Ansatz,
    thetas0,
    target,
    *,
    state_idx: Sequence[int],
    weight0: float = 1.0,  # reference initial weight (objective_base.py:704)
    gamma: float = 0.1,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
) -> JitSurrogateResult:
    """Optimizes one ASP horizon entirely on device with the FULL reference
    surrogate — max-projection hysteresis + weight EMA carried through the
    jitted L-BFGS loop (the production path of VERDICT round-1 item 2;
    reference objective_lhs_sur_max.py:82-197).

    Stops on ``fidelity > fidelity_thr`` (the EarlyStopper semantics — with a
    live EMA weight, fobj is not 1 - fidelity, so the threshold must act on
    the fidelity itself)."""
    from ...utils import as_device

    return _optimize_horizon_surrogate(
        circ,
        jnp.asarray(thetas0),
        as_device(target),
        tuple(int(i) for i in np.asarray(state_idx)),
        float(weight0),
        float(gamma),
        None if fidelity_thr is None else float(fidelity_thr),
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
    )


def _mps_value_fns(circ: Ansatz, base_bits: tuple, trunc_thr: float):
    """The MPS fidelity objective as pure functions of ``(thetas, target)``:
    returns ``(value, value_and_grad)`` shared by the one-program horizon
    runner and the chunked time-limited runner (the target is an explicit
    argument — never a closure — per the complex-closure rule, CLAUDE.md)."""
    from ...ops.mps import (
        mps_basis_state,
        mps_dot,
        mps_flip_amplitudes,
        v_dagger_layer_cache_eligible,
        v_dagger_mul_mps,
        v_dagger_mul_mps_layers,
        v_mul_mps_growing,
    )
    from ...ops.mps_gradient import fast_dot_gradient, fast_dot_gradient_with_state

    use_cache = v_dagger_layer_cache_eligible(circ)

    def value(th, tgt):
        if use_cache:
            # FORWARD objective: |<V lvec | t>|^2 == |<lvec | V† t>|^2, but
            # the forward sweep grows from a PRODUCT state — with χ-growth
            # scheduling the head phases run at tiny static bond dimensions
            # (exact; ops/mps.py v_mul_mps_growing), making linesearch
            # trials much cheaper than a full-rank V† sweep.  Consistent
            # with the gradient path's objective (which reads the co-sweep's
            # final w).
            w = v_mul_mps_growing(
                circ, th, base_bits, tgt.chi, trunc_thr=trunc_thr,
                dtype=tgt.gammas.dtype,
            )
            hs = mps_dot(w, tgt)
            return (1.0 - jnp.abs(hs) ** 2).real.astype(th.dtype)
        vh = v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        amps = mps_flip_amplitudes(vh, base_bits)
        return (1.0 - jnp.abs(amps[0]) ** 2).real.astype(th.dtype)

    def value_and_grad(th, tgt):
        # Analytic MPS co-sweep — autodiff through truncated SVDs is
        # ill-conditioned; the co-sweep is exact (parity-tested vs dense).
        lvec = mps_basis_state(base_bits, tgt.chi, tgt.gammas.dtype)
        if use_cache:
            # The V† sweep's per-layer cache makes the co-sweep z-free; its
            # final w (= V lvec) provides the forward-consistent objective.
            vh, zcache = v_dagger_mul_mps_layers(circ, th, tgt, trunc_thr=trunc_thr)
            # grow_w: lvec is a rank-1 product state, so the co-sweep's head
            # layers run at growing static bond dimensions (exact).
            grad, w_fin = fast_dot_gradient_with_state(
                circ, th, lvec, vh, zcache, trunc_thr=trunc_thr, grow_w=True
            )
            # <V lvec | t> = lvec† V† t — the SAME complex number as the
            # dagger-path amplitude <lvec|V† t>, read forward-consistently.
            hs0 = mps_dot(w_fin, tgt)
            fobj = (1.0 - jnp.abs(hs0) ** 2).real.astype(th.dtype)
            grad = jnp.real(-2.0 * jnp.conj(hs0) * grad).astype(th.dtype)
            return fobj, grad
        vh = v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        amps = mps_flip_amplitudes(vh, base_bits)
        hs0 = amps[0]
        fobj = (1.0 - jnp.abs(hs0) ** 2).real.astype(th.dtype)
        grad = fast_dot_gradient(circ, th, lvec, vh, trunc_thr=trunc_thr)
        grad = jnp.real(-2.0 * jnp.conj(hs0) * grad).astype(th.dtype)
        return fobj, grad

    return value, value_and_grad


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _optimize_horizon_mps(
    circ: Ansatz,
    x0,
    tgt,  # MPS target (pytree)
    base_bits: tuple,
    trunc_thr: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
) -> JitHorizonResult:
    value, value_and_grad = _mps_value_fns(circ, base_bits, trunc_thr)
    res = minimize_lbfgs_compact(
        lambda th: value(th, tgt),
        x0,
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
        value_and_grad_fn=lambda th: value_and_grad(th, tgt),
    )
    fid = 1.0 - res.fobj
    return JitHorizonResult(res.thetas, res.fobj, fid, res.num_iters, res.converged)


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _optimize_horizon_mps_batch(
    circ: Ansatz,
    x0_batch,
    tgt,
    base_bits: tuple,
    trunc_thr: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
) -> JitHorizonResult:
    return jax.vmap(
        lambda x0: _optimize_horizon_mps(
            circ, x0, tgt, base_bits, trunc_thr, fobj_thr, maxiter,
            no_improve_iters,
        )
    )(x0_batch)


def optimize_horizon_mps_multistart(
    circ: Ansatz,
    thetas0_batch,
    target,  # MPS
    *,
    base_bits: Sequence[int],
    trunc_thr: float = 1e-6,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
) -> JitHorizonResult:
    """Multi-start MPS ASP horizon optimization: B fully-on-device L-BFGS
    instances in lock-step inside one XLA program — the SPMD replacement of
    the reference's joblib fan-out (job_executor.py:96-161) for the MPS
    objective.  One program + one dispatch for the whole fleet; measured
    aggregate throughput is platform-dependent (batched decompositions do
    NOT amortize on all TPU runtimes — see RESULTS.md), so benchmark before
    sizing B.  Returns batched results; ``argmin(res.fobj)`` is the winner."""
    if len(base_bits) != circ.num_qubits:
        raise ValueError(
            f"base_bits must give one 0/1 occupation per site: got "
            f"{len(base_bits)} for {circ.num_qubits} qubits"
        )
    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    return _optimize_horizon_mps_batch(
        circ,
        jnp.asarray(thetas0_batch),
        target,
        tuple(int(b) for b in base_bits),
        float(trunc_thr),
        fobj_thr,
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
    )


# -----------------------------------------------------------------------------
# MPS optimization watchdog (the fobj=1.0 collapse fence).
#
# Round-4 finding (RESULTS.md qrlite/cholqr gauntlets): margin-thinned SVD
# variants can corrupt the MPS objective MID-OPTIMIZATION in ways point
# probes cannot see — the observed signature is the jitted loop collapsing
# to fobj ~ 1.0 (the state annihilated by garbage factors) while the same
# iterate evaluates fine under the reference decomposition.  The production
# default ("rand" + fused kernels) is in-band at every tested point, but its
# safety is empirical, not structural.  The fence: after every on-device
# horizon optimization under a non-reference route, RE-EVALUATE the returned
# best iterate under the reference decomposition; a gross disagreement flags
# the run (module logger + ``watchdog_events``) and re-optimizes the horizon
# under the reference route.  One extra objective evaluation per horizon.
# -----------------------------------------------------------------------------

import logging as _logging

_watchdog_logger = _logging.getLogger(__name__)

#: Flagged events (dicts with the disagreeing values), newest last — a
#: monitoring hook for drivers and tests.
watchdog_events: list = []

# A disagreement is "gross" when it exceeds BOTH bounds: cross-impl noise at
# a common iterate is ~1e-5-class, the collapse signature is O(1).  The
# relative bound scales with the SMALLER of the two values — in a collapse
# one side is O(1) garbage and the other is the small true objective, and
# either side may be the corrupted one.
_WATCHDOG_ABS = 1e-2
_WATCHDOG_REL = 1.0


def _watchdog_reference_impl() -> str:
    """The decomposition the watchdog trusts: the production-proven Pallas
    Jacobi kernel on TPU, LAPACK SVD elsewhere."""
    from ...config import is_tpu

    return "jacobi" if is_tpu() else "native"


def _wrap_svd_impl(fn, impl: str):
    """Pins ``fn``'s trace to one SVD implementation (the policy is read at
    trace time; programs wrapped this way must be cached keyed on impl)."""
    from ...config import svd_impl_override

    def pinned(*args):
        with svd_impl_override(impl):
            return fn(*args)

    return pinned


from functools import lru_cache as _wd_lru_cache


@_wd_lru_cache(maxsize=None)
def _mps_value_program(circ: Ansatz, base_bits: tuple, trunc_thr: float, impl: str):
    value, _ = _mps_value_fns(circ, base_bits, trunc_thr)
    return jax.jit(_wrap_svd_impl(value, impl))


@_wd_lru_cache(maxsize=None)
def _mps_horizon_program(
    circ: Ansatz,
    base_bits: tuple,
    trunc_thr: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
    impl: str,
):
    """The one-program MPS horizon runner, PINNED to ``impl`` and cached per
    (config, impl) — flipping the ambient SVD policy between calls can never
    serve a stale program (jit caches know nothing of the global policy)."""
    value, value_and_grad = _mps_value_fns(circ, base_bits, trunc_thr)

    def run(x0, tgt):
        res = minimize_lbfgs_compact(
            lambda th: value(th, tgt),
            x0,
            maxiter=maxiter,
            fobj_thr=fobj_thr,
            no_improve_iters=no_improve_iters,
            value_and_grad_fn=lambda th: value_and_grad(th, tgt),
        )
        fid = 1.0 - res.fobj
        return JitHorizonResult(
            res.thetas, res.fobj, fid, res.num_iters, res.converged
        )

    return jax.jit(_wrap_svd_impl(run, impl))


def _mps_watchdog(
    circ: Ansatz,
    thetas0,
    target,
    res: JitHorizonResult,
    *,
    base_bits: tuple,
    trunc_thr: float,
    fobj_thr,
    maxiter: int,
    no_improve_iters,
) -> JitHorizonResult:
    """Re-evaluates ``res.thetas`` under the reference decomposition; on a
    gross disagreement logs the event and re-optimizes the horizon under the
    reference route, returning the recovered result."""
    from ...config import mps_watchdog_enabled, svd_impl

    ref_impl = _watchdog_reference_impl()
    if not mps_watchdog_enabled() or svd_impl() == ref_impl:
        return res
    check = _mps_value_program(circ, base_bits, trunc_thr, ref_impl)
    fobj_ref = float(np.asarray(check(res.thetas, target)))
    fobj_opt = float(np.asarray(res.fobj))
    diff = abs(fobj_opt - fobj_ref)
    scale = min(abs(fobj_opt), abs(fobj_ref))
    if diff <= max(_WATCHDOG_ABS, _WATCHDOG_REL * scale):
        return res
    event = {
        "fobj_optimized": fobj_opt,
        "fobj_reference": fobj_ref,
        "svd_impl": svd_impl(),
        "reference_impl": ref_impl,
        "num_qubits": circ.num_qubits,
    }
    watchdog_events.append(event)
    _watchdog_logger.warning(
        "MPS watchdog: optimized fobj %0.6g disagrees with the reference "
        "decomposition's %0.6g at the returned iterate (svd_impl=%s) — "
        "re-optimizing this horizon under %s",
        fobj_opt, fobj_ref, event["svd_impl"], ref_impl,
    )
    recover = _mps_horizon_program(
        circ, base_bits, trunc_thr, fobj_thr, maxiter, no_improve_iters,
        ref_impl,
    )
    return recover(jnp.asarray(thetas0), target)


def optimize_horizon_mps_jit(
    circ: Ansatz,
    thetas0,
    target,  # MPS
    *,
    base_bits: Sequence[int],
    trunc_thr: float = 1e-6,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
) -> JitHorizonResult:
    """Fully-on-device ASP horizon optimization with the MPS engine: the
    fidelity objective (one fused-block V† sweep + flip-amplitude read) and
    the layer-batched analytic MPS co-sweep gradient run inside one jitted
    compact-L-BFGS loop.  ``base_bits`` encodes the X-layer product prep
    (e.g. the Neel state).

    When the ambient SVD route is not the reference decomposition, the
    result passes the collapse watchdog (``_mps_watchdog``): a gross
    objective disagreement at the returned iterate is logged and the horizon
    re-optimized under the reference route."""
    if len(base_bits) != circ.num_qubits:
        raise ValueError(
            f"base_bits must give one 0/1 occupation per site: got "
            f"{len(base_bits)} for {circ.num_qubits} qubits"
        )
    from ...config import svd_impl

    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    base_t = tuple(int(b) for b in base_bits)
    no_imp = None if no_improve_iters is None else int(no_improve_iters)
    program = _mps_horizon_program(
        circ, base_t, float(trunc_thr), fobj_thr, int(maxiter), no_imp,
        svd_impl(),
    )
    res = program(jnp.asarray(thetas0), target)
    return _mps_watchdog(
        circ, thetas0, target, res,
        base_bits=base_t, trunc_thr=float(trunc_thr), fobj_thr=fobj_thr,
        maxiter=int(maxiter), no_improve_iters=no_imp,
    )


def optimize_horizon_jit(
    circ: Ansatz,
    thetas0,
    target,
    *,
    state_idx: Sequence[int],
    weight: float = 0.0,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
    solver: str = "compact",
) -> JitHorizonResult:
    """Optimizes one ASP horizon entirely on device.

    ``fidelity_thr`` maps to the loss threshold ``1 - fidelity_thr`` when
    ``weight == 0`` (the fidelity objective); for ``weight > 0`` it is used
    as an approximate fobj threshold.  The jitted runner is cached on its
    static configuration — repeated calls do not retrace.

    ``solver``: "compact" (two-loop L-BFGS + Armijo backtracking; small XLA
    program — some TPU toolchains compile optax's zoom linesearch for tens
    of minutes) or "zoom" (optax L-BFGS with zoom linesearch).
    """
    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    return _optimize_horizon(
        circ,
        jnp.asarray(thetas0),
        jnp.asarray(target),
        tuple(int(i) for i in np.asarray(state_idx)),
        float(weight),
        fobj_thr,
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
        solver,
    )


# -----------------------------------------------------------------------------
# Time-limited on-device optimization (chunked dispatch).
#
# The one-program runners above cannot honor the reference's ``time_limit``
# stopper (optimizer.py:36-62) — XLA has no wall clock.  These variants run
# the SAME jitted loop in chunks of K iterations per dispatch and let the
# host check the clock between chunks: ~single-program throughput (one
# two-scalar fetch per chunk) with the full stopper contract.  The chunk
# programs are cached per static configuration (lru_cache), so a horizon
# schedule reuses two compiled programs for every horizon and every chunk.
# -----------------------------------------------------------------------------

from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _surrogate_chunk_cache(
    circ: Ansatz, state_idx_t: tuple, gamma: float, fid_thr, maxiter: int,
    no_improve_iters,
):
    value, vgrad = make_surrogate_stateful(circ, state_idx_t, gamma)
    stop_fn = None
    if fid_thr is not None:
        stop_fn = lambda st: st.fidelity > fid_thr  # noqa: E731
    return lbfgs_chunk_programs(
        value,
        vgrad,
        maxiter=maxiter,
        no_improve_iters=no_improve_iters,
        stop_fn=stop_fn,
    )


@_lru_cache(maxsize=None)
def _mps_chunk_cache(
    circ: Ansatz, base_bits: tuple, trunc_thr: float, fobj_thr, maxiter: int,
    no_improve_iters, impl: str,
):
    value, vgrad = _mps_value_fns(circ, base_bits, trunc_thr)
    return lbfgs_chunk_programs(
        _wrap_svd_impl(lambda x, st, tgt: (value(x, tgt), st), impl),
        _wrap_svd_impl(lambda x, st, tgt: vgrad(x, tgt) + (st,), impl),
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
    )


@_lru_cache(maxsize=None)
def _fidelity_readout(circ: Ansatz, idx0: int):
    @jax.jit
    def fid(thetas, target):
        vh = v_dagger_mul_vec(circ, thetas, target)
        return jnp.abs(vh[idx0]) ** 2

    return fid


def optimize_horizon_surrogate_timed(
    circ: Ansatz,
    thetas0,
    target,
    *,
    state_idx: Sequence[int],
    weight0: float = 1.0,
    gamma: float = 0.1,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
    time_limit: Optional[float] = None,
    chunk_iters: int = 25,
):
    """:func:`optimize_horizon_surrogate_jit` with the wall clock enforced
    between dispatch chunks.  Returns ``(JitSurrogateResult, timed_out)``."""
    from ...utils import as_device

    idx_t = tuple(int(i) for i in np.asarray(state_idx))
    x0 = jnp.asarray(thetas0)
    st0 = SurrogateState(
        jnp.asarray(0, jnp.int32),
        jnp.asarray(weight0, x0.dtype),
        jnp.asarray(0.0, x0.dtype),
        jnp.asarray(jnp.inf, x0.dtype),
    )
    programs = _surrogate_chunk_cache(
        circ,
        idx_t,
        float(gamma),
        None if fidelity_thr is None else float(fidelity_thr),
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
    )
    tgt = as_device(target)
    res, st, timed_out = run_lbfgs_chunked(
        programs,
        x0,
        st0,
        (tgt,),
        maxiter=int(maxiter),
        time_limit=time_limit,
        chunk_iters=int(chunk_iters),
    )
    fid = _fidelity_readout(circ, idx_t[0])(res.thetas, tgt)
    return (
        JitSurrogateResult(
            res.thetas, res.fobj, fid, res.num_iters, res.converged,
            st.weight, st.max_no,
        ),
        timed_out,
    )


def optimize_horizon_mps_timed(
    circ: Ansatz,
    thetas0,
    target,  # MPS
    *,
    base_bits: Sequence[int],
    trunc_thr: float = 1e-6,
    fidelity_thr: Optional[float] = None,
    maxiter: int = 100,
    no_improve_iters: Optional[int] = None,
    time_limit: Optional[float] = None,
    chunk_iters: int = 25,
):
    """:func:`optimize_horizon_mps_jit` with the wall clock enforced between
    dispatch chunks.  Returns ``(JitHorizonResult, timed_out)``.

    The collapse watchdog runs here too; a flagged horizon's recovery is the
    one-program reference-route runner (correctness first — the recovery of
    a rare flagged event does not re-honor ``time_limit``)."""
    if len(base_bits) != circ.num_qubits:
        raise ValueError(
            f"base_bits must give one 0/1 occupation per site: got "
            f"{len(base_bits)} for {circ.num_qubits} qubits"
        )
    from ...config import svd_impl

    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    base_t = tuple(int(b) for b in base_bits)
    no_imp = None if no_improve_iters is None else int(no_improve_iters)
    programs = _mps_chunk_cache(
        circ, base_t, float(trunc_thr), fobj_thr, int(maxiter), no_imp,
        svd_impl(),
    )
    res, _, timed_out = run_lbfgs_chunked(
        programs,
        jnp.asarray(thetas0),
        (),
        (target,),
        maxiter=int(maxiter),
        time_limit=time_limit,
        chunk_iters=int(chunk_iters),
    )
    fid = 1.0 - res.fobj
    out = JitHorizonResult(
        res.thetas, res.fobj, fid, res.num_iters, res.converged
    )
    out = _mps_watchdog(
        circ, thetas0, target, out,
        base_bits=base_t, trunc_thr=float(trunc_thr), fobj_thr=fobj_thr,
        maxiter=int(maxiter), no_improve_iters=no_imp,
    )
    return out, timed_out
