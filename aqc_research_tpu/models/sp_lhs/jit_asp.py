"""Fully-jitted ASP optimization path (one XLA program per horizon).

The class-based objectives (sur_max.py / sur_fast_mps.py) keep the
reference's host-side optimizer protocol.  This module is the TPU-first
alternative: the surrogate loss is a pure function and the WHOLE L-BFGS
optimization of a horizon runs on device (optim/lbfgs.py), with no host
round trips — the production fast path for time-to-solution benchmarks.

Deviations from the host objective, by design (documented):

* the max-projection term selects the leading flip state with a hard
  ``argmax`` every evaluation (no 1.1x cross-iteration hysteresis — that is
  host-side state);
* the flip-term weight ``w`` is a fixed input rather than the reference's
  EMA ``w += 0.1(sqrt|fobj| - w)`` (objective_lhs_sur_max.py:185-186);
  ``w = 0`` gives the pure fidelity objective used by the benchmarks.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...circuit.ansatz import Ansatz
from ...ops.statevector import v_dagger_mul_vec
from ...optim.lbfgs import (
    JitMinimizeResult,
    minimize_lbfgs,
    minimize_lbfgs_compact,
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


class JitHorizonResult(NamedTuple):
    thetas: jax.Array
    fobj: jax.Array  # best (lowest) surrogate value
    fidelity: jax.Array  # hs2[0] at the best thetas
    num_iters: jax.Array
    converged: jax.Array


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8))
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
) -> JitHorizonResult:
    loss = make_surrogate_loss(circ, state_idx_t, weight)
    idx0 = int(state_idx_t[0])
    minimize = minimize_lbfgs_compact if solver == "compact" else minimize_lbfgs
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


@_partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8))
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
) -> JitHorizonResult:
    return jax.vmap(
        lambda x0: _optimize_horizon(
            circ, x0, tgt, state_idx_t, weight, fobj_thr, maxiter,
            no_improve_iters, solver,
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
) -> JitHorizonResult:
    """Multi-start ASP horizon optimization: one batched XLA program runs B
    L-BFGS instances in lock-step (BASELINE.md config 4 — the vmap
    replacement of the reference's joblib fan-out).  Returns batched results;
    pick ``argmin(res.fobj)`` for the winner."""
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
    )


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
    from ...ops.mps import mps_basis_state, mps_flip_amplitudes, v_dagger_mul_mps
    from ...ops.mps_gradient import fast_dot_gradient

    chi = tgt.chi
    lvec = mps_basis_state(base_bits, chi, tgt.gammas.dtype)

    def value(th):
        vh = v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        amps = mps_flip_amplitudes(vh, base_bits)
        return (1.0 - jnp.abs(amps[0]) ** 2).real.astype(x0.dtype)

    def value_and_grad(th):
        vh = v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        amps = mps_flip_amplitudes(vh, base_bits)
        hs0 = amps[0]
        fobj = (1.0 - jnp.abs(hs0) ** 2).real.astype(x0.dtype)
        # Analytic MPS co-sweep — autodiff through truncated SVDs is
        # ill-conditioned; the co-sweep is exact (parity-tested vs dense).
        grad = fast_dot_gradient(circ, th, lvec, vh, trunc_thr=trunc_thr)
        grad = jnp.real(-2.0 * jnp.conj(hs0) * grad).astype(x0.dtype)
        return fobj, grad

    res = minimize_lbfgs_compact(
        value,
        x0,
        maxiter=maxiter,
        fobj_thr=fobj_thr,
        no_improve_iters=no_improve_iters,
        value_and_grad_fn=value_and_grad,
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
    (e.g. the Neel state)."""
    if len(base_bits) != circ.num_qubits:
        raise ValueError(
            f"base_bits must give one 0/1 occupation per site: got "
            f"{len(base_bits)} for {circ.num_qubits} qubits"
        )
    fobj_thr = None if fidelity_thr is None else (1.0 - float(fidelity_thr))
    return _optimize_horizon_mps(
        circ,
        jnp.asarray(thetas0),
        target,
        tuple(int(b) for b in base_bits),
        float(trunc_thr),
        fobj_thr,
        int(maxiter),
        None if no_improve_iters is None else int(no_improve_iters),
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
