"""Coordinate-descent sweep for the full-AQC objective.

TPU-native counterpart of the reference Newton/GD coordinate descent
(``/root/reference/aqc_research/core_op_matrix.py:765-917``): one sweep walks
through all angles in circuit order, carrying ``w = V_new_prefix @ I`` and
``z = V_old_suffix† @ U``; for each angle it computes the first/second
derivative of ``fobj = 1 - |<V,U>|^2 / dim^2`` from two inner products, takes
a Newton step when f'' > tol (else clipped gradient descent), applies the
*old*-angle gate to ``z`` and the *new*-angle gate to ``w``.

The whole sweep — including all Θ updates — is ONE jitted XLA program with
``lax.scan`` over the periodic block structure; Θ is part of the carry, so
repeated sweeps run back-to-back on device with no host round trips.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..utils import as_device
from ..circuit.ansatz import Ansatz
from .statevector import apply_1q, apply_2q, pauli_dot, structure_period, v_dagger_mul_mat

_LEARN_RATE = np.pi / 16
_MAX_DELTA_THETA = np.pi / 4


def _delta_theta(prod, grad, dim, tol):
    """Newton / clipped-GD angle increment (cf. core_op_matrix.py:829-850)."""
    derv1 = (-2.0 * jnp.real(jnp.conj(prod) * grad)) / (dim**2)
    derv2 = (-2.0 * jnp.abs(grad) ** 2 + 0.5 * jnp.abs(prod) ** 2) / (dim**2)
    gd_step = -_LEARN_RATE * derv1 / jnp.maximum(jnp.abs(derv1), 1.0)
    newton_step = -derv1 / jnp.where(derv2 < tol, 1.0, derv2)
    dt = jnp.where(derv2 < tol, gd_step, newton_step)
    abs_dt = jnp.abs(dt / _MAX_DELTA_THETA)
    return jnp.where(abs_dt <= 1, dt, dt / abs_dt)


def _update_angle(w, z, theta, gate_fn, pauli, qubit, tail, dim, tol):
    """One coordinate update: dot, old-angle gate on z, step, new gate on w."""
    dtype = w.dtype
    grad = pauli_dot(w, z, pauli, qubit, tail)
    prod = jnp.vdot(w, z)
    z = apply_1q(z, gate_fn(theta, dtype), qubit, tail)
    theta = theta + _delta_theta(prod, grad, dim, tol)
    w = apply_1q(w, gate_fn(theta, dtype), qubit, tail)
    return w, z, theta


@partial(jax.jit, static_argnums=(0,))
def _coord_descent_sweep(circ: Ansatz, thetas: jax.Array, target: jax.Array):
    """One full sweep; returns (new_thetas, fobj)."""
    if circ.entangler == "cp":
        raise NotImplementedError("coordinate descent does not handle the cp entangler (matching the reference contract, core_op_matrix.py:819)")
    dtype = target.dtype
    dim = circ.dimension
    tail = dim
    tol = float(np.sqrt(np.finfo(np.float64).eps))
    rs_fn = G.rx if circ.entangler == "cx" else G.rz
    s_char = "x" if circ.entangler == "cx" else "z"
    ent = (
        G.controlled(G.x(dtype), dtype)
        if circ.entangler == "cx"
        else G.controlled(G.z(dtype), dtype)
    )

    w = jnp.eye(dim, dtype=dtype)
    z = v_dagger_mul_mat(circ, thetas, target)

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)

    # Front layer of Rz·Ry·Rz (update order t2, t1, t0 is NOT what the
    # reference uses — it updates t[2] first via z-dot, then t[1], t[0];
    # cf. core_op_matrix.py:852-872 — same order here).
    new1q = []
    for q in range(circ.num_qubits):
        t = thetas1q[q]
        w, z, t2 = _update_angle(w, z, t[2], G.rz, "z", q, tail, dim, tol)
        w, z, t1 = _update_angle(w, z, t[1], G.ry, "y", q, tail, dim, tol)
        w, z, t0 = _update_angle(w, z, t[0], G.rz, "z", q, tail, dim, tol)
        new1q.append(jnp.stack([t0, t1, t2]))
    new1q = jnp.stack(new1q)

    pattern = [
        (int(circ.blocks[0, k]), int(circ.blocks[1, k])) for k in range(circ.num_blocks)
    ]

    def block_step(w, z, tht, k):
        c, tg = pattern[k]
        z = apply_2q(z, ent, c, tg, tail)
        w = apply_2q(w, ent, c, tg, tail)
        w, z, t0 = _update_angle(w, z, tht[0], G.ry, "y", c, tail, dim, tol)
        w, z, t1 = _update_angle(w, z, tht[1], G.rz, "z", c, tail, dim, tol)
        w, z, t2 = _update_angle(w, z, tht[2], G.ry, "y", tg, tail, dim, tol)
        w, z, t3 = _update_angle(w, z, tht[3], rs_fn, s_char, tg, tail, dim, tol)
        return w, z, jnp.stack([t0, t1, t2, t3])

    nb = circ.num_blocks
    p = structure_period(circ) if nb else 0
    new2q_chunks = []
    done = 0
    if nb:
        reps = nb // p if p else 0
        if p and reps >= 2:
            th_chunks = thetas2q[: reps * p].reshape(reps, p, circ.tpb)

            def body(carry, th_chunk):
                w_, z_ = carry
                outs = []
                for k in range(p):
                    w_, z_, t_new = block_step(w_, z_, th_chunk[k], k)
                    outs.append(t_new)
                return (w_, z_), jnp.stack(outs)

            (w, z), scanned = jax.lax.scan(body, (w, z), th_chunks)
            new2q_chunks.append(scanned.reshape(reps * p, circ.tpb))
            done = reps * p
        rem = []
        for k in range(done, nb):
            w, z, t_new = block_step(w, z, thetas2q[k], k)
            rem.append(t_new)
        if rem:
            new2q_chunks.append(jnp.stack(rem))

    new2q = (
        jnp.concatenate(new2q_chunks, axis=0)
        if new2q_chunks
        else jnp.zeros((0, circ.tpb), thetas.dtype)
    )
    new_thetas = jnp.concatenate([new1q.reshape(-1), new2q.reshape(-1)])
    fobj = 1.0 - jnp.abs(jnp.vdot(w, z) / dim) ** 2
    return new_thetas.astype(thetas.dtype), jnp.real(fobj)


def coord_descent_single_sweep(
    circ: Ansatz, thetas, target
) -> Tuple[jax.Array, jax.Array]:
    """One coordinate-descent sweep over all angles.

    Functional twin of reference ``coord_descent_single_sweep``
    (core_op_matrix.py:765-917): returns ``(new_thetas, fobj)`` instead of
    mutating Θ in place.
    """
    return _coord_descent_sweep(circ, jnp.asarray(thetas), as_device(target))


class CoordDescentRun(NamedTuple):
    thetas: jax.Array  # best parameters seen (lowest fobj sweep)
    fobj: jax.Array  # best objective value
    num_sweeps: jax.Array  # sweeps actually executed
    converged: jax.Array  # True when a stop condition fired before maxiter
    profile: jax.Array  # (maxiter,) per-sweep fobj, NaN beyond num_sweeps


@lru_cache(maxsize=None)
def coord_descent_programs(
    circ: Ansatz,
    maxiter: int,
    thetas_tol: float = 1e-8,
    fobj_thr: float = None,
):
    """Jitted ``(init, chunk, extract)`` for a MULTI-SWEEP coordinate-descent
    loop — the whole descent runs on device as one ``lax.while_loop`` over
    sweeps (the reference drives every sweep from a host loop,
    aqc_coord_descent.py:58-88; through a remote-dispatch tunnel that costs
    ~60 ms per sweep, so on-device looping is the production shape).

    Same chunked contract as ``optim.lbfgs.lbfgs_chunk_programs``: the carry
    ends in a traced sweep LIMIT, the host may re-enter the compiled loop in
    chunks and check the wall clock between chunks.  Stops when the largest
    angle change of a sweep falls below ``thetas_tol`` (reference threshold,
    aqc_coord_descent.py:37), when ``fobj < fobj_thr``, or at ``maxiter``.
    """
    thr = -jnp.inf if fobj_thr is None else float(fobj_thr)

    def cond(carry):
        it, stop, limit = carry[0], carry[1], carry[-1]
        return jnp.logical_and(it < limit, jnp.logical_not(stop))

    def init_impl(thetas0):
        thetas0 = jnp.asarray(thetas0)
        profile = jnp.full((int(maxiter),), jnp.nan, thetas0.dtype)
        return (
            jnp.asarray(0),
            jnp.asarray(False),
            thetas0,
            jnp.asarray(jnp.inf, thetas0.dtype),
            thetas0,
            profile,
            jnp.asarray(0),
        )

    def chunk_impl(carry, limit, target):
        def body_t(carry):
            it, _, thetas, best_f, best_th, profile, lim = carry
            new_thetas, fobj = _coord_descent_sweep.__wrapped__(
                circ, thetas, target
            )
            change = jnp.max(jnp.abs(new_thetas - thetas))
            improved = fobj < best_f
            best_f = jnp.where(improved, fobj, best_f)
            best_th = jnp.where(improved, new_thetas, best_th)
            profile = profile.at[it].set(fobj.astype(profile.dtype))
            stop = jnp.logical_or(change < thetas_tol, fobj < thr)
            return (it + 1, stop, new_thetas, best_f, best_th, profile, lim)

        carry = carry[:-1] + (jnp.asarray(limit),)
        return jax.lax.while_loop(cond, body_t, carry)

    def extract(carry):
        it, stop, _, best_f, best_th, profile, _ = carry
        return CoordDescentRun(best_th, best_f, it, stop, profile)

    return jax.jit(init_impl), jax.jit(chunk_impl), extract


def coord_descent_run(
    circ: Ansatz,
    thetas0,
    target,
    *,
    maxiter: int,
    thetas_tol: float = 1e-8,
    fobj_thr: float = None,
    time_limit: float = None,
    chunk_sweeps: int = 20,
) -> Tuple[CoordDescentRun, bool]:
    """Full multi-sweep coordinate descent on device, chunk-dispatched.

    Returns ``(CoordDescentRun, timed_out)``.  ``time_limit`` of ``None`` or
    <= 0 disables the clock."""
    import time as _time

    init_j, chunk_j, extract = coord_descent_programs(
        circ, int(maxiter), float(thetas_tol),
        None if fobj_thr is None else float(fobj_thr),
    )
    tgt = as_device(target)
    deadline = (
        None
        if time_limit is None or time_limit <= 0
        else _time.perf_counter() + float(time_limit)
    )
    carry = init_j(thetas0)
    it, timed_out = 0, False
    while it < maxiter:
        nxt = min(it + int(chunk_sweeps), int(maxiter))
        carry = chunk_j(carry, nxt, tgt)
        it = int(np.asarray(carry[0]))
        if bool(np.asarray(carry[1])):
            break
        if deadline is not None and _time.perf_counter() >= deadline:
            timed_out = it < maxiter
            break
    return extract(carry), timed_out
