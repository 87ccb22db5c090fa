"""Analytic co-sweep gradient of the dot product ``<x | V(Θ)† | y>``.

TPU-native counterpart of the reference's O(1)-memory gradient
(``/root/reference/aqc_research/core_operations.py:823-1019`` for vectors and
``core_op_matrix.py:645-762`` for matrices).  The algorithm is the same
forward co-sweep: two carried states

    w  <- G_k · w        (starts at x)
    z  <- G_k · z        (starts at V† y, cached from the objective pass)

walk through the circuit gate by gate; after each parametrized gate the
contribution ``grad_k = 0.5j * <P_k w | z>`` (P_k the gate's Pauli generator)
falls out of one inner product — so the full gradient costs ~2 circuit
applications regardless of the parameter count, with O(1) extra memory.

Differences from the reference, deliberate:

* Functional (no workspaces); one unified implementation serves the vector
  AND the matrix engines via the ``tail`` trick (see ops/statevector.py).
* ``lax.scan`` over the periodic block structure keeps compile time O(period).
* Partial gradients (``block_range``) are realized by a per-block 0/1 mask on
  the dot products (uniform compute -> scannable); outside-range entries are
  exactly zero, matching the reference contract
  (core_operations.py:996-1013).
* The 2nd-order Trotter trailing half-layer accumulates into the leading
  half-layer's gradient entries (reference ``+=``, core_operations.py:966-968)
  via one extra unrolled half-sweep.

Returned gradients are **complex** (as in the reference); objectives take the
real part after scaling by the appropriate conjugate factors.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..utils import as_device
from ..circuit.ansatz import Ansatz
from .statevector import apply_1q, apply_2q, pauli_dot, v_dagger_mul_mat, v_dagger_mul_vec


def _cp_derv_4x4(angle, dtype):
    """Derivative of the controlled-phase gate: diag(0, 0, 0, i e^{ia}).

    Cf. reference ``derv_cphase_mul_vec`` (core_operations.py:561-603).
    """
    d = jnp.zeros((4, 4), dtype)
    return d.at[3, 3].set((1j * jnp.exp(1j * angle)).astype(dtype))


def _entangler_4x4(circ: Ansatz, tht, dtype):
    if circ.entangler == "cp":
        return G.controlled(G.phase(tht[4], dtype), dtype)
    if circ.entangler == "cz":
        return G.controlled(G.z(dtype), dtype)
    return G.controlled(G.x(dtype), dtype)


def _block_cosweep_step(
    circ: Ansatz,
    wz,
    tht,
    mask,
    ctrl: int,
    targ: int,
    frame_start: bool,
    frame_end: bool,
    tail: int,
):
    """One unit-block step of the co-sweep; returns (wz, dots[tpb]).

    ``wz`` stacks the two carried states (w, z) along a leading axis so every
    gate applies to both in ONE pass over memory (they undergo identical
    gates) — halving the gate-op count vs the reference's separate sweeps.

    Gate order matches reference core_operations.py:962-1017: optional
    Rz(-pi/2) framing, entangler (+ CP derivative), Ry/Rz on control,
    Ry/Rs on target, optional Rz(pi/2) framing.
    """
    dtype = wz.dtype
    cp = circ.entangler == "cp"
    rs = G.rx if circ.entangler == "cx" else G.rz
    s_char = "x" if circ.entangler == "cx" else "z"

    if frame_start:
        wz = apply_1q(wz, G.rz(-np.pi / 2, dtype), ctrl, tail)

    ent = _entangler_4x4(circ, tht, dtype)
    if cp:
        z_new = apply_2q(wz[1], ent, ctrl, targ, tail)
        dw = apply_2q(wz[0], _cp_derv_4x4(tht[4], dtype), ctrl, targ, tail)
        d4 = mask * jnp.vdot(dw, z_new)
        w_new = apply_2q(wz[0], ent, ctrl, targ, tail)
        wz = jnp.stack([w_new, z_new])
    else:
        wz = apply_2q(wz, ent, ctrl, targ, tail)

    wz = apply_1q(wz, G.ry(tht[0], dtype), ctrl, tail)
    d0 = mask * pauli_dot(wz[0], wz[1], "y", ctrl, tail)
    wz = apply_1q(wz, G.rz(tht[1], dtype), ctrl, tail)
    d1 = mask * pauli_dot(wz[0], wz[1], "z", ctrl, tail)
    wz = apply_1q(wz, G.ry(tht[2], dtype), targ, tail)
    d2 = mask * pauli_dot(wz[0], wz[1], "y", targ, tail)
    wz = apply_1q(wz, rs(tht[3], dtype), targ, tail)
    d3 = mask * pauli_dot(wz[0], wz[1], s_char, targ, tail)

    if frame_end:
        wz = apply_1q(wz, G.rz(np.pi / 2, dtype), targ, tail)

    dots = [d0, d1, d2, d3] + ([d4] if cp else [])
    return wz, jnp.stack(dots)


def _front_cosweep(circ: Ansatz, wz, thetas1q, front_layer: bool, tail: int):
    """Front Rz·Ry·Rz layer of the co-sweep (core_operations.py:918-949)."""
    dtype = wz.dtype
    n = circ.num_qubits
    grads = []
    zero = jnp.zeros((), dtype)
    for q in range(n):
        t = thetas1q[q]
        wz = apply_1q(wz, G.rz(t[2], dtype), q, tail)
        d2 = pauli_dot(wz[0], wz[1], "z", q, tail) if front_layer else zero
        wz = apply_1q(wz, G.ry(t[1], dtype), q, tail)
        d1 = pauli_dot(wz[0], wz[1], "y", q, tail) if front_layer else zero
        wz = apply_1q(wz, G.rz(t[0], dtype), q, tail)
        d0 = pauli_dot(wz[0], wz[1], "z", q, tail) if front_layer else zero
        grads.append(jnp.stack([d0, d1, d2]))
    return wz, jnp.stack(grads)  # (n, 3)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _dot_product_gradient(
    circ: Ansatz,
    thetas: jax.Array,
    x: jax.Array,
    vh_y: jax.Array,
    tail: int,
    block_range: Tuple[int, int],
    front_layer: bool,
) -> jax.Array:
    from .statevector import structure_period

    # One application of V only — the value engines loop circuit_power
    # times, so power > 1 would silently give a mismatched gradient (the
    # reference pins power == 1: parametric_circuit.py:136-141).
    assert circ.circuit_power == 1, "analytic gradient requires circuit_power == 1"
    dtype = x.dtype
    nb = circ.num_blocks
    tpb = circ.tpb
    thetas = thetas.astype(jnp.float64 if dtype == jnp.complex128 else jnp.float32)
    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)

    wz = jnp.stack([x, vh_y])
    wz, grad1q = _front_cosweep(circ, wz, thetas1q, front_layer, tail)

    # Per-block inside-range mask (static numpy -> constant folded).
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    pattern = [(int(circ.blocks[0, k]), int(circ.blocks[1, k])) for k in range(nb)]
    trot = circ.is_trotterized

    def step(k_local, wz_, tht, mask):
        c, t = pattern[k_local]
        return _block_cosweep_step(
            circ,
            wz_,
            tht,
            mask,
            c,
            t,
            trot and (k_local % 3 == 0),
            trot and (k_local % 3 == 2),
            tail,
        )

    # Main blocks: scan over full periods, unroll the remainder.
    p = structure_period(circ)
    grad_chunks = []
    if nb > 0:
        reps = nb // p if p else 0
        if p and reps >= 2:
            th_chunks = thetas2q[: reps * p].reshape(reps, p, tpb)
            m_chunks = masks[: reps * p].reshape(reps, p)

            def body(wz_, xs):
                th_, m_ = xs
                dots = []
                for k in range(p):
                    wz_, d = step(k, wz_, th_[k], m_[k])
                    dots.append(d)
                return wz_, jnp.stack(dots)

            wz, scanned = jax.lax.scan(body, wz, (th_chunks, m_chunks))
            grad_chunks.append(scanned.reshape(reps * p, tpb))
            done = reps * p
        else:
            done = 0
        rem_dots = []
        for k in range(done, nb):
            wz, d = step(k, wz, thetas2q[k], masks[k])
            rem_dots.append(d)
        if rem_dots:
            grad_chunks.append(jnp.stack(rem_dots))

    grad2q = (
        jnp.concatenate(grad_chunks, axis=0)
        if grad_chunks
        else jnp.zeros((0, tpb), dtype)
    )

    # 2nd-order Trotter: trailing half-layer shares the leading half-layer's
    # parameters; its dots accumulate into rows [0:half).
    half = circ.half_layer_num_blocks if trot else 0
    if half:
        half_dots = []
        for k in range(half):
            wz, d = step(k, wz, thetas2q[k], masks[k])
            half_dots.append(d)
        grad2q = grad2q.at[:half].add(jnp.stack(half_dots))

    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


def grad_of_dot_product(
    circ: Ansatz,
    thetas,
    x_vec,
    vh_y_vec,
    *,
    block_range: Optional[Tuple[int, int]] = None,
    front_layer: bool = True,
) -> jax.Array:
    """Complex gradient of ``<V x, y> = <x, V† y>`` w.r.t. Θ (vector engine).

    ``vh_y_vec`` must already hold ``V† y`` (cached from the objective pass) —
    the same contract as the reference (core_operations.py:845-851).
    """
    block_range = (0, circ.num_blocks) if block_range is None else tuple(block_range)
    assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks
    return _dot_product_gradient(
        circ, jnp.asarray(thetas), as_device(x_vec), as_device(vh_y_vec), 1,
        block_range, bool(front_layer),
    )


def grad_of_matrix_dot_product(
    circ: Ansatz,
    thetas,
    x_mat,
    vh_y_mat,
    *,
    block_range: Optional[Tuple[int, int]] = None,
    front_layer: bool = True,
) -> jax.Array:
    """Complex gradient of ``<V X, Y>`` for matrices stacked in columns
    (cf. reference core_op_matrix.py:645-762)."""
    x_mat = as_device(x_mat)
    block_range = (0, circ.num_blocks) if block_range is None else tuple(block_range)
    assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks
    return _dot_product_gradient(
        circ, jnp.asarray(thetas), x_mat, as_device(vh_y_mat),
        int(x_mat.shape[-1]), block_range, bool(front_layer),
    )


# -----------------------------------------------------------------------------
# Autodiff cross-check path (tests + an alternative production gradient).
# -----------------------------------------------------------------------------


def dot_product(circ: Ansatz, thetas, x, y) -> jax.Array:
    """``<x | V(Θ)† | y>`` (complex scalar), via the appropriate engine."""
    x = as_device(x)
    if x.ndim == 1:
        return jnp.vdot(x, v_dagger_mul_vec(circ, thetas, y))
    return jnp.vdot(x, v_dagger_mul_mat(circ, thetas, y))


def grad_of_dot_product_autodiff(circ: Ansatz, thetas, x, y) -> jax.Array:
    """Complex gradient of ``<x, V† y>`` via JAX autodiff (reverse mode on the
    real and imaginary parts).  Independent cross-check of the co-sweep."""
    thetas = jnp.asarray(thetas)

    def re(th):
        return jnp.real(dot_product(circ, th, x, y))

    def im(th):
        return jnp.imag(dot_product(circ, th, x, y))

    return jax.grad(re)(thetas) + 1j * jax.grad(im)(thetas)
