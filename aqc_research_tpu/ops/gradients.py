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
    w,
    z,
    tht,
    mask,
    ctrl: int,
    targ: int,
    frame_start: bool,
    frame_end: bool,
    tail: int,
):
    """One unit-block step of the co-sweep; returns (w, z, dots[tpb]).

    Gate order matches reference core_operations.py:962-1017: optional
    Rz(-pi/2) framing, entangler (+ CP derivative), Ry/Rz on control,
    Ry/Rs on target, optional Rz(pi/2) framing.
    """
    dtype = w.dtype
    cp = circ.entangler == "cp"
    rs = G.rx if circ.entangler == "cx" else G.rz
    s_char = "x" if circ.entangler == "cx" else "z"

    if frame_start:
        rzm = G.rz(-np.pi / 2, dtype)
        w = apply_1q(w, rzm, ctrl, tail)
        z = apply_1q(z, rzm, ctrl, tail)

    ent = _entangler_4x4(circ, tht, dtype)
    z = apply_2q(z, ent, ctrl, targ, tail)
    if cp:
        dw = apply_2q(w, _cp_derv_4x4(tht[4], dtype), ctrl, targ, tail)
        d4 = mask * jnp.vdot(dw, z)
    w = apply_2q(w, ent, ctrl, targ, tail)

    g = G.ry(tht[0], dtype)
    w = apply_1q(w, g, ctrl, tail)
    z = apply_1q(z, g, ctrl, tail)
    d0 = mask * pauli_dot(w, z, "y", ctrl, tail)

    g = G.rz(tht[1], dtype)
    w = apply_1q(w, g, ctrl, tail)
    z = apply_1q(z, g, ctrl, tail)
    d1 = mask * pauli_dot(w, z, "z", ctrl, tail)

    g = G.ry(tht[2], dtype)
    w = apply_1q(w, g, targ, tail)
    z = apply_1q(z, g, targ, tail)
    d2 = mask * pauli_dot(w, z, "y", targ, tail)

    g = rs(tht[3], dtype)
    w = apply_1q(w, g, targ, tail)
    z = apply_1q(z, g, targ, tail)
    d3 = mask * pauli_dot(w, z, s_char, targ, tail)

    if frame_end:
        rzp = G.rz(np.pi / 2, dtype)
        w = apply_1q(w, rzp, targ, tail)
        z = apply_1q(z, rzp, targ, tail)

    dots = [d0, d1, d2, d3] + ([d4] if cp else [])
    return w, z, jnp.stack(dots)


def _front_cosweep(circ: Ansatz, w, z, thetas1q, front_layer: bool, tail: int):
    """Front Rz·Ry·Rz layer of the co-sweep (core_operations.py:918-949)."""
    dtype = w.dtype
    n = circ.num_qubits
    grads = []
    zero = jnp.zeros((), dtype)
    for q in range(n):
        t = thetas1q[q]
        g = G.rz(t[2], dtype)
        w = apply_1q(w, g, q, tail)
        z = apply_1q(z, g, q, tail)
        d2 = pauli_dot(w, z, "z", q, tail) if front_layer else zero

        g = G.ry(t[1], dtype)
        w = apply_1q(w, g, q, tail)
        z = apply_1q(z, g, q, tail)
        d1 = pauli_dot(w, z, "y", q, tail) if front_layer else zero

        g = G.rz(t[0], dtype)
        w = apply_1q(w, g, q, tail)
        z = apply_1q(z, g, q, tail)
        d0 = pauli_dot(w, z, "z", q, tail) if front_layer else zero
        grads.append(jnp.stack([d0, d1, d2]))
    return w, z, jnp.stack(grads)  # (n, 3)


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

    dtype = x.dtype
    nb = circ.num_blocks
    tpb = circ.tpb
    thetas = thetas.astype(jnp.float64 if dtype == jnp.complex128 else jnp.float32)
    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)

    w, z = x, vh_y
    w, z, grad1q = _front_cosweep(circ, w, z, thetas1q, front_layer, tail)

    # Per-block inside-range mask (static numpy -> constant folded).
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    pattern = [(int(circ.blocks[0, k]), int(circ.blocks[1, k])) for k in range(nb)]
    trot = circ.is_trotterized

    def step(k_local, w, z, tht, mask):
        c, t = pattern[k_local]
        return _block_cosweep_step(
            circ,
            w,
            z,
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

            def body(carry, xs):
                w_, z_ = carry
                th_, m_ = xs
                dots = []
                for k in range(p):
                    w_, z_, d = _block_cosweep_step(
                        circ,
                        w_,
                        z_,
                        th_[k],
                        m_[k],
                        pattern[k][0],
                        pattern[k][1],
                        trot and (k % 3 == 0),
                        trot and (k % 3 == 2),
                        tail,
                    )
                    dots.append(d)
                return (w_, z_), jnp.stack(dots)

            (w, z), scanned = jax.lax.scan(body, (w, z), (th_chunks, m_chunks))
            grad_chunks.append(scanned.reshape(reps * p, tpb))
            done = reps * p
        else:
            done = 0
        rem_dots = []
        for k in range(done, nb):
            w, z, d = step(k, w, z, thetas2q[k], masks[k])
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
            w, z, d = step(k, w, z, thetas2q[k], masks[k])
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
        circ, jnp.asarray(thetas), jnp.asarray(x_vec), jnp.asarray(vh_y_vec), 1,
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
    x_mat = jnp.asarray(x_mat)
    block_range = (0, circ.num_blocks) if block_range is None else tuple(block_range)
    assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks
    return _dot_product_gradient(
        circ, jnp.asarray(thetas), x_mat, jnp.asarray(vh_y_mat),
        int(x_mat.shape[-1]), block_range, bool(front_layer),
    )


# -----------------------------------------------------------------------------
# Autodiff cross-check path (tests + an alternative production gradient).
# -----------------------------------------------------------------------------


def dot_product(circ: Ansatz, thetas, x, y) -> jax.Array:
    """``<x | V(Θ)† | y>`` (complex scalar), via the appropriate engine."""
    x = jnp.asarray(x)
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
