"""Analytic co-sweep gradient of ``<lvec | V† | phi>`` in MPS form.

TPU-native counterpart of the reference ``fast_dot_gradient``
(``/root/reference/aqc_research/mps_dot_objective.py:41-242``).  The reference
implements every per-gate step as a FULL Qiskit-Aer circuit re-simulation
(set_matrix_product_state -> compose one gate -> rerun the C++ simulator,
mps_dot_objective.py:326-331) — the dominant overhead of its MPS path
(SURVEY.md §3.4).  Here each step is a local on-device tensor update:
1-qubit gates are O(chi^2) einsums, the entangler is one O(chi^3)
SVD-truncated pair update, and each parameter's derivative is one
transfer-matrix inner product ``0.5j * <P w | z>``.

Gate order, partial-gradient (``block_range``) semantics, the CP two-point
derivative workaround, and the 2nd-order Trotter half-layer accumulation all
match the reference exactly (verified against the dense co-sweep in tests).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..circuit.ansatz import Ansatz
from .mps import MPS, apply_1q_mps, apply_2q_mps, mps_dot, no_truncation_threshold


def _dot_pauli(pauli_mat, site: int, w: MPS, z: MPS) -> jax.Array:
    """``0.5j * <P @ w | z>`` (cf. reference dot_x/y/z,
    mps_dot_objective.py:471-516)."""
    return 0.5j * mps_dot(apply_1q_mps(w, pauli_mat, site), z)


def _apply_1q_both(w: MPS, z: MPS, gate, site: int):
    return apply_1q_mps(w, gate, site), apply_1q_mps(z, gate, site)


def _entangler_4x4_lo_hi(circ: Ansatz, tht, dtype, ctrl: int, targ: int, shift=0.0):
    """Entangler 4x4 reordered into (lo, hi) site order for the MPS update."""
    if circ.entangler == "cp":
        mat = G.controlled(G.phase(tht[4] + shift, dtype), dtype)
    elif circ.entangler == "cz":
        mat = G.controlled(G.z(dtype), dtype)
    else:
        mat = G.controlled(G.x(dtype), dtype)
    g = mat.reshape(2, 2, 2, 2)
    if ctrl > targ:  # (ctrl,targ) = (hi,lo) -> (lo,hi)
        g = jnp.transpose(g, (1, 0, 3, 2))
    return g.reshape(4, 4)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _fast_dot_gradient_impl(
    circ: Ansatz,
    thetas: jax.Array,
    lvec: MPS,
    vh_phi: MPS,
    trunc_thr: float,
    block_range: Tuple[int, int],
    front_layer: bool,
) -> jax.Array:
    dtype = lvec.gammas.dtype
    n = circ.num_qubits
    nb = circ.num_blocks
    tpb = circ.tpb
    cp = circ.entangler == "cp"
    rs_fn = G.rx if circ.entangler == "cx" else G.rz
    s_mat = G.x(dtype) if circ.entangler == "cx" else G.z(dtype)
    y_mat, z_mat = G.y(dtype), G.z(dtype)
    trot = circ.is_trotterized

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    w, z = lvec, vh_phi

    zero = jnp.zeros((), dtype)
    grad1q_rows = []
    for q in range(n):
        t = thetas1q[q]
        w, z = _apply_1q_both(w, z, G.rz(t[2], dtype), q)
        d2 = _dot_pauli(z_mat, q, w, z) if front_layer else zero
        w, z = _apply_1q_both(w, z, G.ry(t[1], dtype), q)
        d1 = _dot_pauli(y_mat, q, w, z) if front_layer else zero
        w, z = _apply_1q_both(w, z, G.rz(t[0], dtype), q)
        d0 = _dot_pauli(z_mat, q, w, z) if front_layer else zero
        grad1q_rows.append(jnp.stack([d0, d1, d2]))
    grad1q = jnp.stack(grad1q_rows)

    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    half = circ.half_layer_num_blocks if trot else 0
    grad2q = jnp.zeros((nb, tpb), dtype)

    for i in range(nb + half):
        k = i % nb
        ctrl = int(circ.blocks[0, k])
        targ = int(circ.blocks[1, k])
        lo = min(ctrl, targ)
        assert abs(ctrl - targ) == 1, "MPS gradient expects nearest-neighbour blocks"
        t = thetas2q[k]
        mask = masks[k]

        if trot and i % 3 == 0:
            w, z = _apply_1q_both(w, z, G.rz(-np.pi / 2, dtype), ctrl)

        ent = _entangler_4x4_lo_hi(circ, t, dtype, ctrl, targ)
        z = apply_2q_mps(z, ent, lo, trunc_thr=trunc_thr)
        dots = []
        if cp:
            # CP derivative is not unitary-proportional: use the two-point
            # difference of shifted CP gates (mps_dot_objective.py:186-196).
            ent2 = _entangler_4x4_lo_hi(circ, t, dtype, ctrl, targ, shift=np.pi)
            w2 = apply_2q_mps(w, ent2, lo, trunc_thr=trunc_thr)
            w = apply_2q_mps(w, ent, lo, trunc_thr=trunc_thr)
            cp_w_z = mps_dot(w, z)
            cp_w_z2 = mps_dot(w2, z)
            d4 = mask * (-0.5j) * (cp_w_z - cp_w_z2)
        else:
            w = apply_2q_mps(w, ent, lo, trunc_thr=trunc_thr)

        w, z = _apply_1q_both(w, z, G.ry(t[0], dtype), ctrl)
        d0 = mask * _dot_pauli(y_mat, ctrl, w, z)
        w, z = _apply_1q_both(w, z, G.rz(t[1], dtype), ctrl)
        d1 = mask * _dot_pauli(z_mat, ctrl, w, z)
        w, z = _apply_1q_both(w, z, G.ry(t[2], dtype), targ)
        d2 = mask * _dot_pauli(y_mat, targ, w, z)
        w, z = _apply_1q_both(w, z, rs_fn(t[3], dtype), targ)
        d3 = mask * _dot_pauli(s_mat, targ, w, z)

        if trot and i % 3 == 2:
            w, z = _apply_1q_both(w, z, G.rz(np.pi / 2, dtype), targ)

        dots = [d0, d1, d2, d3] + ([d4] if cp else [])
        grad2q = grad2q.at[k].add(jnp.stack(dots))

    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


def fast_dot_gradient(
    circ: Ansatz,
    thetas,
    lvec: MPS,
    vh_phi: MPS,
    *,
    trunc_thr: float = no_truncation_threshold(),
    block_range: Optional[Tuple[int, int]] = None,
    front_layer: bool = True,
) -> jax.Array:
    """Complex gradient of ``<lvec | V† | phi>`` with MPS states.

    ``vh_phi`` must already hold ``V† phi`` (cached from the objective pass)
    — the same contract as the reference (mps_dot_objective.py:63-68).
    """
    block_range = (0, circ.num_blocks) if block_range is None else tuple(block_range)
    assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks
    return _fast_dot_gradient_impl(
        circ,
        jnp.asarray(thetas),
        lvec,
        vh_phi,
        float(trunc_thr),
        block_range,
        bool(front_layer),
    )
