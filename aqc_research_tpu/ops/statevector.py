"""Statevector / dense-matrix circuit engine (pure JAX, jit-compiled).

TPU-native counterpart of the reference's sparsity-pattern kernels
(``/root/reference/aqc_research/core_operations.py:46-821`` and
``core_op_matrix.py:32-643``).  Design differences, deliberate:

* **No in-place workspaces** — everything is functional; XLA fuses the
  elementwise chains and reuses buffers itself.
* **Fused unit blocks** — the reference applies an entangler plus four 1-qubit
  gates per block as five sparse passes over the state (five HBM round
  trips); here each unit block (including the Trotter ±pi/2 Rz framing) is
  folded into a single 4x4 gate applied in one pass.  The 4x4 gates for all
  blocks are built in one vectorized sweep over Θ.
* **scan over repeated structure** — layered ansatze (spin layout, Trotter
  triplets) have a periodic block pattern; the engine detects the period and
  runs ``lax.scan`` over the repetitions so compile time stays O(period), not
  O(depth).
* **Uniform little-endian qubit indexing** — qubit ``q`` is bit ``q`` of the
  basis-state index (Qiskit convention).  The reference reaches the same
  convention via its internal ``bit2bit_transform`` flip
  (core_operations.py:34-43); here there is nothing to flip.

Shapes: a state is ``(..., 2^n)``; a matrix right-hand side is ``(2^n, m)``.
Both are handled by the same kernels through the ``tail`` parameter: in the
row-major flattening of ``(2^n, m)``, bit ``q`` of the row index sits at
weight ``2^q * m`` — the same reshape trick the reference uses
(core_op_matrix.py:56).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..utils import as_device
from ..circuit.ansatz import Ansatz

# -----------------------------------------------------------------------------
# Gate-application primitives.
# -----------------------------------------------------------------------------


def apply_1q(arr: jax.Array, gate: jax.Array, qubit: int, tail: int = 1) -> jax.Array:
    """Applies a 2x2 gate at ``qubit`` to a state (``tail=1``) or to the rows
    of a ``(2^n, m)`` matrix (``tail=m``).  Leading batch dims are allowed.

    This is the XLA-friendly form of the reference reshape-slice kernel
    (core_operations.py:46-119 / core_op_matrix.py:392-427): reshape so the
    qubit's bit becomes its own axis, then contract with the gate.
    """
    shape = arr.shape
    m = arr.reshape(-1, 2, (2**qubit) * tail)
    m = jnp.einsum("ij,ajb->aib", gate.astype(arr.dtype), m)
    return m.reshape(shape)


def apply_2q(
    arr: jax.Array, gate4: jax.Array, ctrl: int, targ: int, tail: int = 1
) -> jax.Array:
    """Applies a 4x4 gate given in (ctrl, targ) index order at arbitrary
    (possibly non-adjacent) qubits.  One pass over the state."""
    shape = arr.shape
    q_hi, q_lo = (ctrl, targ) if ctrl > targ else (targ, ctrl)
    g = gate4.reshape(2, 2, 2, 2)
    if ctrl < targ:  # reorder gate axes to (hi, lo)
        g = jnp.transpose(g, (1, 0, 3, 2))
    mid = 2 ** (q_hi - q_lo - 1)
    m = arr.reshape(-1, 2, mid, 2, (2**q_lo) * tail)
    m = jnp.einsum("hlHL,aHbLc->ahblc", g.astype(arr.dtype), m)
    return m.reshape(shape)


def pauli_dot(
    w: jax.Array, z: jax.Array, pauli: str, qubit: int, tail: int = 1
) -> jax.Array:
    """Computes ``0.5j * <P @ w | z>`` for P in {X, Y, Z} at ``qubit``.

    The per-parameter derivative primitive of the analytic co-sweep gradient
    (reference ``dot_x/y/z``, core_operations.py:267-351).
    """
    shape = w.shape
    h = (2**qubit) * tail
    wm = w.reshape(-1, 2, h)
    zm = z.reshape(-1, 2, h)
    if pauli == "x":
        # <X w|z> = conj(w1)·z0 + conj(w0)·z1
        val = jnp.sum(jnp.conj(wm[:, 1]) * zm[:, 0]) + jnp.sum(
            jnp.conj(wm[:, 0]) * zm[:, 1]
        )
        return 0.5j * val
    if pauli == "y":
        # <Y w|z> = conj(-i w1)·z0 + conj(i w0)·z1 = i(conj(w1) z0 - conj(w0) z1)
        val = jnp.sum(jnp.conj(wm[:, 1]) * zm[:, 0]) - jnp.sum(
            jnp.conj(wm[:, 0]) * zm[:, 1]
        )
        return -0.5 * val  # 0.5j * i * (...)  ==  -0.5 * (...)
    if pauli == "z":
        val = jnp.sum(jnp.conj(wm[:, 0]) * zm[:, 0]) - jnp.sum(
            jnp.conj(wm[:, 1]) * zm[:, 1]
        )
        return 0.5j * val
    raise ValueError(f"unknown Pauli: {pauli}")


# -----------------------------------------------------------------------------
# Folded block gates.
# -----------------------------------------------------------------------------


def _swappable_gate(entangler: str):
    """Rs — the 1-qubit gate on the target that commutes with the entangler:
    Rx for CX, Rz for CZ/CP (cf. core_operations.py:651-668)."""
    return G.rx if entangler == "cx" else G.rz


def _entangler_gate(entangler: str, tht, dtype, dagger: bool):
    if entangler == "cp":
        angle = -tht[..., 4] if dagger else tht[..., 4]
        return G.controlled(G.phase(angle, dtype), dtype)
    if entangler == "cz":
        return G.controlled(G.z(dtype), dtype)
    return G.controlled(G.x(dtype), dtype)


def block_gates(circ: Ansatz, thetas2q: jax.Array, dtype, dagger: bool = False):
    """Builds the fused 4x4 gates of all unit blocks in one vectorized sweep.

    ``thetas2q``: (num_blocks, tpb).  Returns (num_blocks, 4, 4) in (ctrl,
    targ) index order.  Forward block = (C ⊗ T) @ E with C = Rz(t1)·Ry(t0),
    T = Rs(t3)·Ry(t2); dagger block = E† @ (C† ⊗ T†)  — cf. the reference's
    ``block_mul_vec`` structure flip (core_operations.py:354-419).

    For a Trotterized ansatz the triplet framing rotations Rz(∓pi/2)
    (core_operations.py:692-708) are folded into the first/last block gate of
    each triplet, so a triplet costs exactly 3 fused passes over the state.
    """
    rs = _swappable_gate(circ.entangler)
    t = thetas2q
    if dagger:
        c_mat = jnp.matmul(G.ry(-t[:, 0], dtype), G.rz(-t[:, 1], dtype))
        t_mat = jnp.matmul(G.ry(-t[:, 2], dtype), rs(-t[:, 3], dtype))
        ent = _entangler_gate(circ.entangler, t, dtype, dagger=True)
        blocks4 = jnp.matmul(ent, G.kron2(c_mat, t_mat))
    else:
        c_mat = jnp.matmul(G.rz(t[:, 1], dtype), G.ry(t[:, 0], dtype))
        t_mat = jnp.matmul(rs(t[:, 3], dtype), G.ry(t[:, 2], dtype))
        ent = _entangler_gate(circ.entangler, t, dtype, dagger=False)
        blocks4 = jnp.matmul(G.kron2(c_mat, t_mat), ent)

    if circ.is_trotterized and circ.num_blocks > 0:
        nb = thetas2q.shape[0]
        eye = G.eye2(dtype)
        rz_m = G.kron2(G.rz(-np.pi / 2, dtype), eye)  # on ctrl, triplet start
        rz_p = G.kron2(eye, G.rz(np.pi / 2, dtype))  # on targ, triplet end
        idx = np.arange(nb)
        start = jnp.asarray(idx % 3 == 0)[:, None, None]
        end = jnp.asarray(idx % 3 == 2)[:, None, None]
        if dagger:
            # V† reverses: end-framing Rz(-pi/2) on targ comes first, then the
            # dagger block, then start-framing Rz(pi/2) on ctrl.
            pre = jnp.where(end, jnp.matmul(blocks4, rz_p.conj().T), blocks4)
            blocks4 = jnp.where(start, jnp.matmul(rz_m.conj().T, pre), pre)
        else:
            pre = jnp.where(start, jnp.matmul(blocks4, rz_m), blocks4)
            blocks4 = jnp.where(end, jnp.matmul(rz_p, pre), pre)
    return blocks4


def front_gates(circ: Ansatz, thetas1q: jax.Array, dtype, dagger: bool = False):
    """Fused Rz·Ry·Rz front-layer gates, (num_qubits, 2, 2).

    Forward: Rz(t0)·Ry(t1)·Rz(t2); dagger: Rz(-t2)·Ry(-t1)·Rz(-t0)
    (cf. core_operations.py:670-677, 811-818)."""
    t = thetas1q
    if dagger:
        return jnp.matmul(
            jnp.matmul(G.rz(-t[:, 2], dtype), G.ry(-t[:, 1], dtype)),
            G.rz(-t[:, 0], dtype),
        )
    return jnp.matmul(
        jnp.matmul(G.rz(t[:, 0], dtype), G.ry(t[:, 1], dtype)), G.rz(t[:, 2], dtype)
    )


# -----------------------------------------------------------------------------
# Structure periodicity (enables lax.scan over repeated layers).
# -----------------------------------------------------------------------------


def structure_period(circ: Ansatz) -> int:
    """Smallest block-pattern period ``p`` such that column ``k`` of the block
    structure equals column ``k mod p`` (and, for Trotterized ansatze,
    ``p % 3 == 0`` so the triplet framing stays aligned).  Returns
    ``num_blocks`` when no shorter period exists."""
    blocks = circ.blocks
    nb = circ.num_blocks
    if nb == 0:
        return 0
    for p in range(1, nb):
        if circ.is_trotterized and p % 3 != 0:
            continue
        if np.array_equal(blocks[:, p:], blocks[:, : nb - p]):
            return p
    return nb


def _split_periods(circ: Ansatz) -> Tuple[int, int, int]:
    """Returns (period, full_repeats, remainder)."""
    p = structure_period(circ)
    if p == 0:
        return 0, 0, 0
    return p, circ.num_blocks // p, circ.num_blocks % p


# -----------------------------------------------------------------------------
# Circuit application.
# -----------------------------------------------------------------------------


def _main_and_half_gates(circ: Ansatz, thetas: jax.Array, dtype, dagger: bool):
    """Returns ``(gates, pattern, half)`` — the fused 4x4 gates and (ctrl,
    targ) pattern of the main blocks, plus the number of implicit trailing
    half-layer blocks (2nd-order Trotter, parametric_circuit.py:276-297).
    The half-layer reuses ``gates[:half]`` and ``pattern[:half]``."""
    thetas2q = circ.subset2q(thetas)
    gates = block_gates(circ, thetas2q, dtype, dagger=dagger)
    half = circ.half_layer_num_blocks if circ.is_trotterized else 0
    pattern = [(int(circ.blocks[0, k]), int(circ.blocks[1, k])) for k in range(circ.num_blocks)]
    return gates, pattern, half


_MAX_FUSED_PAIRS = 3  # up to 3 disjoint unit blocks fuse into one 64x64 gate


def _plan_disjoint_groups(seq):
    """Greedily groups consecutive blocks for fusion.  Within a group:

    * blocks on the SAME adjacent pair multiply into one 4x4 (Trotter
      triplets: three blocks on one pair become one gate), and
    * blocks on DISJOINT pairs that tile a contiguous qubit span kron into
      one ``4^m x 4^m`` gate (m <= _MAX_FUSED_PAIRS) — one state pass per
      half-layer instead of one per block.

    Reordering consecutive blocks within a group is safe: same-pair gates
    keep their order (matrix product), and distinct pairs are disjoint, so
    their gates commute.  Returns a list of index-lists into ``seq``.
    """
    groups = []
    current: list = []
    current_pairs: set = set()

    def norm(pair):
        return (min(pair), max(pair))

    def span_ok(pairs):
        qs = sorted(q for p_ in pairs for q in p_)
        return qs == list(range(qs[0], qs[-1] + 1))

    for k, (c, t) in enumerate(seq):
        if abs(c - t) != 1:
            if current:
                groups.append(current)
                current, current_pairs = [], set()
            groups.append([k])
            continue
        pr = norm((c, t))
        if pr in current_pairs:
            current.append(k)  # same pair: fuse by matrix product
            continue
        trial_pairs = current_pairs | {pr}
        overlap = any(
            len(set(pr) & set(p_)) > 0 for p_ in current_pairs
        )
        if (
            current
            and not overlap
            and len(trial_pairs) <= _MAX_FUSED_PAIRS
            and span_ok(trial_pairs)
        ):
            current.append(k)
            current_pairs = trial_pairs
        else:
            if current:
                groups.append(current)
            current, current_pairs = [k], {pr}
    if current:
        groups.append(current)
    return groups


def _apply_group(state, gseq, seq, group, tail):
    """Applies one fused group (same-pair products + disjoint-pair kron)."""
    if len(group) == 1:
        c, t = seq[group[0]]
        return apply_2q(state, gseq[group[0]], c, t, tail)

    # Accumulate per-pair 4x4 products in (hi, lo) index order.
    per_pair: dict = {}
    order: list = []
    for k in group:
        c, t = seq[k]
        lo = min(c, t)
        g = gseq[k].reshape(2, 2, 2, 2)
        if c < t:  # (ctrl,targ) = (lo,hi) -> reorder to (hi,lo)
            g = jnp.transpose(g, (1, 0, 3, 2))
        g = g.reshape(4, 4)
        if lo in per_pair:
            per_pair[lo] = jnp.matmul(g, per_pair[lo])  # later gate on the left
        else:
            per_pair[lo] = g
            order.append(lo)

    if len(per_pair) == 1:
        lo = order[0]
        combined = per_pair[lo]
        shape = state.shape
        m = state.reshape(-1, 4, (2**lo) * tail)
        m = jnp.einsum("ij,ajb->aib", combined.astype(state.dtype), m)
        return m.reshape(shape)

    items = sorted(per_pair.items(), key=lambda x: -x[0])  # highest pair first
    combined = items[0][1]
    for _, g in items[1:]:
        combined = jnp.kron(combined, g)
    span_lo = items[-1][0]
    dim = 4 ** len(items)
    shape = state.shape
    m = state.reshape(-1, dim, (2**span_lo) * tail)
    m = jnp.einsum("ij,ajb->aib", combined.astype(state.dtype), m)
    return m.reshape(shape)


def _apply_block_sequence(state, gates, pattern, tail, reverse: bool):
    """Applies a sequence of 4x4 gates along ``pattern``: consecutive
    disjoint adjacent pairs fuse into single 4^m-dim contractions (one state
    pass for a whole half-layer instead of one per block), and lax.scan runs
    over maximal repeated sub-patterns to bound compile time."""
    total = len(pattern)
    if total == 0:
        return state
    order = range(total - 1, -1, -1) if reverse else range(total)
    idx = list(order)

    # Find the longest prefix-period of the *ordered* pattern for scanning.
    seq = [pattern[i] for i in idx]
    p = total
    for cand in range(1, total):
        if total % cand == 0 and all(
            seq[k] == seq[k % cand] for k in range(total)
        ):
            p = cand
            break

    gseq = gates[jnp.asarray(idx)]
    if p == total or total // p < 2:
        for group in _plan_disjoint_groups(seq):
            state = _apply_group(state, gseq, seq, group, tail)
        return state

    reps = total // p
    chunks = gseq.reshape((reps, p) + gseq.shape[1:])
    period_seq = seq[:p]
    period_groups = _plan_disjoint_groups(period_seq)

    def body(s, gs):
        for group in period_groups:
            s = _apply_group(s, gs, period_seq, group, tail)
        return s, None

    state, _ = jax.lax.scan(body, state, chunks)
    return state


@partial(jax.jit, static_argnums=(0, 3))
def _v_mul(circ: Ansatz, thetas: jax.Array, arr: jax.Array, tail: int) -> jax.Array:
    """arr <- V(Θ) @ arr  (functional)."""
    dtype = arr.dtype
    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=False)
    for _ in range(circ.circuit_power):
        for q in range(circ.num_qubits):
            arr = apply_1q(arr, f1q[q], q, tail)
        gates, pattern, half = _main_and_half_gates(circ, thetas, dtype, dagger=False)
        arr = _apply_block_sequence(arr, gates, pattern, tail, reverse=False)
        if half:  # implicit trailing half-layer == leading half-layer
            arr = _apply_block_sequence(
                arr, gates[:half], pattern[:half], tail, reverse=False
            )
    return arr


@partial(jax.jit, static_argnums=(0, 3))
def _v_dagger_mul(circ: Ansatz, thetas: jax.Array, arr: jax.Array, tail: int) -> jax.Array:
    """arr <- V(Θ)† @ arr  (functional)."""
    dtype = arr.dtype
    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=True)
    for _ in range(circ.circuit_power):
        gates, pattern, half = _main_and_half_gates(circ, thetas, dtype, dagger=True)
        if half:  # dagger applies the trailing half-layer first, reversed
            arr = _apply_block_sequence(
                arr, gates[:half], pattern[:half], tail, reverse=True
            )
        arr = _apply_block_sequence(arr, gates, pattern, tail, reverse=True)
        for q in range(circ.num_qubits):
            arr = apply_1q(arr, f1q[q], q, tail)
    return arr


def v_mul_vec(circ: Ansatz, thetas, vec) -> jax.Array:
    """``V @ vec`` — functional counterpart of reference ``v_mul_vec``
    (core_operations.py:606-710); no out/workspace arguments."""
    vec = as_device(vec)
    return _v_mul(circ, jnp.asarray(thetas), vec, 1)


def v_dagger_mul_vec(circ: Ansatz, thetas, vec) -> jax.Array:
    """``V† @ vec`` — cf. reference ``v_dagger_mul_vec``
    (core_operations.py:713-820)."""
    vec = as_device(vec)
    return _v_dagger_mul(circ, jnp.asarray(thetas), vec, 1)


def v_mul_mat(circ: Ansatz, thetas, mat) -> jax.Array:
    """``V @ mat`` for a ``(2^n, m)`` matrix — cf. reference ``v_mul_mat``
    (core_op_matrix.py:480-559)."""
    mat = as_device(mat)
    return _v_mul(circ, jnp.asarray(thetas), mat, int(mat.shape[-1]))


def v_dagger_mul_mat(circ: Ansatz, thetas, mat) -> jax.Array:
    """``V† @ mat`` — cf. reference ``v_dagger_mul_mat``
    (core_op_matrix.py:562-642)."""
    mat = as_device(mat)
    return _v_dagger_mul(circ, jnp.asarray(thetas), mat, int(mat.shape[-1]))


def ansatz_to_matrix(circ: Ansatz, thetas) -> jax.Array:
    """Dense circuit matrix V(Θ) — functional counterpart of the reference's
    ``ansatz_to_numpy_fast`` / ``ansatz_to_numpy_trotter``
    (circuit_transform.py:273-390); supports both generic and Trotter ansatze."""
    from ..config import complex_dtype

    eye = jnp.eye(circ.dimension, dtype=complex_dtype())
    return v_mul_mat(circ, thetas, eye)
