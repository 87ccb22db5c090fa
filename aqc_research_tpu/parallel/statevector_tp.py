"""Explicitly-sharded statevector circuit engine (shard_map + ppermute).

The constraint-only TP path (shard the state, let the SPMD partitioner place
collectives) measurably fails for this workload: the partitioner regathers
the full state around the gate reshapes (~10 all-gathers per block at n=20,
tp=8 — see tests/test_parallel.py::TestShardedStatevector).  This module is
the TPU-native distributed-statevector design instead, the pattern the
scaling-book recipe reduces to when the operator is a quantum gate:

* the ``2^n`` state is sharded over its single axis across ``tp`` devices —
  the TOP ``log2(tp)`` qubits index the shard, the rest are local;
* gates on local qubits run the unmodified local kernels (zero
  communication);
* a gate touching a sharded qubit exchanges the paired shard-halves with ONE
  ``jax.lax.ppermute`` over ICI (two-qubit gates with both qubits sharded
  need three), then combines them locally — bandwidth-optimal: exactly the
  state bytes that must move, and never a full gather.

Replaces: the role of the reference's (nonexistent) distributed backend —
SURVEY.md §2.4 "TP" row; gate kernels mirror ops/statevector.py
(core_operations.py:46-119 reshape kernels).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..circuit.ansatz import Ansatz
from ..ops.statevector import (
    _main_and_half_gates,
    apply_1q,
    apply_2q,
    front_gates,
)
from .mesh import num_local_qubits


def _exchange(local, sb: int, axis: str, tp: int):
    """Swaps shard-halves with the partner differing in shard-index bit sb."""
    perm = [(i, i ^ (1 << sb)) for i in range(tp)]
    return jax.lax.ppermute(local, axis, perm)


def _my_bit(sb: int, axis: str):
    return (jax.lax.axis_index(axis) >> sb) & 1


def _apply_1q_sharded(local, gate, sb: int, axis: str, tp: int):
    """1q gate on a sharded qubit: one ppermute + local combine."""
    other = _exchange(local, sb, axis, tp)
    b = _my_bit(sb, axis)
    g = gate
    gbb = jnp.where(b == 0, g[0, 0], g[1, 1])
    gbo = jnp.where(b == 0, g[0, 1], g[1, 0])
    return gbb * local + gbo * other


def _apply_2q_mixed(local, g4hl, q_lo: int, sb_hi: int, axis: str, tp: int, tail: int):
    """2q gate with the high qubit sharded, low qubit local; ``g4hl`` is the
    4x4 reshaped (2,2,2,2) in (hi_out, lo_out, hi_in, lo_in) axis order."""
    other = _exchange(local, sb_hi, axis, tp)
    b = _my_bit(sb_hi, axis)
    s0 = jnp.where(b == 0, local, other)  # the hi=0 shard-half
    s1 = jnp.where(b == 0, other, local)  # the hi=1 shard-half
    g_b = jnp.where(b == 0, g4hl[0], g4hl[1])  # (lo_out, hi_in, lo_in)
    return apply_1q(s0, g_b[:, 0, :], q_lo, tail) + apply_1q(
        s1, g_b[:, 1, :], q_lo, tail
    )


def _apply_2q_both_sharded(local, g4hl, sb_hi: int, sb_lo: int, axis: str, tp: int):
    """2q gate with both qubits sharded: three ppermutes + local combine."""
    o_l = _exchange(local, sb_lo, axis, tp)
    o_h = _exchange(local, sb_hi, axis, tp)
    o_hl = _exchange(o_l, sb_hi, axis, tp)
    bh = _my_bit(sb_hi, axis)
    bl = _my_bit(sb_lo, axis)

    # Row (bh, bl) of the gate, selected by this shard's bits.
    g_row = jnp.where(
        bh == 0,
        jnp.where(bl == 0, g4hl[0, 0], g4hl[0, 1]),
        jnp.where(bl == 0, g4hl[1, 0], g4hl[1, 1]),
    )  # (hi_in, lo_in)

    out = jnp.zeros_like(local)
    for h in (0, 1):
        for l in (0, 1):
            # The shard-half whose (hi, lo) bits equal (h, l), from my view.
            s_hl = jnp.where(
                bh == h,
                jnp.where(bl == l, local, o_l),
                jnp.where(bl == l, o_h, o_hl),
            )
            out = out + g_row[h, l] * s_hl
    return out


def _gate_4hl(gate4, ctrl: int, targ: int):
    """Reorders a (ctrl, targ)-ordered 4x4 into (hi, lo) (2,2,2,2) axes."""
    g = gate4.reshape(2, 2, 2, 2)
    if ctrl < targ:  # (ctrl,targ) = (lo,hi) -> reorder to (hi,lo)
        g = jnp.transpose(g, (1, 0, 3, 2))
    return g


def _apply_block_tp(local, gate4, ctrl, targ, n_local, axis, tp, tail):
    q_hi, q_lo = max(ctrl, targ), min(ctrl, targ)
    if q_hi < n_local:
        return apply_2q(local, gate4, ctrl, targ, tail)
    g = _gate_4hl(gate4, ctrl, targ)
    if q_lo >= n_local:
        assert tail == 1, "matrix tail with both qubits sharded is unsupported"
        return _apply_2q_both_sharded(
            local, g, q_hi - n_local, q_lo - n_local, axis, tp
        )
    return _apply_2q_mixed(local, g, q_lo, q_hi - n_local, axis, tp, tail)


@lru_cache(maxsize=64)
def _build_tp_apply(circ: Ansatz, mesh: Mesh, axis: str, dagger: bool, tail: int):
    tp = mesh.shape[axis]
    n_local, _ = num_local_qubits(circ.num_qubits, tp)

    def fn(thetas, state):
        dtype = state.dtype
        f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=dagger)
        gates, pattern, half = _main_and_half_gates(circ, thetas, dtype, dagger)

        def seq_indices():
            nb = len(pattern)
            main = list(range(nb - 1, -1, -1) if dagger else range(nb))
            half_idx = list(range(half - 1, -1, -1) if dagger else range(half))
            return main, half_idx

        def local_fn(f1q, gates, local):
            def front(local):
                for q in range(circ.num_qubits):
                    if q < n_local:
                        local = apply_1q(local, f1q[q], q, tail)
                    else:
                        assert tail == 1
                        local = _apply_1q_sharded(
                            local, f1q[q], q - n_local, axis, tp
                        )
                return local

            main, half_idx = seq_indices()

            def blocks(local, idx):
                for k in idx:
                    c, t = pattern[k]
                    local = _apply_block_tp(
                        local, gates[k], c, t, n_local, axis, tp, tail
                    )
                return local

            for _ in range(circ.circuit_power):
                if dagger:
                    local = blocks(local, half_idx)
                    local = blocks(local, main)
                    local = front(local)
                else:
                    local = front(local)
                    local = blocks(local, main)
                    local = blocks(local, half_idx)
            return local

        spec = P(*([None] * (state.ndim - 1) + [axis]))
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), spec),
            out_specs=spec,
        )(f1q, gates, state)

    return jax.jit(fn)


def v_mul_vec_tp(circ: Ansatz, thetas, state, mesh: Mesh, axis: str = "tp"):
    """``V @ state`` on a tp-sharded statevector — zero all-gathers; one
    ppermute per sharded-qubit touch (three when both block qubits are
    sharded).  ``state``: (2^n,) sharded over ``axis``."""
    return _build_tp_apply(circ, mesh, axis, False, 1)(jnp.asarray(thetas), state)


def v_dagger_mul_vec_tp(circ: Ansatz, thetas, state, mesh: Mesh, axis: str = "tp"):
    """``V† @ state`` on a tp-sharded statevector."""
    return _build_tp_apply(circ, mesh, axis, True, 1)(jnp.asarray(thetas), state)


def pauli_dot_tp(w, z, pauli: str, qubit: int, mesh: Mesh, axis: str = "tp"):
    """``0.5j * <P@w|z>`` on tp-sharded states (psum over the mesh axis)."""
    from ..ops.statevector import pauli_dot

    n = int(np.log2(w.shape[-1]))
    tp = mesh.shape[axis]
    n_local, _ = num_local_qubits(n, tp)

    def local_fn(wl, zl):
        if qubit < n_local:
            val = pauli_dot(wl, zl, pauli, qubit)
        else:
            sb = qubit - n_local
            b = _my_bit(sb, axis)
            if pauli == "x":
                other = _exchange(wl, sb, axis, tp)
                val = 0.5j * jnp.sum(jnp.conj(other) * zl)
            elif pauli == "y":
                other = _exchange(wl, sb, axis, tp)
                # (Y w) at my half = Y[b, 1-b]·other = (-i if b==0 else +i)·other
                coeff = jnp.where(b == 0, -1j, 1j).astype(zl.dtype)
                val = 0.5j * jnp.sum(jnp.conj(coeff * other) * zl)
            else:  # z
                sign = jnp.where(b == 0, 1.0, -1.0).astype(zl.dtype)
                val = 0.5j * jnp.sum(sign * jnp.conj(wl) * zl)
        return jax.lax.psum(val, axis)

    spec = P(axis)
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )(w, z)
