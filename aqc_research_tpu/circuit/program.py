"""Minimal gate-program IR — the framework's replacement for Qiskit circuits.

The reference passes ``qiskit.QuantumCircuit`` objects around for everything
that is not the parametric ansatz: Trotter circuits, initial-state preparation,
flip states (``circuit_transform.py:70-101``, ``trotter.py:317-410``).  Here a
circuit is a hashable tuple of :class:`Gate` records — static compile-time
data for the jitted appliers, just like the ansatz IR.

Supported gate set: x, y, z, h, rx, ry, rz, p (phase), cx, cz, cp.
Qubit indices are little-endian (bit q of the basis index), as everywhere in
this framework.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import complex_dtype
from . import gates as G

_ONE_QUBIT = ("x", "y", "z", "h", "rx", "ry", "rz", "p")
_TWO_QUBIT = ("cx", "cz", "cp")


@dataclasses.dataclass(frozen=True)
class Gate:
    """One gate application: ``name`` on ``qubits`` with optional ``param``."""

    name: str
    qubits: Tuple[int, ...]
    param: Optional[float] = None

    def __post_init__(self):
        if self.name in _ONE_QUBIT:
            assert len(self.qubits) == 1, self
        elif self.name in _TWO_QUBIT:
            assert len(self.qubits) == 2, self
        else:
            raise ValueError(f"unsupported gate: {self.name}")


GateProgram = Tuple[Gate, ...]


class ProgramBuilder:
    """Convenience builder mirroring the QuantumCircuit mutation API."""

    def __init__(self, num_qubits: int):
        self.num_qubits = int(num_qubits)
        self._gates: list = []

    def _add(self, name, qubits, param=None):
        self._gates.append(Gate(name, tuple(int(q) for q in qubits), param))
        return self

    def x(self, q):
        return self._add("x", (q,))

    def y(self, q):
        return self._add("y", (q,))

    def z(self, q):
        return self._add("z", (q,))

    def h(self, q):
        return self._add("h", (q,))

    def rx(self, angle, q):
        return self._add("rx", (q,), float(angle))

    def ry(self, angle, q):
        return self._add("ry", (q,), float(angle))

    def rz(self, angle, q):
        return self._add("rz", (q,), float(angle))

    def p(self, angle, q):
        return self._add("p", (q,), float(angle))

    def cx(self, ctrl, targ):
        return self._add("cx", (ctrl, targ))

    def cz(self, ctrl, targ):
        return self._add("cz", (ctrl, targ))

    def cp(self, angle, ctrl, targ):
        return self._add("cp", (ctrl, targ), float(angle))

    def extend(self, program: Iterable[Gate]):
        self._gates.extend(program)
        return self

    def build(self) -> GateProgram:
        return tuple(self._gates)


def gate_matrix(gate: Gate, dtype=None) -> jax.Array:
    """Dense 2x2 / 4x4 matrix of one gate (4x4 in (ctrl, targ) order)."""
    dtype = complex_dtype() if dtype is None else dtype
    name, param = gate.name, gate.param
    if name == "x":
        return G.x(dtype)
    if name == "y":
        return G.y(dtype)
    if name == "z":
        return G.z(dtype)
    if name == "h":
        return jnp.asarray([[1, 1], [1, -1]], dtype) / jnp.sqrt(
            jnp.asarray(2.0, dtype)
        )
    if name == "rx":
        return G.rx(param, dtype)
    if name == "ry":
        return G.ry(param, dtype)
    if name == "rz":
        return G.rz(param, dtype)
    if name == "p":
        return G.phase(param, dtype)
    if name == "cx":
        return G.controlled(G.x(dtype), dtype)
    if name == "cz":
        return G.controlled(G.z(dtype), dtype)
    if name == "cp":
        return G.controlled(G.phase(param, dtype), dtype)
    raise ValueError(f"unsupported gate: {name}")


def inverse_program(program: GateProgram) -> GateProgram:
    """Adjoint program: reversed order with negated angles (x/y/z/h/cx/cz are
    self-adjoint)."""
    inv = []
    for gate in reversed(program):
        if gate.param is None:
            inv.append(gate)
        else:
            inv.append(Gate(gate.name, gate.qubits, -gate.param))
    return tuple(inv)


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1, 2))
def _apply_program_jit(state: jax.Array, program: GateProgram, tail: int) -> jax.Array:
    from ..ops.statevector import apply_1q, apply_2q

    for gate in program:
        mat = gate_matrix(gate, state.dtype)
        if len(gate.qubits) == 1:
            state = apply_1q(state, mat, gate.qubits[0], tail)
        else:
            state = apply_2q(state, mat, gate.qubits[0], gate.qubits[1], tail)
    return state


def apply_program(state: jax.Array, program: GateProgram, tail: int = 1) -> jax.Array:
    """Applies a gate program to a state (or matrix columns via ``tail``).

    The whole program runs as ONE jitted XLA computation (the program tuple
    is a hashable static argument) — per-gate eager dispatch would both
    fragment fusion and, on remote-compile TPU runtimes, pay a compilation
    round trip per gate.
    """
    return _apply_program_jit(state, tuple(program), tail)


@_partial(jax.jit, static_argnums=(0, 1, 2))
def _program_to_state_jit(program: GateProgram, num_qubits: int, dtype) -> jax.Array:
    state = jnp.zeros(2**num_qubits, dtype).at[0].set(1)
    return _apply_program_jit(state, program, 1)


def program_to_state(program: GateProgram, num_qubits: int, dtype=None) -> jax.Array:
    """``program @ |0...0>`` as a dense vector (cf. reference
    ``qcircuit_to_state``, circuit_transform.py:40-52)."""
    dtype = complex_dtype() if dtype is None else dtype
    return _program_to_state_jit(tuple(program), num_qubits, dtype)


@_partial(jax.jit, static_argnums=(0, 1, 2))
def _program_to_matrix_jit(program: GateProgram, num_qubits: int, dtype) -> jax.Array:
    eye = jnp.eye(2**num_qubits, dtype=dtype)
    return _apply_program_jit(eye, program, 2**num_qubits)


def program_to_matrix(program: GateProgram, num_qubits: int, dtype=None) -> jax.Array:
    """Dense operator of a program (cf. ``qcircuit_to_matrix``,
    circuit_transform.py:55-67).  Exponentially sized — tests/targets only."""
    dtype = complex_dtype() if dtype is None else dtype
    return _program_to_matrix_jit(tuple(program), num_qubits, dtype)


def state_preparation_program(
    num_qubits: int,
    *,
    flip_bit: int = -1,
    state_prep_func=None,
) -> GateProgram:
    """Program preparing ``S X_i |0>`` / ``S |0>`` / ``|0>`` (cf. reference
    ``state_preparation_qcircuit``, circuit_transform.py:70-101)."""
    qb = ProgramBuilder(num_qubits)
    if flip_bit >= 0:
        qb.x(flip_bit)
    prog = qb.build()
    if callable(state_prep_func):
        prog = prog + tuple(state_prep_func(num_qubits))
    return prog
