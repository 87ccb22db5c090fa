"""Trotterized time evolution of the XXZ spin chain.

TPU-native counterpart of the reference Trotter module
(``/root/reference/aqc_research/model_sp_lhs/trotter/trotter.py:40-537``).
Hamiltonian (half-spin): ``H = -1/4 (Σ XX + Σ YY + delta Σ ZZ)`` over
adjacent pairs.

Performance design: the reference emits the elementary 8-gate Trotter block
(Rz·CX·Rz·Ry·CX·Ry·CX·Rz, trotter.py:351-359) as individual Qiskit gates —
eight passes over the state per pair.  Here the block is folded once into a
single 4x4 unitary (it acts on one adjacent pair), so a Trotter step is
``n-1`` fused 4x4 applications; a whole multi-step evolution runs as one
``lax.scan`` over steps.  The gate-program form is still available for the
MPS engine and interop.

The global phase is ignored exactly as in the reference (trotter.py:13-23);
``trotter_global_phase`` returns it for manual compensation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import checking as chk
from ..circuit import gates as G
from ..circuit.ansatz import Ansatz, TrotterAnsatz, first_layer_included
from ..circuit.program import GateProgram, ProgramBuilder, program_to_state
from ..config import complex_dtype
from ..ops.statevector import apply_2q


# -----------------------------------------------------------------------------
# Hamiltonian and exact evolution (test oracles, cf. trotter.py:183-266).
# -----------------------------------------------------------------------------


def make_hamiltonian(num_qubits: int, delta: float) -> np.ndarray:
    """Dense XXZ-chain Hamiltonian with half-spin matrices
    (cf. reference make_hamiltonian, trotter.py:183-230)."""
    sx = np.array([[0, 1], [1, 0]], dtype=np.complex128)
    sy = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
    sz = np.array([[1, 0], [0, -1]], dtype=np.complex128)

    def full(op, j):
        return np.kron(np.kron(np.eye(2**j), op), np.eye(2 ** (num_qubits - j - 1)))

    h = np.zeros((2**num_qubits, 2**num_qubits), dtype=np.complex128)
    for i in range(num_qubits - 1):
        h += full(sx, i) @ full(sx, i + 1)
        h += full(sy, i) @ full(sy, i + 1)
        h += delta * (full(sz, i) @ full(sz, i + 1))
    return -0.25 * h


def exact_evolution(
    hamiltonian: np.ndarray,
    ini_state: Union[GateProgram, np.ndarray],
    evol_time: float,
) -> np.ndarray:
    """``exp(-i t H) |ini>`` via dense matrix exponential (testing only,
    cf. reference exact_evolution, trotter.py:233-266)."""
    from scipy.linalg import expm

    if not isinstance(ini_state, np.ndarray):
        n = int(round(np.log2(hamiltonian.shape[0])))
        ini_state = np.asarray(program_to_state(ini_state, n))
    e_h = expm((-1.0j * evol_time) * np.asarray(hamiltonian))
    return e_h @ np.asarray(ini_state)


# -----------------------------------------------------------------------------
# Trotter block parameters (cf. trotter.py:269-314).
# -----------------------------------------------------------------------------


def trotter_alphas(dt: float, delta: float) -> np.ndarray:
    """The 3 angular parameters of the elementary Trotter block."""
    assert chk.is_float(dt, dt > 0) and chk.is_float(delta, delta > 0)
    return np.asarray(
        [np.pi / 2 - 0.5 * delta * dt, 0.5 * dt - np.pi / 2, np.pi / 2 - 0.5 * dt]
    )


def trotter_global_phase(num_qubits: int, num_steps: int, second_order: bool) -> float:
    """Global phase dropped by the (phase-free) Trotter construction."""
    quarter_pi = 0.25 * np.pi
    phs = quarter_pi * (num_qubits - 1) * num_steps
    if second_order:
        if num_qubits % 2 == 0:
            return phs + quarter_pi * num_qubits
        return phs + quarter_pi * (num_qubits - 1)
    return phs


# -----------------------------------------------------------------------------
# Fused elementary block + fast statevector evolution.
# -----------------------------------------------------------------------------


def _controlled_rev(gate2x2, dtype):
    """CX with control on the LOW qubit, in (hi, lo) index order:
    ``I (x) |0><0| + G (x) |1><1|``."""
    g = jnp.asarray(gate2x2, dtype)
    return (
        G.kron2(G.eye2(dtype), G.proj0(dtype))
        + G.kron2(g, G.proj1(dtype))
    )


def trotter_block_4x4(params, dtype=None) -> jax.Array:
    """The elementary Trotter block folded into a single 4x4 unitary in
    (hi=k+1, lo=k) index order.

    Gate sequence (reference _trotter_block, trotter.py:351-359):
    Rz(-pi/2)@hi · CX(hi->lo) · Rz(p0)@lo · Ry(p1)@hi · CX(lo->hi) ·
    Ry(p2)@hi · CX(hi->lo) · Rz(pi/2)@lo  — composed right-to-left here.
    """
    dtype = complex_dtype() if dtype is None else dtype
    p = jnp.asarray(params)
    eye = G.eye2(dtype)
    cx_hi = G.controlled(G.x(dtype), dtype)  # control = hi, target = lo
    cx_lo = _controlled_rev(G.x(dtype), dtype)  # control = lo, target = hi

    m = G.kron2(G.rz(-jnp.pi / 2, dtype), eye)  # rz on hi
    m = jnp.matmul(cx_hi, m)
    m = jnp.matmul(G.kron2(eye, G.rz(p[0], dtype)), m)  # rz(p0) on lo
    m = jnp.matmul(G.kron2(G.ry(p[1], dtype), eye), m)  # ry(p1) on hi
    m = jnp.matmul(cx_lo, m)
    m = jnp.matmul(G.kron2(G.ry(p[2], dtype), eye), m)  # ry(p2) on hi
    m = jnp.matmul(cx_hi, m)
    m = jnp.matmul(G.kron2(eye, G.rz(jnp.pi / 2, dtype)), m)  # rz(pi/2) on lo
    return m


def _apply_half_layer(state, block4, num_qubits, start: int, tail: int = 1):
    """Applies ``block4`` to pairs (k, k+1) for k = start, start+2, ..."""
    for k in range(start, num_qubits - 1, 2):
        state = apply_2q(state, block4, k + 1, k, tail)  # (ctrl=hi, targ=lo)
    return state


@partial(jax.jit, static_argnums=(1, 2, 5))
def trotter_evolve_state(
    state: jax.Array,
    num_qubits: int,
    num_steps: int,
    alphas: jax.Array,
    betas: jax.Array,
    second_order: bool,
) -> jax.Array:
    """Evolves a dense state by ``num_steps`` fused Trotter layers.

    1st order: each step = even half-layer (alphas) + odd half-layer (alphas).
    2nd order: the very first even half-layer and an appended trailing even
    half-layer use dt/2 parameters (betas) — cf. trotter_circuit
    (trotter.py:361-377).
    """
    dtype = state.dtype
    blk_a = trotter_block_4x4(alphas, dtype)
    blk_b = trotter_block_4x4(betas, dtype)

    if second_order:
        state = _apply_half_layer(state, blk_b, num_qubits, 0)
        state = _apply_half_layer(state, blk_a, num_qubits, 1)

        def step(s, _):
            s = _apply_half_layer(s, blk_a, num_qubits, 0)
            s = _apply_half_layer(s, blk_a, num_qubits, 1)
            return s, None

        if num_steps > 1:
            state, _ = jax.lax.scan(step, state, None, length=num_steps - 1)
        state = _apply_half_layer(state, blk_b, num_qubits, 0)
    else:

        def step(s, _):
            s = _apply_half_layer(s, blk_a, num_qubits, 0)
            s = _apply_half_layer(s, blk_a, num_qubits, 1)
            return s, None

        state, _ = jax.lax.scan(step, state, None, length=num_steps)
    return state


def _block_4x4_lo_hi(params, dtype):
    """The elementary Trotter block in (lo, hi) index order (the MPS pair
    convention) — transpose of :func:`trotter_block_4x4`."""
    g = trotter_block_4x4(params, dtype).reshape(2, 2, 2, 2)
    return jnp.transpose(g, (1, 0, 3, 2)).reshape(4, 4)


@partial(jax.jit, static_argnums=(1, 2, 5, 6))
def trotter_evolve_mps(
    mps,
    num_qubits: int,
    num_steps: int,
    alphas: jax.Array,
    betas: jax.Array,
    second_order: bool,
    trunc_thr: float,
):
    """MPS Trotter evolution with fused elementary blocks: one O(chi^3)
    truncated pair update per block (8 reference gates), ``lax.scan`` over
    steps.  The MPS twin of :func:`trotter_evolve_state` — and the engine
    behind incremental target generation, replacing the reference's per-gate
    Aer re-simulation."""
    from ..ops.mps import apply_pairs_mps

    dtype = mps.gammas.dtype
    blk_a = _block_4x4_lo_hi(alphas, dtype)
    blk_b = _block_4x4_lo_hi(betas, dtype)

    def half_layer(m, blk, start):
        los = tuple(range(start, num_qubits - 1, 2))
        gates = jnp.broadcast_to(blk, (len(los), 4, 4))
        return apply_pairs_mps(m, gates, los, trunc_thr=trunc_thr)

    if second_order:
        mps = half_layer(mps, blk_b, 0)
        mps = half_layer(mps, blk_a, 1)

        def step(m, _):
            m = half_layer(m, blk_a, 0)
            m = half_layer(m, blk_a, 1)
            return m, None

        if num_steps > 1:
            mps, _ = jax.lax.scan(step, mps, None, length=num_steps - 1)
        mps = half_layer(mps, blk_b, 0)
    else:

        def step(m, _):
            m = half_layer(m, blk_a, 0)
            m = half_layer(m, blk_a, 1)
            return m, None

        mps, _ = jax.lax.scan(step, mps, None, length=num_steps)
    return mps


# -----------------------------------------------------------------------------
# Gate-program form (for the MPS engine and interop, cf. trotter.py:317-378).
# -----------------------------------------------------------------------------


def trotter_program(
    qb: ProgramBuilder,
    *,
    dt: float,
    delta: float,
    num_trotter_steps: int,
    second_order: bool,
) -> GateProgram:
    """Appends a 1st/2nd-order Trotter circuit to a program builder."""
    assert chk.is_int(num_trotter_steps, num_trotter_steps > 0)
    alphas = trotter_alphas(dt, delta)
    betas = trotter_alphas(dt * 0.5, delta)

    def block(k: int, params):
        qb.rz(-np.pi / 2, k + 1)
        qb.cx(k + 1, k)
        qb.rz(params[0], k)
        qb.ry(params[1], k + 1)
        qb.cx(k, k + 1)
        qb.ry(params[2], k + 1)
        qb.cx(k + 1, k)
        qb.rz(np.pi / 2, k)

    n = qb.num_qubits
    for j in range(num_trotter_steps):
        for q in range(0, n - 1, 2):
            block(q, betas if second_order and j == 0 else alphas)
        for q in range(1, n - 1, 2):
            block(q, alphas)
    if second_order:
        for q in range(0, n - 1, 2):
            block(q, betas)
    return qb.build()


# -----------------------------------------------------------------------------
# Initial-state programs (cf. trotter.py:381-410).
# -----------------------------------------------------------------------------


def identity_circuit(num_qubits: int) -> GateProgram:
    """The empty program (|0...0> preparation)."""
    assert chk.is_int(num_qubits, num_qubits >= 2)
    return ProgramBuilder(num_qubits).build()


def neel_init_state(num_qubits: int) -> GateProgram:
    """Neel state |...101010> — X on every even qubit."""
    assert chk.is_int(num_qubits, num_qubits >= 2)
    qb = ProgramBuilder(num_qubits)
    for k in range(0, num_qubits, 2):
        qb.x(k)
    return qb.build()


def half_zero_circuit(num_qubits: int) -> GateProgram:
    """|1...1 0...0> — X on the upper half of the qubits."""
    assert chk.is_int(num_qubits, num_qubits >= 2)
    qb = ProgramBuilder(num_qubits)
    for k in range(num_qubits // 2, num_qubits):
        qb.x(k)
    return qb.build()


# -----------------------------------------------------------------------------
# Trotter evolution class (cf. trotter.py:40-180).
# -----------------------------------------------------------------------------


class Trotter:
    """Trotter evolution of quantum states; one "Trotter step" is a full layer
    of elementary blocks over all adjacent pairs (plus the trailing half-layer
    for 2nd order)."""

    def __init__(
        self,
        *,
        num_qubits: int,
        evol_time: float,
        num_steps: int,
        delta: float = 1.0,
        second_order: bool,
    ):
        assert chk.is_int(num_qubits, num_qubits >= 2)
        assert chk.is_float(evol_time, evol_time > 0)
        assert chk.is_int(num_steps, num_steps >= 1)
        assert chk.is_float(delta, delta > 0)
        self._num_qubits = num_qubits
        self._evol_time = float(evol_time)
        self._num_steps = int(num_steps)
        self._delta = float(delta)
        self._dt = evol_time / float(num_steps)
        self._second_order = bool(second_order)

    @property
    def evol_time(self) -> float:
        return self._evol_time

    @property
    def time_step(self) -> float:
        return self._dt

    @property
    def num_trotter_steps(self) -> int:
        return self._num_steps

    def as_vector(self, ini_state: Union[np.ndarray, GateProgram]) -> jax.Array:
        """Dense-vector Trotter evolution via fused 4x4 blocks."""
        if isinstance(ini_state, (np.ndarray, jax.Array)):
            state = jnp.asarray(ini_state)
        else:
            state = program_to_state(ini_state, self._num_qubits)
        alphas = jnp.asarray(trotter_alphas(self._dt, self._delta))
        betas = jnp.asarray(trotter_alphas(self._dt * 0.5, self._delta))
        return trotter_evolve_state(
            state, self._num_qubits, self._num_steps, alphas, betas, self._second_order
        )

    def as_program(self, ini_state: Optional[GateProgram] = None) -> GateProgram:
        """Gate-program form (cf. reference as_qcircuit, trotter.py:129-151)."""
        qb = ProgramBuilder(self._num_qubits)
        if ini_state:
            qb.extend(ini_state)
        return trotter_program(
            qb,
            dt=self._dt,
            delta=self._delta,
            num_trotter_steps=self._num_steps,
            second_order=self._second_order,
        )

    def as_mps(self, ini_state, trunc_thr: Optional[float] = None, chi_max: int = 64):
        """MPS-form Trotter evolution with fused elementary blocks
        (cf. reference as_mps, trotter.py:153-180, which re-simulates the
        whole gate-by-gate circuit through Aer)."""
        from ..ops import mps as mpsop

        thr = mpsop.no_truncation_threshold() if trunc_thr is None else float(trunc_thr)
        if isinstance(ini_state, mpsop.MPS):
            mps = ini_state
        else:
            mps = mpsop.mps_from_program(
                ini_state, self._num_qubits, chi_max=chi_max, trunc_thr=thr
            )
        alphas = jnp.asarray(trotter_alphas(self._dt, self._delta))
        betas = jnp.asarray(trotter_alphas(self._dt * 0.5, self._delta))
        return trotter_evolve_mps(
            mps,
            self._num_qubits,
            self._num_steps,
            alphas,
            betas,
            self._second_order,
            thr,
        )


# -----------------------------------------------------------------------------
# Fidelity / distance (cf. trotter.py:413-428).
# -----------------------------------------------------------------------------


@jax.jit
def _abs2(x):
    return (jnp.abs(x) ** 2).real


def fidelity(state1, state2) -> float:
    """``|<s1|s2>|^2`` for dense vectors or MPS states (same type)."""
    if not isinstance(state1, (np.ndarray, jax.Array)) or not isinstance(
        state2, (np.ndarray, jax.Array)
    ):
        from ..ops import mps as mpsop

        # Fetch a REAL scalar: complex device->host transfers fail on some
        # TPU runtimes (CLAUDE.md).
        return float(np.asarray(_abs2(mpsop.mps_dot(state1, state2))))
    if isinstance(state1, jax.Array) or isinstance(state2, jax.Array):
        from ..utils import to_host

        return float(np.abs(np.vdot(to_host(state1), to_host(state2))) ** 2)
    return float(np.abs(np.vdot(np.asarray(state1), np.asarray(state2))) ** 2)


def state_difference(state1, state2) -> float:
    """``||s1 - s2||`` — phase-sensitive distance."""
    from ..utils import to_host

    return float(np.linalg.norm(to_host(state1) - to_host(state2)))


# -----------------------------------------------------------------------------
# Perfect initialization of the ansatz to the Trotter circuit
# (cf. trotter.py:431-537).
# -----------------------------------------------------------------------------


def slice2q(
    circ: Ansatz,
    vec: np.ndarray,
    *,
    layer_range: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """View of Θ entries as (layers, n-1 triplets, 12 angles) for the selected
    layer range (cf. reference slice2q, trotter.py:431-475)."""
    if not isinstance(circ, TrotterAnsatz):
        raise ValueError("the perfect init applies to a Trotterized ansatz only")
    assert isinstance(vec, np.ndarray) and vec.shape == (circ.num_thetas,)
    num_layers = circ.num_layers
    layer_range = (0, num_layers) if layer_range is None else layer_range
    assert 0 <= layer_range[0] < layer_range[1] <= num_layers
    vec2q = circ.subset2q(vec).reshape((num_layers, circ.num_qubits - 1, 12))
    return vec2q[layer_range[0] : layer_range[1]], layer_range


def init_ansatz_to_trotter(
    circ: Ansatz,
    thetas: np.ndarray,
    *,
    evol_time: float,
    delta: float,
    layer_range: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Sets Θ (within ``layer_range``) so the ansatz reproduces the Trotter
    circuit — the 'perfect' initial guess (cf. reference
    init_ansatz_to_trotter, trotter.py:478-537).

    Only 3 angles per triplet are nonzero: indices 5, 0, 6 take the three
    block alphas; the 2nd-order leading half-layer takes dt/2 alphas.
    Modifies and returns ``thetas`` (numpy, in place — host-side data).
    """
    th2q, layer_range = slice2q(circ, thetas, layer_range=layer_range)
    delta_t = evol_time / float(layer_range[1] - layer_range[0])
    alphas = trotter_alphas(dt=delta_t, delta=delta)
    assert isinstance(circ, TrotterAnsatz)
    layer_0 = first_layer_included(circ, layer_range)

    if layer_0:
        np.asarray(circ.subset1q(thetas)).fill(0)

    th2q.fill(0)
    th2q[:, :, 5] = alphas[0]
    th2q[:, :, 0] = alphas[1]
    th2q[:, :, 6] = alphas[2]

    if circ.is_second_order and layer_0:
        alphas = trotter_alphas(dt=delta_t * 0.5, delta=delta)
        half = circ.half_layer_num_blocks // 3
        assert 3 * half == circ.half_layer_num_blocks
        th2q[0, 0:half, 5] = alphas[0]
        th2q[0, 0:half, 0] = alphas[1]
        th2q[0, 0:half, 6] = alphas[2]

    return thetas


def trotter_circuit(
    num_qubits: int,
    *,
    dt: float,
    delta: float,
    num_trotter_steps: int,
    second_order: bool,
    ini_state: Optional[GateProgram] = None,
) -> GateProgram:
    """Trotter evolution as a gate program (reference trotter_circuit,
    trotter.py:317-378, with a GateProgram instead of a QuantumCircuit; the
    reference APPENDED to an input circuit — pass ``ini_state`` to prepend
    a preparation program)."""
    return Trotter(
        num_qubits=num_qubits,
        evol_time=float(dt) * int(num_trotter_steps),
        num_steps=int(num_trotter_steps),
        delta=float(delta),
        second_order=bool(second_order),
    ).as_program(ini_state)
