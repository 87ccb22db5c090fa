"""Analytic co-sweep gradient of ``<lvec | V† | phi>`` in MPS form, with
left/right environment caching.

TPU-native counterpart of the reference ``fast_dot_gradient``
(``/root/reference/aqc_research/mps_dot_objective.py:41-242``).  Two levels of
speedup over the reference:

1. The reference implements every per-gate step as a FULL Qiskit-Aer circuit
   re-simulation (mps_dot_objective.py:326-331).  Here each step is a local
   on-device tensor update (O(chi^2) for 1-qubit gates, one O(chi^3)
   SVD-truncated pair update for the entangler).
2. The reference computes every per-parameter derivative as a full
   transfer-matrix inner product over all n sites.  Here the inner products
   ``0.5j * <P w | z>`` reuse **cached left/right environments** of <w|z>:
   a right-environment stack is refreshed once per (half-)layer sweep
   (O(n chi^3)), the left environment is carried along the sweep, and each
   dot then costs O(chi^3) — an O(n) asymptotic win (SURVEY.md §7: "left/
   right environment caching so a gradient sweep costs O(depth·chi^3)").

Environment validity: a block sweep only ever modifies its own pair of
sites, so right environments computed at the last refresh stay valid for all
sites to the right of the current pair as long as the sweep moves
left-to-right; the sweep refreshes whenever the block order wraps around
(start of each chessboard half-layer).

Gate order, partial-gradient semantics, the CP two-point derivative, and the
2nd-order Trotter half-layer accumulation match the reference exactly
(verified against the dense co-sweep in tests/test_mps_fast_dot_gradient.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..circuit.ansatz import Ansatz
from .mps import (
    MPS,
    apply_1q_mps,
    apply_2q_any_mps,
    no_truncation_threshold,
)


# -----------------------------------------------------------------------------
# Environment machinery.
# -----------------------------------------------------------------------------


def _site_tensor(mps: MPS, q: int) -> jax.Array:
    """lambda-folded site tensor A_q = Γ_q diag(λ_q) (A_{n-1} = Γ_{n-1})."""
    n = mps.num_sites
    g = mps.gammas[q]
    if q < n - 1:
        return g * mps.lambdas[q][None, None, :].astype(g.dtype)
    return g


def _env_left_step(env, aw, az):
    """env'[b,B] = sum_s conj(aw)[s,a,b] env[a,A] az[s,A,B]."""
    return jnp.einsum("aA,sab,sAB->bB", env, jnp.conj(aw), az)


def _env_right_step(aw, az, env):
    """env'[a,A] = sum_s conj(aw)[s,a,b] az[s,A,B] env[b,B]."""
    return jnp.einsum("sab,sAB,bB->aA", jnp.conj(aw), az, env)


class _EnvTracker:
    """Carries the left environment and a right-environment stack of <w|z>;
    refreshes the stack whenever the gate order wraps leftwards."""

    def __init__(self, w: MPS, z: MPS):
        self.w = w
        self.z = z
        self.n = w.num_sites
        self._left = None  # env of sites [0, absorbed)
        self._absorbed = 0
        self._right: Optional[jax.Array] = None  # (n, chi_w, chi_z); [q] = sites > q
        self._max_mod = -1  # highest site modified since the last refresh

    def _boundary(self):
        cw, cz = self.w.chi, self.z.chi
        dtype = self.w.gammas.dtype
        return jnp.zeros((cw, cz), dtype).at[0, 0].set(1.0)

    def refresh(self):
        """Recomputes the right-environment stack from the current tensors."""
        aw = jnp.stack([_site_tensor(self.w, q) for q in range(self.n)])
        az = jnp.stack([_site_tensor(self.z, q) for q in range(self.n)])

        def body(env, ts):
            taw, taz = ts
            new_env = _env_right_step(taw, taz, env)
            return new_env, new_env

        # envs_after[q] = contraction of sites >= q ; we need R[q] = sites > q.
        _, envs = jax.lax.scan(body, self._boundary(), (aw[::-1], az[::-1]))
        # envs[k] = contraction of sites >= n-1-k  ->  R[q] = envs[n-2-q]
        r_stack = envs[::-1]  # r_stack[q] = contraction of sites >= q
        self._right = jnp.concatenate(
            [r_stack[1:], self._boundary()[None]], axis=0
        )  # R[q] = sites > q
        self._left = self._boundary()
        self._absorbed = 0
        self._max_mod = -1

    def prepare(self, lo: int, hi: int):
        """Makes L cover sites < lo and R[hi] valid for the block (lo, hi)."""
        if self._right is None or self._absorbed > lo or self._max_mod > hi:
            self.refresh()
        while self._absorbed < lo:
            q = self._absorbed
            self._left = _env_left_step(
                self._left, _site_tensor(self.w, q), _site_tensor(self.z, q)
            )
            self._absorbed += 1

    def mark_modified(self, hi: int):
        self._max_mod = max(self._max_mod, hi)

    def dot_1site(self, q: int, pauli_mat, w_override: Optional[MPS] = None):
        """<P@w | z> restricted transfer at site q: L · T_q(P) · R[q]."""
        w = self.w if w_override is None else w_override
        aw = _site_tensor(w, q)
        aw = jnp.einsum("ij,jab->iab", pauli_mat.astype(aw.dtype), aw)
        t = _env_left_step(self._left if self._absorbed == q else self._left_to(q),
                           aw, _site_tensor(self.z, q))
        return jnp.sum(t * self._right[q])

    def _left_to(self, q: int):
        """Left env extended (without committing) from ``absorbed`` to q."""
        env = self._left
        for k in range(self._absorbed, q):
            env = _env_left_step(env, _site_tensor(self.w, k), _site_tensor(self.z, k))
        return env

    def dot_span(
        self,
        lo: int,
        hi: int,
        pauli_site: Optional[int],
        pauli_mat,
        w_override: Optional[MPS] = None,
    ):
        """<(P@)w | z> via the multi-site transfer over [lo, hi]:
        L · T_lo · ... · T_hi · R[hi].  ``pauli_site`` None applies no Pauli.
        Valid whenever sites > hi are unmodified since the last refresh —
        which is what makes it work for non-nearest-neighbour blocks (every
        site the swap network touched lies inside [lo, hi])."""
        w = self.w if w_override is None else w_override
        env = self._left if self._absorbed == lo else self._left_to(lo)
        for q in range(lo, hi + 1):
            aw = _site_tensor(w, q)
            if pauli_site == q:
                aw = jnp.einsum("ij,jab->iab", pauli_mat.astype(aw.dtype), aw)
            env = _env_left_step(env, aw, _site_tensor(self.z, q))
        return jnp.sum(env * self._right[hi])

    def dot_pair(
        self,
        lo: int,
        pauli_site: Optional[int],
        pauli_mat,
        w_override: Optional[MPS] = None,
    ):
        """<(P@)w | z> via the two-site transfer at (lo, lo+1)."""
        return self.dot_span(lo, lo + 1, pauli_site, pauli_mat, w_override)


# -----------------------------------------------------------------------------
# The gradient sweep.
# -----------------------------------------------------------------------------


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
    y_mat, z_pauli = G.y(dtype), G.z(dtype)
    trot = circ.is_trotterized

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    w, z = lvec, vh_phi
    env = _EnvTracker(w, z)

    def apply_1q_both(gate, site):
        env.w = apply_1q_mps(env.w, gate, site)
        env.z = apply_1q_mps(env.z, gate, site)
        env.mark_modified(site)

    zero = jnp.zeros((), dtype)
    grad1q_rows: List[jax.Array] = []
    for q in range(n):
        t = thetas1q[q]
        env.prepare(q, q)
        apply_1q_both(G.rz(t[2], dtype), q)
        d2 = 0.5j * env.dot_1site(q, z_pauli) if front_layer else zero
        apply_1q_both(G.ry(t[1], dtype), q)
        d1 = 0.5j * env.dot_1site(q, y_mat) if front_layer else zero
        apply_1q_both(G.rz(t[0], dtype), q)
        d0 = 0.5j * env.dot_1site(q, z_pauli) if front_layer else zero
        grad1q_rows.append(jnp.stack([d0, d1, d2]))
    grad1q = jnp.stack(grad1q_rows)

    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    half = circ.half_layer_num_blocks if trot else 0

    def block_step(env_: _EnvTracker, k: int, i_mod3: int, t, mask):
        """One unit block of the co-sweep; returns the per-parameter dots."""
        ctrl = int(circ.blocks[0, k])
        targ = int(circ.blocks[1, k])
        lo, hi = min(ctrl, targ), max(ctrl, targ)

        def apply_both(gate, site):
            env_.w = apply_1q_mps(env_.w, gate, site)
            env_.z = apply_1q_mps(env_.z, gate, site)
            env_.mark_modified(site)

        env_.prepare(lo, hi)
        if trot and i_mod3 == 0:
            apply_both(G.rz(-np.pi / 2, dtype), ctrl)

        # Non-adjacent blocks (any reference ParametricCircuit layout) apply
        # through the swap network; every touched site lies in [lo, hi], so
        # the dot_span transfers below remain valid without a refresh.
        ent = _entangler_4x4_lo_hi(circ, t, dtype, ctrl, targ)
        env_.z = apply_2q_any_mps(env_.z, ent, lo, hi, trunc_thr=trunc_thr)
        if cp:
            # CP derivative is not unitary-proportional: two-point difference
            # of shifted CP gates (mps_dot_objective.py:186-196).
            ent2 = _entangler_4x4_lo_hi(circ, t, dtype, ctrl, targ, shift=np.pi)
            w2 = apply_2q_any_mps(env_.w, ent2, lo, hi, trunc_thr=trunc_thr)
            env_.w = apply_2q_any_mps(env_.w, ent, lo, hi, trunc_thr=trunc_thr)
            env_.mark_modified(hi)
            cp_w_z = env_.dot_span(lo, hi, None, None)
            cp_w_z2 = env_.dot_span(lo, hi, None, None, w_override=w2)
            d4 = mask * (-0.5j) * (cp_w_z - cp_w_z2)
        else:
            env_.w = apply_2q_any_mps(env_.w, ent, lo, hi, trunc_thr=trunc_thr)
            env_.mark_modified(hi)

        apply_both(G.ry(t[0], dtype), ctrl)
        d0 = mask * 0.5j * env_.dot_span(lo, hi, ctrl, y_mat)
        apply_both(G.rz(t[1], dtype), ctrl)
        d1 = mask * 0.5j * env_.dot_span(lo, hi, ctrl, z_pauli)
        apply_both(G.ry(t[2], dtype), targ)
        d2 = mask * 0.5j * env_.dot_span(lo, hi, targ, y_mat)
        apply_both(rs_fn(t[3], dtype), targ)
        d3 = mask * 0.5j * env_.dot_span(lo, hi, targ, s_mat)

        if trot and i_mod3 == 2:
            apply_both(G.rz(np.pi / 2, dtype), targ)
        return jnp.stack([d0, d1, d2, d3] + ([d4] if cp else []))

    # Layered (Trotter) structures scan over full layers — compile time stays
    # O(blocks-per-layer) instead of O(depth).  Environment caching resets at
    # each half-layer anyway, so there is no cross-layer carry beyond (w, z).
    bpl = circ.bpl if trot else 0
    use_scan = trot and nb > 0 and bpl > 0 and nb % bpl == 0 and nb // bpl >= 2

    if use_scan:
        layers = nb // bpl
        th_layers = thetas2q.reshape(layers, bpl, tpb)
        m_layers = masks.reshape(layers, bpl)
        layer_pattern_ok = all(
            circ.blocks[0, k] == circ.blocks[0, k % bpl]
            and circ.blocks[1, k] == circ.blocks[1, k % bpl]
            for k in range(nb)
        )
        use_scan = layer_pattern_ok

    if use_scan:

        def layer_body(carry, xs):
            w_, z_ = carry
            th_l, m_l = xs
            env_ = _EnvTracker(w_, z_)
            dots = [
                block_step(env_, k, k % 3, th_l[k], m_l[k]) for k in range(bpl)
            ]
            return (env_.w, env_.z), jnp.stack(dots)

        (w, z), scanned = jax.lax.scan(
            layer_body, (env.w, env.z), (th_layers, m_layers)
        )
        grad2q = scanned.reshape(nb, tpb)
        env = _EnvTracker(w, z)
    else:
        grad2q = jnp.zeros((nb, tpb), dtype)
        for i in range(nb):
            dots = block_step(env, i, i % 3, thetas2q[i], masks[i])
            grad2q = grad2q.at[i].add(dots)

    # 2nd-order Trotter trailing half-layer: accumulates into rows [0:half).
    if half:
        half_dots = []
        for k in range(half):
            half_dots.append(block_step(env, k, k % 3, thetas2q[k], masks[k]))
        grad2q = grad2q.at[:half].add(jnp.stack(half_dots))

    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


# -----------------------------------------------------------------------------
# Layer-batched gradient for Trotterized (CX) ansatze.
#
# Within a chessboard half-layer the triplets act on pairwise-disjoint pairs,
# so (a) all their entanglers apply as ONE batched SVD phase, (b) each of the
# four parameterized 1-qubit gates applies as ONE batched einsum across the
# half-layer, and (c) all the per-parameter inner products <P w|z> at that
# position come from one pair of left/right environment scans.  Reordering is
# exact: unitaries on disjoint pairs commute, and applying the same unitary
# to both w and z leaves every <P w|z> with P on another pair invariant.
# SVD phases per layer: 6 (vs 3·(n-1) sequential) — the dominant win at
# large n / chi (BASELINE configs 3 and 5).
# -----------------------------------------------------------------------------


def _folded_all(mps: MPS) -> jax.Array:
    from .mps import _folded_tensors

    return _folded_tensors(mps)


def _env_stacks(w: MPS, z: MPS):
    """Left/right environment stacks of <w|z>:
    L[q] covers sites < q (shape (n+1, cw, cz)); R[q] covers sites >= q
    ((n+1, cw, cz), R[n] = boundary).  A dot inserted at site s uses
    L[s] · T_s · R[s+1]."""
    aw, az = _folded_all(w), _folded_all(z)
    cw, cz = w.chi, z.chi
    dtype = aw.dtype
    e0 = jnp.zeros((cw, cz), dtype).at[0, 0].set(1.0)

    def lstep(env, ts):
        t1, t2 = ts
        new = jnp.einsum("aA,sab,sAB->bB", env, jnp.conj(t1), t2)
        return new, new

    _, l_tail = jax.lax.scan(lstep, e0, (aw, az))
    l_stack = jnp.concatenate([e0[None], l_tail], axis=0)

    def rstep(env, ts):
        t1, t2 = ts
        new = jnp.einsum("sab,sAB,bB->aA", jnp.conj(t1), t2, env)
        return new, new

    _, r_tail = jax.lax.scan(rstep, e0, (aw[::-1], az[::-1]))
    r_stack = jnp.concatenate([r_tail[::-1], e0[None]], axis=0)
    return aw, az, l_stack, r_stack


def _dots_from_stacks(w: MPS, z: MPS, l_stack, r_stack, pauli_mats, sites):
    """All ``<P_k w | z>`` for distinct sites in one batched contraction,
    against PRE-BUILT environment stacks.

    Validity: the stacks may be reused across 1-qubit gate applications that
    hit BOTH w and z with the same unitary g — the per-site transfer matrix
    ``sum_s conj(A^w_s) (x) A^z_s`` is invariant under A -> g A on both states
    (unitarity of g), so every L[q]/R[q] stays exact.  Only the dot site's
    CURRENT tensors enter here."""
    idx = np.asarray(sites, dtype=int)
    aw, az = _folded_all(w), _folded_all(z)

    def one(l_env, taw, taz, r_env, p):
        paw = jnp.einsum("ij,jab->iab", p.astype(taw.dtype), taw)
        return jnp.einsum(
            "aA,sab,sAB,bB->", l_env, jnp.conj(paw), taz, r_env
        )

    return jax.vmap(one)(
        l_stack[idx], aw[idx], az[idx], r_stack[idx + 1], pauli_mats
    )


def _apply_pairs_both(w: MPS, z: MPS, gates, los, trunc_thr):
    """Applies the same batched pair gates to w and z.

    When the bond dimensions match, the two states stack into ONE batched
    SVD phase (leading vmap axis) — halving the number of latency-bound
    decomposition phases per half-layer."""
    from .mps import apply_pairs_mps

    if w.chi == z.chi and w.gammas.dtype == z.gammas.dtype:
        wz = MPS(
            jnp.stack([w.gammas, z.gammas]), jnp.stack([w.lambdas, z.lambdas])
        )
        wz = jax.vmap(
            lambda m: apply_pairs_mps(m, gates, los, trunc_thr=trunc_thr)
        )(wz)
        return (
            MPS(wz.gammas[0], wz.lambdas[0]),
            MPS(wz.gammas[1], wz.lambdas[1]),
        )
    w = apply_pairs_mps(w, gates, los, trunc_thr=trunc_thr)
    z = apply_pairs_mps(z, gates, los, trunc_thr=trunc_thr)
    return w, z


def _layered_plan(circ: Ansatz):
    """Static structure of one layer: half-layer groups of triplets.

    Returns a list of groups; each group is a list of
    (triplet_index_in_layer, lo_site, flipped) where ``flipped`` marks the
    middle block's (ctrl=lo) orientation handled per block below."""
    bpl = circ.bpl
    triplets = []
    for t in range(bpl // 3):
        c0 = int(circ.blocks[0, 3 * t])
        t0 = int(circ.blocks[1, 3 * t])
        triplets.append((t, min(c0, t0)))
    groups = []
    current = []
    used = set()
    for t, lo in triplets:
        if any(abs(lo - u) <= 1 for u in used):
            groups.append(current)
            current, used = [], set()
        current.append((t, lo))
        used.add(lo)
    if current:
        groups.append(current)
    # apply_pairs_mps requires ascending disjoint los; a valid layout may
    # list a layer's triplets in any order (check_block_layout does not
    # constrain it).  Triplets within a half-layer commute, and the true
    # triplet index t rides along for the theta/dots indexing.
    return [sorted(g, key=lambda tl: tl[1]) for g in groups]


def _cx_lo_hi(ctrl_is_hi: bool, dtype):
    """CX in (lo, hi) row ordering (row index = s_lo * 2 + s_hi)."""
    mat = G.controlled(G.x(dtype), dtype).reshape(2, 2, 2, 2)  # (ctrl, targ)
    if ctrl_is_hi:  # (ctrl,targ) = (hi,lo) -> transpose into (lo,hi)
        mat = jnp.transpose(mat, (1, 0, 3, 2))
    return mat.reshape(4, 4)


def _rz_frame_lo_hi(angle, on_hi: bool, dtype):
    """1q Rz framing embedded as a 4x4 in (lo, hi) ordering."""
    rz = G.rz(angle, dtype)
    eye = G.eye2(dtype)
    return G.kron2(eye, rz) if on_hi else G.kron2(rz, eye)


def _pair_env_tensors(w: MPS, z: MPS, l_stack, r_stack, los):
    """The 4x4 two-site environment tensors N_p of <w|z> at pairs (lo, lo+1).

    ``N[uv, st]`` contracts everything EXCEPT the pair's physical legs, so for
    any pair-local operator Y the restricted transfer is
    ``<(Y w)|z> = sum(conj(Y) * N)`` — all per-parameter dots of a triplet
    then reduce to 4x4 algebra against one N."""
    idx = np.asarray(los, dtype=int)
    aw, az = _folded_all(w), _folded_all(z)

    def one(l_env, awl, awh, azl, azh, r_env):
        tw = jnp.einsum("sam,tmb->stab", awl, awh)
        tz = jnp.einsum("uAM,vMB->uvAB", azl, azh)
        tz = jnp.einsum("uvAB,bB->uvAb", tz, r_env)
        x = jnp.einsum("aA,stab->stAb", l_env, jnp.conj(tw))
        return jnp.einsum("stAb,uvAb->uvst", x, tz)

    n4 = jax.vmap(one)(
        l_stack[idx], aw[idx], aw[idx + 1], az[idx], az[idx + 1], r_stack[idx + 2]
    )
    return n4.reshape(len(los), 4, 4)  # rows = z phys (u,v), cols = w phys (s,t)


def _embed_1q_batch(g, on_hi: bool):
    """Batched 1q gates (P, 2, 2) embedded as 4x4 in lo-major ordering."""
    eye = jnp.eye(2, dtype=g.dtype)
    if on_hi:
        out = jnp.einsum("ij,pkl->pikjl", eye, g)
    else:
        out = jnp.einsum("pij,kl->pikjl", g, eye)
    return out.reshape(g.shape[0], 4, 4)


def _embed_pauli(p, on_hi: bool):
    eye = jnp.eye(2, dtype=p.dtype)
    out = jnp.kron(eye, p) if on_hi else jnp.kron(p, eye)
    return out


def _half_layer_cosweep(
    circ,
    group,
    layer_thetas,  # (bpl, tpb) — this layer's block angles
    layer_masks,  # (bpl,)
    w: MPS,
    z: MPS,
    trunc_thr: float,
    dtype,
    skip_z: bool = False,  # don't update z (caller substitutes a cached state)
):
    """Processes one chessboard half-layer; returns (w, z, dots (bpl, 4))
    with rows only for this group's blocks filled (others zero).

    All three blocks of a triplet act on the SAME pair, so the whole triplet
    (entanglers, framings, parameterized 1q gates) composes into one 4x4 F_p
    per pair: the states take ONE truncated pair update (instead of three),
    and every per-parameter dot <P w_k|z_k> mid-triplet equals
    ``sum(conj(U_k^H P U_k) * N_p)`` with U_k the pair-local gate prefix and
    N_p the pre-triplet environment tensor — exact pair-local algebra, no
    intermediate truncations."""
    y_mat, z_mat, x_mat = G.y(dtype), G.z(dtype), G.x(dtype)
    los = tuple(lo for _, lo in group)
    tidx = [t for t, _ in group]
    P = len(los)
    dots_rows = jnp.zeros((circ.bpl, 4), dtype)

    _, _, l_stack, r_stack = _env_stacks(w, z)
    n4 = _pair_env_tensors(w, z, l_stack, r_stack, los)  # (P, 4, 4)

    prefix = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (P, 4, 4))
    half = 0.5j
    for b in range(3):
        ctrl_is_hi = b != 1  # triplet blocks 0/2 have ctrl = hi, block 1 flipped
        ent = _cx_lo_hi(ctrl_is_hi, dtype)
        if b == 0:
            # Leading triplet framing Rz(-pi/2) on ctrl (= hi) folds into E.
            ent = jnp.matmul(ent, _rz_frame_lo_hi(-np.pi / 2, True, dtype))
        prefix = jnp.einsum("ij,pjk->pik", ent, prefix)

        blk = jnp.asarray([3 * t + b for t in tidx])
        th = layer_thetas[blk]  # (P, tpb)
        msk = layer_masks[blk].astype(dtype)  # (P,)

        specs = [
            (G.ry, y_mat, ctrl_is_hi, 0),  # on ctrl
            (G.rz, z_mat, ctrl_is_hi, 1),  # on ctrl
            (G.ry, y_mat, not ctrl_is_hi, 2),  # on targ
            (G.rx, x_mat, not ctrl_is_hi, 3),  # on targ
        ]
        for gate_fn, pauli, on_hi, col in specs:
            g4 = _embed_1q_batch(gate_fn(th[:, col], dtype), on_hi)
            prefix = jnp.einsum("pij,pjk->pik", g4, prefix)
            p4 = _embed_pauli(pauli, on_hi)
            y4 = jnp.einsum(
                "pji,jk,pkl->pil", jnp.conj(prefix), p4, prefix
            )  # prefix^H P prefix
            vals = half * jnp.einsum("pij,pij->p", jnp.conj(y4), n4) * msk
            dots_rows = dots_rows.at[blk, col].add(vals)

        if b == 2:
            # Trailing triplet framing Rz(pi/2) on targ (= lo).
            frame = G.rz(np.pi / 2, dtype)
            g4 = _embed_1q_batch(
                jnp.broadcast_to(frame, (P, 2, 2)), not ctrl_is_hi
            )
            prefix = jnp.einsum("pij,pjk->pik", g4, prefix)

    if skip_z:
        from .mps import apply_pairs_mps

        w = apply_pairs_mps(w, prefix, los, trunc_thr=trunc_thr)
        return w, z, dots_rows
    w, z = _apply_pairs_both(w, z, prefix, los, trunc_thr)
    return w, z, dots_rows


def _half_layer_cosweep_znext(
    circ,
    group,
    layer_thetas,  # (bpl, tpb)
    layer_masks,  # (bpl,)
    w: MPS,
    z_next: MPS,  # the CACHED post-group boundary (v_dagger_mul_mps_layers)
    trunc_thr: float,
    dtype,
):
    """Group co-sweep WITHOUT any z-side state update, against the cached
    POST-group boundary: with G = prod_p F_p the group's pair prefixes and
    z_mid = G† z_next (exact arithmetic), every dot satisfies

        <Y_p w | z_mid> = <(F_p Y_p) w | z_next>

    where the OTHER pairs' F_q fold into the w-side two-site transfer
    tensors of <w|z_next>.  Every environment cut lands BETWEEN pairs, so
    the folds never straddle a cut (no operator-Schmidt splitting) and the
    whole construction needs ZERO truncated decompositions on the z side.
    Returns (w', z_next, dots) — w takes the usual batched pair update."""
    y_mat, z_mat, x_mat = G.y(dtype), G.z(dtype), G.x(dtype)
    los = tuple(lo for _, lo in group)
    tidx = [t for t, _ in group]
    P = len(los)
    dots_rows = jnp.zeros((circ.bpl, 4), dtype)

    # ---- pass 1: pure 4x4 algebra — triplet prefixes + per-column
    # pre† P pre sandwiches (collected; final F left-multiplies later).
    prefix = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (P, 4, 4))
    sandwiches = []  # (blk_array, col, msk, y4 (P,4,4))
    for b in range(3):
        ctrl_is_hi = b != 1
        ent = _cx_lo_hi(ctrl_is_hi, dtype)
        if b == 0:
            ent = jnp.matmul(ent, _rz_frame_lo_hi(-np.pi / 2, True, dtype))
        prefix = jnp.einsum("ij,pjk->pik", ent, prefix)

        blk = jnp.asarray([3 * t + b for t in tidx])
        th = layer_thetas[blk]
        msk = layer_masks[blk].astype(dtype)

        specs = [
            (G.ry, y_mat, ctrl_is_hi, 0),
            (G.rz, z_mat, ctrl_is_hi, 1),
            (G.ry, y_mat, not ctrl_is_hi, 2),
            (G.rx, x_mat, not ctrl_is_hi, 3),
        ]
        for gate_fn, pauli, on_hi, col in specs:
            g4 = _embed_1q_batch(gate_fn(th[:, col], dtype), on_hi)
            prefix = jnp.einsum("pij,pjk->pik", g4, prefix)
            p4 = _embed_pauli(pauli, on_hi)
            y4 = jnp.einsum("pji,jk,pkl->pil", jnp.conj(prefix), p4, prefix)
            sandwiches.append((blk, col, msk, y4))

        if b == 2:
            frame = G.rz(np.pi / 2, dtype)
            g4 = _embed_1q_batch(
                jnp.broadcast_to(frame, (P, 2, 2)), not ctrl_is_hi
            )
            prefix = jnp.einsum("pij,pjk->pik", g4, prefix)

    # ---- pass 2: environment tensors of <w | z_next> with the OTHER
    # pairs' F folded into the w side, cuts only between pairs.
    aw, az = _folded_all(w), _folded_all(z_next)
    n = w.num_sites
    cw, cz = w.chi, z_next.chi
    e0 = jnp.zeros((cw, cz), dtype).at[0, 0].set(1.0)
    pair_of_lo = {lo: i for i, lo in enumerate(los)}

    def fold_pair_w(lo, f4):
        """Two-site w tensor with the pair prefix folded:
        tw[s,t,a,c] = sum_{uv,b} f4[(st),(uv)] aw_lo[u,a,b] aw_hi[v,b,c]."""
        two = jnp.einsum("uab,vbc->uvac", aw[lo], aw[lo + 1])
        f = f4.reshape(2, 2, 2, 2)
        return jnp.einsum("stuv,uvac->stac", f, two)

    def pair_z(lo):
        return jnp.einsum("uAB,vBC->uvAC", az[lo], az[lo + 1])

    units = []
    q = 0
    while q < n:
        if q in pair_of_lo:
            units.append(("pair", q))
            q += 2
        else:
            units.append(("site", q))
            q += 1

    l_envs = {}
    env = e0
    for kind, q in units:
        if kind == "pair":
            l_envs[q] = env
            tw = fold_pair_w(q, prefix[pair_of_lo[q]])
            tz = pair_z(q)
            env = jnp.einsum("aA,stac,stAC->cC", env, jnp.conj(tw), tz)
        else:
            env = _env_left_step(env, aw[q], az[q])

    r_envs = {}
    env = e0
    for kind, q in reversed(units):
        if kind == "pair":
            r_envs[q] = env
            tw = fold_pair_w(q, prefix[pair_of_lo[q]])
            tz = pair_z(q)
            env = jnp.einsum("stac,stAC,cC->aA", jnp.conj(tw), tz, env)
        else:
            env = _env_right_step(aw[q], az[q], env)

    def n4_at(lo):
        tw = jnp.einsum("uab,vbc->uvac", aw[lo], aw[lo + 1])  # open w legs
        tz = pair_z(lo)
        x = jnp.einsum("aA,stac->stAc", l_envs[lo], jnp.conj(tw))
        x = jnp.einsum("stAc,cC->stAC", x, r_envs[lo])
        return jnp.einsum("stAC,uvAC->uvst", x, tz).reshape(4, 4)

    n4 = jnp.stack([n4_at(lo) for lo in los])  # (P, 4, 4)

    # ---- dots: 0.5j * sum(conj(F_p @ y4_p) * n4'_p)
    half = 0.5j
    for blk, col, msk, y4 in sandwiches:
        y4f = jnp.einsum("pij,pjk->pik", prefix, y4)
        vals = half * jnp.einsum("pij,pij->p", jnp.conj(y4f), n4) * msk
        dots_rows = dots_rows.at[blk, col].add(vals)

    from .mps import apply_pairs_mps

    w = apply_pairs_mps(w, prefix, los, trunc_thr=trunc_thr)
    return w, z_next, dots_rows


def _front_cosweep_batched(circ, thetas1q, w: MPS, z: MPS, front_layer, dtype):
    """Front Rz·Ry·Rz layer: batched 1q applies + batched dots."""
    from .mps import apply_1q_many

    n = circ.num_qubits
    sites = tuple(range(n))
    y_mat, z_mat = G.y(dtype), G.z(dtype)
    grads = jnp.zeros((n, 3), dtype)
    # One stack build serves all three dot rounds (1q gates hit both states,
    # so the environments are invariant — see _dots_from_stacks).
    if front_layer:
        _, _, l_stack, r_stack = _env_stacks(w, z)
    for col, (gate_fn, pauli) in ((2, (G.rz, z_mat)), (1, (G.ry, y_mat)), (0, (G.rz, z_mat))):
        g1q = gate_fn(thetas1q[:, col], dtype)
        w = apply_1q_many(w, g1q, sites)
        z = apply_1q_many(z, g1q, sites)
        if front_layer:
            paulis = jnp.broadcast_to(pauli, (n, 2, 2))
            grads = grads.at[:, col].set(
                0.5j * _dots_from_stacks(w, z, l_stack, r_stack, paulis, sites)
            )
    return w, z, grads


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _fast_dot_gradient_layered(
    circ: Ansatz,
    thetas: jax.Array,
    lvec: MPS,
    vh_phi: MPS,
    trunc_thr: float,
    block_range: Tuple[int, int],
    front_layer: bool,
) -> jax.Array:
    dtype = lvec.gammas.dtype
    nb, bpl, tpb = circ.num_blocks, circ.bpl, circ.tpb
    layers = nb // bpl
    groups = _layered_plan(circ)

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    w, z, grad1q = _front_cosweep_batched(
        circ, thetas1q, lvec, vh_phi, front_layer, dtype
    )

    th_layers = thetas2q.reshape(layers, bpl, tpb)
    m_layers = masks.reshape(layers, bpl)

    def layer_body(carry, xs):
        w_, z_ = carry
        th_l, m_l = xs
        dots = jnp.zeros((bpl, 4), dtype)
        for group in groups:
            w_, z_, rows = _half_layer_cosweep(
                circ, group, th_l, m_l, w_, z_, trunc_thr, dtype
            )
            dots = dots + rows
        return (w_, z_), dots

    (w, z), scanned = jax.lax.scan(layer_body, (w, z), (th_layers, m_layers))
    grad2q = scanned.reshape(nb, tpb)

    half = circ.half_layer_num_blocks
    if half:
        # Trailing half-layer == leading even group of layer 0; accumulate.
        w, z, rows = _half_layer_cosweep(
            circ, groups[0], th_layers[0], m_layers[0], w, z, trunc_thr, dtype
        )
        grad2q = grad2q.at[:bpl].add(rows)

    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def _fast_dot_gradient_layered_zcache(
    circ: Ansatz,
    thetas: jax.Array,
    lvec: MPS,
    vh_phi: MPS,
    z_layers: MPS,  # stacked cache from v_dagger_mul_mps_layers
    trunc_thr: float,
    block_range: Tuple[int, int],
    front_layer: bool,
    grow_w: bool = False,
) -> jax.Array:
    """Layered co-sweep consuming the V†-sweep's per-layer z cache: the LAST
    pair group of every layer skips its z-side truncated update (the cached
    next-boundary state substitutes), removing half of the gradient's z
    decompositions.  Exact at no-truncation (the cached state IS the layer
    boundary); under truncation both are equally valid chi-approximations of
    the same exact state.

    ``grow_w`` (χ-growth scheduling, VERDICT r2 item 1b): when ``lvec`` is
    a rank-1 product state, the head layers run with the w side at a growing
    static bond dimension (2^phases, exact — see v_mul_mps_growing); head
    decompositions and environments shrink from (2·chi)³ to (2·χ_p)³.
    Chessboard (2-group) layers only."""
    dtype = lvec.gammas.dtype
    nb, bpl, tpb = circ.num_blocks, circ.bpl, circ.tpb
    layers = nb // bpl
    groups = _layered_plan(circ)

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    chi_z = vh_phi.chi
    if grow_w and len(groups) == 2:
        from .mps import mps_resize

        lvec = mps_resize(lvec, 1)  # exact for rank-1 product lvec

    w, z, grad1q = _front_cosweep_batched(
        circ, thetas1q, lvec, vh_phi, front_layer, dtype
    )

    th_layers = thetas2q.reshape(layers, bpl, tpb)
    m_layers = masks.reshape(layers, bpl)
    # cache[1:][j] = z state entering layer j+1 (cache[L] = trailing-half z).
    z_next = MPS(z_layers.gammas[1:], z_layers.lambdas[1:])

    def chessboard_layer(w_, z_, th_l, m_l, znx):
        """One chessboard layer: NO z-side updates at all.  Group 1 dots use
        the layer-entry boundary (z_); group 2 dots contract against the
        NEXT cached boundary with the group prefixes folded into the w-side
        transfers (_half_layer_cosweep_znext)."""
        dots = jnp.zeros((bpl, 4), dtype)
        w_, z_, rows = _half_layer_cosweep(
            circ, groups[0], th_l, m_l, w_, z_, trunc_thr, dtype, skip_z=True
        )
        dots = dots + rows
        w_, _, rows = _half_layer_cosweep_znext(
            circ, groups[1], th_l, m_l, w_, znx, trunc_thr, dtype
        )
        return w_, znx, dots + rows

    head_rows = []
    head = 0
    if grow_w and len(groups) == 2:
        from .mps import mps_resize

        chi_w = 1
        for j in range(layers):
            if chi_w >= chi_z:
                break
            znx_j = MPS(z_next.gammas[j], z_next.lambdas[j])
            th_l, m_l = th_layers[j], m_layers[j]
            dots = jnp.zeros((bpl, 4), dtype)
            chi_w = min(chi_z, 2 * chi_w)
            w = mps_resize(w, chi_w)
            w, z, rows = _half_layer_cosweep(
                circ, groups[0], th_l, m_l, w, z, trunc_thr, dtype, skip_z=True
            )
            dots = dots + rows
            chi_w = min(chi_z, 2 * chi_w)
            w = mps_resize(w, chi_w)
            w, _, rows = _half_layer_cosweep_znext(
                circ, groups[1], th_l, m_l, w, znx_j, trunc_thr, dtype
            )
            z = znx_j
            head_rows.append(dots + rows)
            head = j + 1
        if w.chi < chi_z:
            w = mps_resize(w, chi_z)

    def layer_body(carry, xs):
        w_, z_ = carry
        th_l, m_l, znx = xs
        if len(groups) == 2:
            w_, z_, dots = chessboard_layer(w_, z_, th_l, m_l, znx)
        else:
            dots = jnp.zeros((bpl, 4), dtype)
            for gi, group in enumerate(groups):
                last = gi == len(groups) - 1
                w_, z_, rows = _half_layer_cosweep(
                    circ, group, th_l, m_l, w_, z_, trunc_thr, dtype, skip_z=last
                )
                dots = dots + rows
                if last:
                    z_ = znx
        return (w_, z_), dots

    if head < layers:
        tail = (
            th_layers[head:],
            m_layers[head:],
            MPS(z_next.gammas[head:], z_next.lambdas[head:]),
        )
        (w, z), scanned = jax.lax.scan(layer_body, (w, z), tail)
    else:
        scanned = jnp.zeros((0, bpl, 4), dtype)
    if head_rows:
        scanned = jnp.concatenate([jnp.stack(head_rows), scanned], axis=0)
    grad2q = scanned.reshape(nb, tpb)

    half = circ.half_layer_num_blocks
    if half:
        # Trailing half-layer: z already holds cache[L]; no further z needed.
        w, z, rows = _half_layer_cosweep(
            circ,
            groups[0],
            th_layers[0],
            m_layers[0],
            w,
            z,
            trunc_thr,
            dtype,
            skip_z=True,
        )
        grad2q = grad2q.at[:bpl].add(rows)

    # The co-sweep's final w IS V @ lvec — returned so callers can read the
    # objective overlap <V lvec | phi> forward-consistently for free.
    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)]), w


def _layered_eligible(circ: Ansatz) -> bool:
    if not (circ.is_trotterized and circ.entangler == "cx"):
        return False
    nb, bpl = circ.num_blocks, circ.bpl
    if nb == 0 or bpl == 0 or nb % bpl != 0:
        return False
    # Pattern must tile layer-periodically with the canonical triplet layout.
    for k in range(nb):
        if (
            circ.blocks[0, k] != circ.blocks[0, k % bpl]
            or circ.blocks[1, k] != circ.blocks[1, k % bpl]
        ):
            return False
    return True


# -----------------------------------------------------------------------------
# Layer-batched gradient for PLAIN (non-Trotter) layer-periodic ansatze, all
# entanglers {cx, cz, cp}.  Same machinery as the Trotter triplet path
# (environment stacks + pair-local 4x4 algebra + batched pair updates), with
# per-block prefix composition instead of triplet lockstep, no Rz framings,
# and the CP angle derivative in pair-local form: the reference's two-point
# difference CP(a) - CP(a+pi) (mps_dot_objective.py:186-196) reduces to
# -1j * <(pre^H P11 pre) w | z> because CP(a)^H CP(a+pi) = CZ = I - 2 P11.
# -----------------------------------------------------------------------------


def _plain_layer_period(circ: Ansatz) -> int:
    """Smallest d dividing num_blocks with a d-periodic block pattern and at
    least two layers; 0 if none."""
    nb = circ.num_blocks
    for d in range(1, nb // 2 + 1):
        if nb % d:
            continue
        if all(
            int(circ.blocks[0, k]) == int(circ.blocks[0, k % d])
            and int(circ.blocks[1, k]) == int(circ.blocks[1, k % d])
            for k in range(nb)
        ):
            return d
    return 0


def _plain_layered_eligible(circ: Ansatz) -> bool:
    if circ.is_trotterized or circ.num_blocks == 0:
        return False
    if not all(
        abs(int(circ.blocks[0, k]) - int(circ.blocks[1, k])) == 1
        for k in range(circ.num_blocks)
    ):
        return False
    return _plain_layer_period(circ) > 0


def _plain_groups(circ: Ansatz, bpl: int):
    """Splits one layer's block indices into maximal runs whose pairs are
    pairwise disjoint-or-identical (such runs commute freely)."""
    groups, current, pairs = [], [], set()
    for k in range(bpl):
        lo = min(int(circ.blocks[0, k]), int(circ.blocks[1, k]))
        if current and any(abs(lo - p) == 1 for p in pairs):
            groups.append(current)
            current, pairs = [], set()
        current.append(k)
        pairs.add(lo)
    if current:
        groups.append(current)
    return groups


def _embed_1q(g, on_hi: bool):
    """A single 1q gate embedded as 4x4 in (lo, hi) lo-major ordering."""
    eye = G.eye2(g.dtype)
    return G.kron2(eye, g) if on_hi else G.kron2(g, eye)


def _plain_group_cosweep(
    circ: Ansatz,
    group,  # in-layer block indices, pairwise disjoint-or-identical pairs
    layer_thetas,  # (bpl, tpb)
    layer_masks,  # (bpl,)
    w: MPS,
    z: MPS,
    trunc_thr: float,
    dtype,
):
    """Processes one disjoint-pair run of a plain layer; returns
    (w, z, dots (bpl, tpb)) with rows only for this group's blocks filled."""
    cp = circ.entangler == "cp"
    cx = circ.entangler == "cx"
    tpb = circ.tpb
    y_mat, z_mat, x_mat = G.y(dtype), G.z(dtype), G.x(dtype)
    rs_fn, s_mat = (G.rx, x_mat) if cx else (G.rz, z_mat)

    los: List[int] = []
    blocks_info = []
    for k in group:
        ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
        lo = min(ctrl, targ)
        if lo not in los:
            los.append(lo)
        blocks_info.append((k, ctrl > targ, los.index(lo)))

    dots_rows = jnp.zeros((layer_thetas.shape[0], tpb), dtype)
    _, _, l_stack, r_stack = _env_stacks(w, z)
    n4 = _pair_env_tensors(w, z, l_stack, r_stack, tuple(los))  # (P, 4, 4)

    prefix = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (len(los), 4, 4))
    p11 = jnp.zeros((4, 4), dtype).at[3, 3].set(1.0)

    for k, ctrl_is_hi, p in blocks_info:
        th = layer_thetas[k]
        msk = layer_masks[k].astype(dtype)
        if cx:
            ent = _cx_lo_hi(ctrl_is_hi, dtype)
        elif cp:
            # CP / CZ are diagonal-symmetric: orientation-free as 4x4.
            ent = G.controlled(G.phase(th[4], dtype), dtype)
        else:
            ent = G.controlled(G.z(dtype), dtype)
        pre = jnp.matmul(ent, prefix[p])
        if cp:
            y4 = jnp.einsum("ji,jk,kl->il", jnp.conj(pre), p11, pre)
            dots_rows = dots_rows.at[k, 4].add(
                (-1j) * jnp.sum(jnp.conj(y4) * n4[p]) * msk
            )
        specs = [
            (G.ry, y_mat, ctrl_is_hi, 0),  # on ctrl
            (G.rz, z_mat, ctrl_is_hi, 1),  # on ctrl
            (G.ry, y_mat, not ctrl_is_hi, 2),  # on targ
            (rs_fn, s_mat, not ctrl_is_hi, 3),  # on targ
        ]
        for gate_fn, pauli, on_hi, col in specs:
            pre = jnp.matmul(_embed_1q(gate_fn(th[col], dtype), on_hi), pre)
            p4 = _embed_pauli(pauli, on_hi)
            y4 = jnp.einsum("ji,jk,kl->il", jnp.conj(pre), p4, pre)
            dots_rows = dots_rows.at[k, col].add(
                0.5j * jnp.sum(jnp.conj(y4) * n4[p]) * msk
            )
        prefix = prefix.at[p].set(pre)

    order = np.argsort(los)
    sorted_los = tuple(los[i] for i in order)
    w, z = _apply_pairs_both(w, z, prefix[jnp.asarray(order)], sorted_los, trunc_thr)
    return w, z, dots_rows


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _fast_dot_gradient_layered_plain(
    circ: Ansatz,
    thetas: jax.Array,
    lvec: MPS,
    vh_phi: MPS,
    trunc_thr: float,
    block_range: Tuple[int, int],
    front_layer: bool,
) -> jax.Array:
    dtype = lvec.gammas.dtype
    nb, tpb = circ.num_blocks, circ.tpb
    bpl = _plain_layer_period(circ)
    layers = nb // bpl
    groups = _plain_groups(circ, bpl)

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    w, z, grad1q = _front_cosweep_batched(
        circ, thetas1q, lvec, vh_phi, front_layer, dtype
    )

    th_layers = thetas2q.reshape(layers, bpl, tpb)
    m_layers = masks.reshape(layers, bpl)

    def layer_body(carry, xs):
        w_, z_ = carry
        th_l, m_l = xs
        dots = jnp.zeros((bpl, tpb), dtype)
        for group in groups:
            w_, z_, rows = _plain_group_cosweep(
                circ, group, th_l, m_l, w_, z_, trunc_thr, dtype
            )
            dots = dots + rows
        return (w_, z_), dots

    (w, z), scanned = jax.lax.scan(layer_body, (w, z), (th_layers, m_layers))
    grad2q = scanned.reshape(nb, tpb)
    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


def _check_grow_w_contract(grow_w: bool, lvec: MPS) -> None:
    """grow_w truncates ``lvec`` to chi=1 (mps_resize), which is exact ONLY
    for a rank-1 product state with all bond weight at index 0 — anything
    else silently discards amplitude and corrupts the gradient.  Validate
    eagerly when the arrays are concrete (under jit tracing the caller owns
    the contract; the production drivers pass basis/Neel product states)."""
    if not grow_w:
        return
    lam = lvec.lambdas
    if isinstance(lam, jax.core.Tracer):
        return
    if np.any(np.asarray(lam)[:, 1:] != 0):
        raise ValueError(
            "grow_w=True requires a chi=1 product-state lvec "
            "(all bond spectra confined to index 0)"
        )


def fast_dot_gradient(
    circ: Ansatz,
    thetas,
    lvec: MPS,
    vh_phi: MPS,
    *,
    trunc_thr: float = no_truncation_threshold(),
    block_range: Optional[Tuple[int, int]] = None,
    front_layer: bool = True,
    z_layers: Optional[MPS] = None,
    grow_w: bool = False,
) -> jax.Array:
    """Complex gradient of ``<lvec | V† | phi>`` with MPS states.

    ``vh_phi`` must already hold ``V† phi`` (cached from the objective pass)
    — the same contract as the reference (mps_dot_objective.py:63-68).
    ``z_layers`` (optional): the per-layer boundary cache returned by
    ``v_dagger_mul_mps_layers`` — when given (layered Trotter ansatze), the
    co-sweep skips every layer's last z-side truncated update.
    Trotterized CX ansatze take the triplet layer-batched path (6 batched SVD
    phases per layer); plain layer-periodic nearest-neighbour ansatze (any
    entangler cx/cz/cp) take the generic layer-batched path; everything else
    (including non-nearest-neighbour layouts, via the swap network) uses the
    sequential env-cached sweep.
    """
    # The analytic co-sweep differentiates ONE application of V; the value
    # engines loop circuit_power times, so accepting power > 1 here would
    # silently return the gradient of a different function (the reference
    # pins power == 1 too: parametric_circuit.py:136-141 "experimental,
    # must be equal to 1 for now").
    assert circ.circuit_power == 1, "analytic gradient requires circuit_power == 1"
    _check_grow_w_contract(grow_w, lvec)
    block_range = (0, circ.num_blocks) if block_range is None else tuple(block_range)
    assert 0 <= block_range[0] < block_range[1] <= circ.num_blocks
    if z_layers is not None and _layered_eligible(circ):
        # The V†-sweep's per-layer cache (v_dagger_mul_mps_layers) removes
        # the gradient's z-side decompositions entirely.
        grad, _ = _fast_dot_gradient_layered_zcache(
            circ,
            jnp.asarray(thetas),
            lvec,
            vh_phi,
            z_layers,
            float(trunc_thr),
            block_range,
            bool(front_layer),
            bool(grow_w),
        )
        return grad
    if _layered_eligible(circ):
        impl = _fast_dot_gradient_layered
    elif _plain_layered_eligible(circ):
        impl = _fast_dot_gradient_layered_plain
    else:
        impl = _fast_dot_gradient_impl
    return impl(
        circ,
        jnp.asarray(thetas),
        lvec,
        vh_phi,
        float(trunc_thr),
        block_range,
        bool(front_layer),
    )


def fast_dot_gradient_with_state(
    circ: Ansatz,
    thetas,
    lvec: MPS,
    vh_phi: MPS,
    z_layers: MPS,
    *,
    trunc_thr: float = no_truncation_threshold(),
    grow_w: bool = False,
) -> Tuple[jax.Array, MPS]:
    """Full gradient PLUS the co-sweep's final w state (= ``V @ lvec``).

    The w state falls out of the z-free layered co-sweep for free; reading
    the objective overlap ``<V lvec | phi>`` from it keeps the jitted
    optimizer's objective forward-consistent with a cheap forward-only
    ``value`` path (models/sp_lhs/jit_asp.py).  Requires the layered
    Trotter path (``v_dagger_layer_cache_eligible``)."""
    assert _layered_eligible(circ)
    assert circ.circuit_power == 1, "analytic gradient requires circuit_power == 1"
    _check_grow_w_contract(grow_w, lvec)
    return _fast_dot_gradient_layered_zcache(
        circ,
        jnp.asarray(thetas),
        lvec,
        vh_phi,
        z_layers,
        float(trunc_thr),
        (0, circ.num_blocks),
        True,
        bool(grow_w),
    )
