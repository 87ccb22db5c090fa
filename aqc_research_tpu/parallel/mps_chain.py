"""Memory-sharded MPS: the site chain lives in blocks, one block per device.

SURVEY §5's long-context analogue ("shard the MPS site chain and/or χ×χ bond
matrices across devices; left/right environment passing as a ring pipeline
over ICI").  The pair-sharded engine (parallel/mps_sharded.py) divides the
SVD *compute* but replicates (Γ, λ) on every device; this engine divides the
*state*: device d holds only sites [d·m, (d+1)·m) of the chain (m = n/P), so
per-device memory is ~1/P of the replicated footprint and χ or n beyond
single-chip HBM can scale over the mesh.

Design (explicit shard_map over a mesh axis, default ``"sp"``):

* **Representation** — :class:`ChainMPS` stores ``gammas (n, 2, χ, χ)`` and
  ``lam_r (n, χ)`` with the SITE axis sharded.  ``lam_r[i]`` is the Vidal
  bond weight to the *right* of site i; ``lam_r[n-1]`` is the trivial
  boundary e₀ = (1, 0, …), which makes the λ-folded site tensor
  ``A_i = Γ_i · diag(lam_r[i])`` uniform across ALL sites (bitwise the
  ``ops.mps._folded_tensors`` convention) and the layout evenly divisible.
* **Half-layer pair updates** (:func:`chain_apply_pairs`) — a chessboard
  half-layer of parity p touches pairs (i, i+1) with i ≡ p (mod 2).  With an
  even block size every interior pair is device-local; the only halos are
  O(χ²): the left neighbour's last λ (every half-layer) and, for odd parity,
  the right neighbour's (Γ₀, λ₀) in and the updated Γ₀ back — three
  ``ppermute`` rounds per half-layer against the O(m·χ³) local SVD work.
* **Inner products / environments** (:func:`chain_dot`) — the transfer
  contraction is inherently sequential, so it runs as a RING PIPELINE: every
  device scans its local block and hands the χ×χ boundary environment to its
  right neighbour; after P rounds the full product has visited every block.

The reference has no distributed MPS capability at all (its engine is the
single-process Aer C++ simulator, ``mps_operations.py:251-257``); the design
here is the TPU-native answer to scaling that engine's state memory.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mps import MPS, _pair_update, no_truncation_threshold


def _perm_right(ndev: int):
    """src d -> dst d+1 (cyclic): values flow rightward along the chain."""
    return [(d, (d + 1) % ndev) for d in range(ndev)]


def _perm_left(ndev: int):
    """src d -> dst d-1 (cyclic): values flow leftward along the chain."""
    return [(d, (d - 1) % ndev) for d in range(ndev)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChainMPS:
    """Vidal-form MPS with the site axis sharded over a mesh.

    ``lam_r[i]`` = bond right of site i (``lam_r[n-1]`` = boundary e₀), so
    ``Γ_i · diag(lam_r[i])`` is the uniform λ-folded site tensor."""

    gammas: jax.Array  # (n, 2, chi, chi)
    lam_r: jax.Array  # (n, chi)

    @property
    def num_sites(self) -> int:
        return self.gammas.shape[0]

    @property
    def chi(self) -> int:
        return self.gammas.shape[-1]

    def tree_flatten(self):
        return (self.gammas, self.lam_r), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        del aux
        return cls(*leaves)


def chain_block_size(n: int, mesh: Mesh, axis: str = "sp") -> int:
    """Sites per device; validates the layout contract (even blocks)."""
    ndev = int(mesh.shape[axis])
    assert n % ndev == 0, f"num_sites {n} must divide over {ndev} devices"
    m = n // ndev
    assert m % 2 == 0 and m >= 2, (
        f"block size {m} must be even (chessboard pairs must tile blocks "
        f"uniformly); pad the chain or use fewer devices"
    )
    return m


def chain_from_mps(mps: MPS, mesh: Mesh, *, axis: str = "sp") -> ChainMPS:
    """Shards an MPS onto the mesh (site axis split into per-device blocks)."""
    n, chi = mps.num_sites, mps.chi
    chain_block_size(n, mesh, axis)
    e0 = jnp.zeros((1, chi), mps.lambdas.dtype).at[0, 0].set(1.0)
    lam_r = jnp.concatenate([mps.lambdas, e0], axis=0)
    sh = NamedSharding(mesh, P(axis))
    return ChainMPS(
        jax.device_put(mps.gammas, sh), jax.device_put(lam_r, sh)
    )


def chain_to_mps(cmps: ChainMPS) -> MPS:
    """Gathers the chain back into a replicated MPS (drops the e₀ row)."""
    return MPS(cmps.gammas, cmps.lam_r[:-1])


def chain_bytes_per_device(cmps: ChainMPS) -> tuple[int, int]:
    """(max addressable bytes on any one device, global bytes) of the chain
    state — the memory-scaling contract is per-device ≈ global / P.  Useful
    for sizing χ/n against per-chip HBM before launching a sharded run."""
    per_dev: dict[int, int] = {}
    total = 0
    for arr in (cmps.gammas, cmps.lam_r):
        total += arr.nbytes
        for s in arr.addressable_shards:
            per_dev[s.device.id] = per_dev.get(s.device.id, 0) + s.data.nbytes
    return max(per_dev.values()), total


def chain_dot(a: ChainMPS, b: ChainMPS, mesh: Mesh, *, axis: str = "sp"):
    """``<a | b>`` via the ring-pipelined transfer contraction.

    Every device scans its local λ-folded block given the incoming boundary
    environment and hands the (χ_a, χ_b) result to its right neighbour; the
    true environment completes the circle after P rounds (device k's scan is
    the live one in round k).  Per-device work is P·m = n transfer steps —
    the same wall-clock as the unsharded scan — but no device ever holds
    more than its own 1/P of the state.  Parity: ops.mps.mps_dot.
    """
    n = a.num_sites
    assert b.num_sites == n
    ndev = int(mesh.shape[axis])
    chain_block_size(n, mesh, axis)
    ca, cb = a.chi, b.chi
    dtype = jnp.promote_types(a.gammas.dtype, b.gammas.dtype)
    spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(),
        check_vma=False,
    )
    def ring(ga, la, gb, lb):
        me = jax.lax.axis_index(axis)
        aw = (ga * la[:, None, None, :].astype(ga.dtype)).astype(dtype)
        az = (gb * lb[:, None, None, :].astype(gb.dtype)).astype(dtype)

        def step(env, ts):
            t1, t2 = ts
            return jnp.einsum("sab,aA,sAB->bB", jnp.conj(t1), env, t2), None

        env = jnp.zeros((ca, cb), dtype).at[0, 0].set(1.0)
        for _ in range(ndev):
            env, _ = jax.lax.scan(step, env, (aw, az))
            env = jax.lax.ppermute(env, axis, _perm_right(ndev))
        # After P (scan, handoff) rounds the full-chain product has wrapped
        # around to device 0.
        val = env[0, 0]
        return jax.lax.psum(
            jnp.where(me == 0, val, jnp.zeros((), dtype)), axis
        )

    return ring(a.gammas, a.lam_r, b.gammas, b.lam_r)


def chain_norm(cmps: ChainMPS, mesh: Mesh, *, axis: str = "sp"):
    return jnp.sqrt(jnp.real(chain_dot(cmps, cmps, mesh, axis=axis)))


def pairs_to_dense(
    n: int, gates4, lo_sites, dtype
) -> tuple:
    """Packs a half-layer's (gates, anchors) into the dense per-slot layout
    :func:`chain_apply_pairs` consumes: slot s of parity p is the pair
    anchored at 2s + p.  Returns (gates_dense (n//2, 4, 4), active (n//2,),
    parity).  All anchors must share one parity (chessboard half-layer)."""
    lo = np.asarray(lo_sites, dtype=int)
    assert lo.size > 0 and lo.min() >= 0 and lo.max() + 1 < n
    parity = int(lo[0] % 2)
    assert np.all(lo % 2 == parity), "half-layer anchors must share parity"
    slots = (lo - parity) // 2
    n_slots = n // 2
    gates_dense = jnp.zeros((n_slots, 4, 4), dtype)
    eye = jnp.eye(4, dtype=dtype)
    gates_dense = gates_dense + eye[None]
    gates_dense = gates_dense.at[slots].set(jnp.asarray(gates4, dtype))
    active = np.zeros(n_slots, dtype=bool)
    active[slots] = True
    return gates_dense, jnp.asarray(active), parity


def chain_apply_pairs(
    cmps: ChainMPS,
    gates_dense: jax.Array,  # (n//2, 4, 4), slot s = pair anchored at 2s+parity
    active: jax.Array,  # (n//2,) bool — inactive slots keep their state
    parity: int,
    mesh: Mesh,
    *,
    axis: str = "sp",
    trunc_thr: float = no_truncation_threshold(),
) -> ChainMPS:
    """One chessboard half-layer of truncated Vidal pair updates, sharded by
    site block.

    Every device updates its local pairs in one batched ``_pair_update``
    call; the layout contract (even block size) makes the slot count uniform
    across devices, so the program is SPMD with masked writeback for
    inactive slots.  Halo traffic per half-layer, all O(χ²) ppermutes:
    the left neighbour's last λ in (both parities); for odd parity also the
    right neighbour's (Γ₀, λ₀) in and the updated straddling Γ₀ back.  For
    odd parity the dense slot (n-2)/2 … n//2-1 tail anchored at n-1 does not
    exist and MUST be inactive (``pairs_to_dense`` guarantees it).

    Functional parity target: ``ops.mps.apply_pairs_mps`` (pinned by
    tests/test_mps_chain.py).
    """
    n, chi = cmps.num_sites, cmps.chi
    ndev = int(mesh.shape[axis])
    m = chain_block_size(n, mesh, axis)
    k = m // 2
    dtype = cmps.gammas.dtype
    rdtype = cmps.lam_r.dtype
    thr = float(trunc_thr)
    assert parity in (0, 1)
    assert gates_dense.shape == (n // 2, 4, 4) and active.shape == (n // 2,)
    spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    def update(gam, lamr, g4, act):
        me = jax.lax.axis_index(axis)
        e0 = jnp.zeros((chi,), rdtype).at[0].set(1.0)
        # Halo: bond left of this block's first site = left neighbour's last
        # λ (device 0: the open-boundary e₀).
        lam_in = jax.lax.ppermute(lamr[m - 1], axis, _perm_right(ndev))
        lam_in = jnp.where(me == 0, e0, lam_in)

        if parity == 0:
            lo = np.arange(k) * 2  # local anchors 0, 2, …, m-2: all interior
            lam_l = jnp.concatenate([lam_in[None], lamr[lo[1:] - 1]], axis=0)
            lam_rr = lamr[lo + 1]
            g2 = gam[lo + 1]
        else:
            # Local anchors 1, 3, …, m-1; the last pair straddles into the
            # right neighbour's first site.
            g0_in = jax.lax.ppermute(gam[0], axis, _perm_left(ndev))
            l0_in = jax.lax.ppermute(lamr[0], axis, _perm_left(ndev))
            lo = np.arange(k) * 2 + 1
            lam_l = lamr[lo - 1]
            lam_rr = jnp.concatenate([lamr[lo[:-1] + 1], l0_in[None]], axis=0)
            g2 = jnp.concatenate([gam[lo[:-1] + 1], g0_in[None]], axis=0)
        lam_c = lamr[lo]
        g1 = gam[lo]

        ng1, ng2, nlam = _pair_update(
            lam_l, lam_c, lam_rr, g1, g2, g4, chi, thr, dtype, rdtype
        )

        a_g = act[:, None, None, None]
        gam = gam.at[lo].set(jnp.where(a_g, ng1, g1))
        lamr = lamr.at[lo].set(jnp.where(act[:, None], nlam, lam_c))
        if parity == 0:
            gam = gam.at[lo + 1].set(jnp.where(a_g, ng2, g2))
        else:
            gam = gam.at[lo[:-1] + 1].set(
                jnp.where(a_g[:-1], ng2[:-1], gam[lo[:-1] + 1])
            )
            # Straddling Γ back to the right neighbour's site 0.  When the
            # straddle is inactive the ORIGINAL g0 (as received) rides back,
            # so the neighbour's state is untouched — including the cyclic
            # device-(P-1) -> device-0 hop, whose slot (anchor n-1) is
            # contractually inactive.
            g0_out = jax.lax.ppermute(
                jnp.where(act[-1], ng2[-1], g0_in), axis, _perm_right(ndev)
            )
            gam = gam.at[0].set(g0_out)
        return gam, lamr

    gam, lamr = update(
        cmps.gammas, cmps.lam_r, jnp.asarray(gates_dense, dtype), active
    )
    return ChainMPS(gam, lamr)


def chain_apply_1q_dense(cmps: ChainMPS, gates: jax.Array, mesh: Mesh, *, axis: str = "sp") -> ChainMPS:
    """Distinct 1q gates at EVERY site (``gates``: (n, 2, 2)); purely local
    (Γ_i <- g_i Γ_i touches no bonds).  Parity: ops.mps.apply_1q_many."""
    n = cmps.num_sites
    chain_block_size(n, mesh, axis)
    spec = P(axis)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    def apply(gam, g):
        return jnp.einsum("pij,pjab->piab", g.astype(gam.dtype), gam)

    return ChainMPS(apply(cmps.gammas, jnp.asarray(gates)), cmps.lam_r)


# -----------------------------------------------------------------------------
# Environment pipelines (the SURVEY §5 "ring-like ICI pattern"): boundary
# environments flow around the device ring; each device stores only its own
# block of the environment stacks.
# -----------------------------------------------------------------------------


def _fold_block(gam, lamr):
    return gam * lamr[:, None, None, :].astype(gam.dtype)


def _env_pipelines(aw, az, axis: str, ndev: int):
    """Per-device environment stacks of <w|z> from local folded blocks.

    Returns (l_blk, r_blk), each (m, cw, cz) device-local: ``l_blk[j]`` is
    the environment of all sites strictly left of global site d·m+j,
    ``r_blk[j]`` of all sites at/right of it — the shard of the replicated
    engine's L/R stacks (ops.mps_gradient._env_stacks) this device owns.
    Two ring pipelines of P (local scan, χ×χ handoff) rounds; device k's
    round-k scan is the live one (left: k ascending; right: descending).
    """
    m = aw.shape[0]
    cw, cz = aw.shape[-1], az.shape[-1]
    dtype = jnp.promote_types(aw.dtype, az.dtype)
    me = jax.lax.axis_index(axis)
    e00 = jnp.zeros((cw, cz), dtype).at[0, 0].set(1.0)

    def lstep(env, ts):
        t1, t2 = ts
        new = jnp.einsum("aA,sab,sAB->bB", env, jnp.conj(t1), t2)
        return new, env  # store the PRE-absorption env = L[site]

    l_blk = jnp.zeros((m, cw, cz), dtype)
    env = e00
    for k in range(ndev):
        env_out, stored = jax.lax.scan(lstep, env, (aw, az))
        l_blk = jnp.where(me == k, stored, l_blk)
        env = jax.lax.ppermute(env_out, axis, _perm_right(ndev))

    def rstep(env, ts):
        t1, t2 = ts
        new = jnp.einsum("sab,sAB,bB->aA", jnp.conj(t1), t2, env)
        return new, new  # store the POST-absorption env = R[site]

    r_blk = jnp.zeros((m, cw, cz), dtype)
    env = e00
    for k in range(ndev):
        env_out, stored = jax.lax.scan(rstep, env, (aw[::-1], az[::-1]))
        r_blk = jnp.where(me == ndev - 1 - k, stored[::-1], r_blk)
        env = jax.lax.ppermute(env_out, axis, _perm_left(ndev))
    return l_blk, r_blk


def chain_env_stacks(w: ChainMPS, z: ChainMPS, mesh: Mesh, *, axis: str = "sp"):
    """Sharded (n, cw, cz) L/R environment stacks of <w|z> (test surface)."""
    n = w.num_sites
    ndev = int(mesh.shape[axis])
    chain_block_size(n, mesh, axis)
    spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    def run(gw, lw, gz, lz):
        return _env_pipelines(
            _fold_block(gw, lw), _fold_block(gz, lz), axis, ndev
        )

    return run(w.gammas, w.lam_r, z.gammas, z.lam_r)


def _pair_n4_local(aw, az, l_blk, r_blk, parity: int, axis: str, ndev: int):
    """Two-site environment tensors N₄ of <w|z> for this device's pair slots
    ((k, 4, 4); rows = z physical (u,v), cols = w physical (s,t)) — the
    shard of ops.mps_gradient._pair_env_tensors.  Halos (right neighbour):
    first site tensors (straddling pairs) and the first two R envs."""
    m = aw.shape[0]
    k = m // 2
    cw, cz = aw.shape[-1], az.shape[-1]
    dtype = jnp.promote_types(aw.dtype, az.dtype)
    me = jax.lax.axis_index(axis)
    e00 = jnp.zeros((cw, cz), dtype).at[0, 0].set(1.0)

    r0 = jax.lax.ppermute(r_blk[0], axis, _perm_left(ndev))
    # R[n] (the last device's r0 halo) is the trivial boundary.
    r0 = jnp.where(me == ndev - 1, e00, r0)
    if parity == 0:
        lo = np.arange(k) * 2
        awl, awh = aw[lo], aw[lo + 1]
        azl, azh = az[lo], az[lo + 1]
        r_env = jnp.concatenate([r_blk[lo[:-1] + 2], r0[None]], axis=0)
    else:
        aw0 = jax.lax.ppermute(aw[0], axis, _perm_left(ndev))
        az0 = jax.lax.ppermute(az[0], axis, _perm_left(ndev))
        r1 = jax.lax.ppermute(r_blk[1], axis, _perm_left(ndev))
        lo = np.arange(k) * 2 + 1
        awl = aw[lo]
        awh = jnp.concatenate([aw[lo[:-1] + 1], aw0[None]], axis=0)
        azl = az[lo]
        azh = jnp.concatenate([az[lo[:-1] + 1], az0[None]], axis=0)
        # r at lo+2: local for interior; the straddling slot reaches two
        # sites into the neighbour (its garbage on the last device is
        # masked out — that slot is contractually inactive).
        r_env = jnp.concatenate([r_blk[lo[:-1] + 2], r1[None]], axis=0)
    l_env = l_blk[lo]

    def one(le, twl, twh, tzl, tzh, re):
        tw = jnp.einsum("sam,tmb->stab", twl, twh)
        tz = jnp.einsum("uAM,vMB->uvAB", tzl, tzh)
        tz = jnp.einsum("uvAB,bB->uvAb", tz, re)
        x = jnp.einsum("aA,stab->stAb", le, jnp.conj(tw))
        return jnp.einsum("stAb,uvAb->uvst", x, tz)

    n4 = jax.vmap(one)(l_env, awl, awh, azl, azh, r_env)
    return n4.reshape(k, 4, 4)


# -----------------------------------------------------------------------------
# Layered Trotter co-sweep gradient under chain sharding.  Same pair-local
# triplet algebra as ops.mps_gradient._half_layer_cosweep, with the dense
# per-slot layout of chain_apply_pairs and the sharded environment stacks.
# -----------------------------------------------------------------------------


def _group_dense_maps(circ, group):
    """Static layout of one half-layer group: (slots, blk3, parity) where
    ``slots[i]`` is the dense pair slot of group member i and ``blk3[i, b]``
    the member's layer-block index for triplet position b."""
    los = np.asarray([lo for _, lo in group], dtype=int)
    parity = int(los[0] % 2)
    assert np.all(los % 2 == parity), "group anchors must share parity"
    slots = (los - parity) // 2
    t_idx = np.asarray([t for t, _ in group], dtype=int)
    blk3 = 3 * t_idx[:, None] + np.arange(3)[None, :]
    return slots, blk3, parity


def _group_cosweep_program(
    w: ChainMPS,
    z: ChainMPS,
    th_dense: jax.Array,  # (n//2, 3, tpb)
    msk_dense: jax.Array,  # (n//2, 3) — inactive slots are all-zero
    parity: int,
    mesh: Mesh,
    axis: str,
    dtype,
):
    """dots (n//2, 3, 4) and composed triplet prefixes (n//2, 4, 4), both
    slot-sharded.  Mirrors the prefix/Pauli algebra of
    ops.mps_gradient._half_layer_cosweep exactly (4x4 per-slot matmuls are
    device-local; only the environment machinery communicates)."""
    from ..circuit import gates as G
    from ..ops.mps_gradient import (
        _cx_lo_hi,
        _embed_1q_batch,
        _embed_pauli,
        _rz_frame_lo_hi,
    )

    n = w.num_sites
    ndev = int(mesh.shape[axis])
    chain_block_size(n, mesh, axis)
    spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec, spec),
        check_vma=False,
    )
    def run(gw, lw, gz, lz, th, msk):
        aw = _fold_block(gw, lw)
        az = _fold_block(gz, lz)
        l_blk, r_blk = _env_pipelines(aw, az, axis, ndev)
        n4 = _pair_n4_local(aw, az, l_blk, r_blk, parity, axis, ndev)
        k = n4.shape[0]

        y_mat, z_mat, x_mat = G.y(dtype), G.z(dtype), G.x(dtype)
        prefix = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (k, 4, 4))
        dots = jnp.zeros((k, 3, 4), dtype)
        half = 0.5j
        for b in range(3):
            ctrl_is_hi = b != 1
            ent = _cx_lo_hi(ctrl_is_hi, dtype)
            if b == 0:
                ent = jnp.matmul(ent, _rz_frame_lo_hi(-np.pi / 2, True, dtype))
            prefix = jnp.einsum("ij,pjk->pik", ent, prefix)
            th_b = th[:, b, :]
            msk_b = msk[:, b].astype(dtype)
            specs = [
                (G.ry, y_mat, ctrl_is_hi, 0),
                (G.rz, z_mat, ctrl_is_hi, 1),
                (G.ry, y_mat, not ctrl_is_hi, 2),
                (G.rx, x_mat, not ctrl_is_hi, 3),
            ]
            for gate_fn, pauli, on_hi, col in specs:
                g4 = _embed_1q_batch(gate_fn(th_b[:, col], dtype), on_hi)
                prefix = jnp.einsum("pij,pjk->pik", g4, prefix)
                p4 = _embed_pauli(pauli, on_hi)
                y4 = jnp.einsum("pji,jk,pkl->pil", jnp.conj(prefix), p4, prefix)
                vals = half * jnp.einsum("pij,pij->p", jnp.conj(y4), n4) * msk_b
                dots = dots.at[:, b, col].set(vals)
            if b == 2:
                frame = G.rz(np.pi / 2, dtype)
                g4 = _embed_1q_batch(
                    jnp.broadcast_to(frame, (k, 2, 2)), not ctrl_is_hi
                )
                prefix = jnp.einsum("pij,pjk->pik", g4, prefix)
        return dots, prefix

    return run(w.gammas, w.lam_r, z.gammas, z.lam_r, th_dense, msk_dense)


def chain_half_layer_cosweep(
    circ,
    group,
    layer_thetas,  # (bpl, tpb)
    layer_masks,  # (bpl,)
    w: ChainMPS,
    z: ChainMPS,
    trunc_thr: float,
    dtype,
    mesh: Mesh,
    axis: str = "sp",
):
    """One half-layer group of the layered co-sweep: per-parameter dots plus
    the truncated pair update of BOTH states, everything site-sharded.
    Returns (w', z', rows (bpl, 4))."""
    n = w.num_sites
    n_slots = n // 2
    tpb = circ.tpb
    slots, blk3, parity = _group_dense_maps(circ, group)

    th_dense = (
        jnp.zeros((n_slots, 3, tpb), layer_thetas.dtype)
        .at[slots]
        .set(layer_thetas[blk3])
    )
    msk_dense = (
        jnp.zeros((n_slots, 3), layer_masks.dtype).at[slots].set(layer_masks[blk3])
    )
    active = np.zeros(n_slots, dtype=bool)
    active[slots] = True
    active = jnp.asarray(active)

    dots_dense, prefix = _group_cosweep_program(
        w, z, th_dense, msk_dense, parity, mesh, axis, dtype
    )
    rows = (
        jnp.zeros((circ.bpl, 4), dtype)
        .at[blk3.reshape(-1)]
        .set(dots_dense[slots].reshape(-1, 4))
    )
    w = chain_apply_pairs(w, prefix, active, parity, mesh, axis=axis, trunc_thr=trunc_thr)
    z = chain_apply_pairs(z, prefix, active, parity, mesh, axis=axis, trunc_thr=trunc_thr)
    return w, z, rows


def chain_front_cosweep(
    circ, thetas1q, w: ChainMPS, z: ChainMPS, front_layer: bool, mesh: Mesh,
    axis: str, dtype,
):
    """Front Rz·Ry·Rz layer under chain sharding: the 1q applies are local;
    the per-site dots reuse ONE stack build (1q gates hit both states, so
    the environments are invariant — ops.mps_gradient._dots_from_stacks).
    Returns (w', z', grads (n, 3) site-sharded)."""
    from ..circuit import gates as G

    n = circ.num_qubits
    ndev = int(mesh.shape[axis])
    m = chain_block_size(n, mesh, axis)
    spec = P(axis)
    y_mat, z_mat = G.y(dtype), G.z(dtype)
    rounds = ((2, G.rz, z_mat), (1, G.ry, y_mat), (0, G.rz, z_mat))
    g_rounds = jnp.stack(
        [gate_fn(thetas1q[:, col], dtype) for col, gate_fn, _ in rounds]
    )  # (3, n, 2, 2)
    paulis = jnp.stack([p for _, _, p in rounds])  # (3, 2, 2)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(None, axis), P()),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    def run(gw, lw, gz, lz, g3, p3):
        me = jax.lax.axis_index(axis)
        cw, cz = gw.shape[-1], gz.shape[-1]
        edt = jnp.promote_types(gw.dtype, gz.dtype)
        e00 = jnp.zeros((cw, cz), edt).at[0, 0].set(1.0)
        if front_layer:
            l_blk, r_blk = _env_pipelines(
                _fold_block(gw, lw), _fold_block(gz, lz), axis, ndev
            )
            r_next = jax.lax.ppermute(r_blk[0], axis, _perm_left(ndev))
            r_next = jnp.where(me == ndev - 1, e00, r_next)
            r_shift = jnp.concatenate([r_blk[1:], r_next[None]], axis=0)
        grads = jnp.zeros((m, 3), dtype)
        for ridx, (col, _, _) in enumerate(rounds):
            g = g3[ridx].astype(gw.dtype)
            gw = jnp.einsum("pij,pjab->piab", g, gw)
            gz = jnp.einsum("pij,pjab->piab", g.astype(gz.dtype), gz)
            if front_layer:
                awc = _fold_block(gw, lw)
                azc = _fold_block(gz, lz)
                paw = jnp.einsum("ij,pjab->piab", p3[ridx].astype(awc.dtype), awc)
                vals = jnp.einsum(
                    "paA,psab,psAB,pbB->p", l_blk, jnp.conj(paw), azc, r_shift
                )
                grads = grads.at[:, col].set(0.5j * vals)
        return gw, gz, grads

    gw, gz, grads = run(
        w.gammas, w.lam_r, z.gammas, z.lam_r, g_rounds, paulis
    )
    return ChainMPS(gw, w.lam_r), ChainMPS(gz, z.lam_r), grads


def chain_fast_dot_gradient(
    circ,
    thetas,
    lvec,
    vh_phi,
    mesh: Mesh,
    *,
    axis: str = "sp",
    trunc_thr: float = no_truncation_threshold(),
    block_range=None,
    front_layer: bool = True,
) -> jax.Array:
    """Complex gradient of ``<lvec | V† | phi>`` with SITE-SHARDED MPS states
    — the memory-scaling twin of ops.mps_gradient.fast_dot_gradient's
    layered path (requires a layered Trotterized CX ansatz).

    ``lvec``/``vh_phi`` may be replicated :class:`~aqc_research_tpu.ops.mps.MPS`
    (sharded on entry) or already-:class:`ChainMPS`.  Per-device memory over
    the whole co-sweep is ~1/P of the replicated engine's: states,
    environment stacks, and pair batches all live in site blocks.
    """
    from ..ops.mps_gradient import _layered_eligible, _layered_plan

    assert _layered_eligible(circ), "chain gradient requires the layered Trotter family"
    w = lvec if isinstance(lvec, ChainMPS) else chain_from_mps(lvec, mesh, axis=axis)
    z = vh_phi if isinstance(vh_phi, ChainMPS) else chain_from_mps(vh_phi, mesh, axis=axis)
    dtype = w.gammas.dtype
    nb, bpl, tpb = circ.num_blocks, circ.bpl, circ.tpb
    layers = nb // bpl
    groups = _layered_plan(circ)
    thetas = jnp.asarray(thetas)
    block_range = (0, nb) if block_range is None else tuple(block_range)

    thetas1q = circ.subset1q(thetas)
    thetas2q = circ.subset2q(thetas)
    mask_np = np.zeros(nb)
    mask_np[block_range[0] : block_range[1]] = 1.0
    masks = jnp.asarray(mask_np)

    w, z, grad1q = chain_front_cosweep(
        circ, thetas1q, w, z, front_layer, mesh, axis, dtype
    )

    th_layers = thetas2q.reshape(layers, bpl, tpb)
    m_layers = masks.reshape(layers, bpl)

    def layer_body(carry, xs):
        w_, z_ = carry
        th_l, m_l = xs
        dots = jnp.zeros((bpl, 4), dtype)
        for group in groups:
            w_, z_, rows = chain_half_layer_cosweep(
                circ, group, th_l, m_l, w_, z_, trunc_thr, dtype, mesh, axis
            )
            dots = dots + rows
        return (w_, z_), dots

    (w, z), scanned = jax.lax.scan(layer_body, (w, z), (th_layers, m_layers))
    grad2q = scanned.reshape(nb, tpb)

    half = circ.half_layer_num_blocks
    if half:
        w, z, rows = chain_half_layer_cosweep(
            circ, groups[0], th_layers[0], m_layers[0], w, z, trunc_thr,
            dtype, mesh, axis,
        )
        grad2q = grad2q.at[:bpl].add(rows)

    return jnp.concatenate([grad1q.reshape(-1), grad2q.reshape(-1)])


def chain_asp_objective_and_gradient(
    circ,
    thetas,
    lvec: ChainMPS,
    phi: ChainMPS,
    mesh: Mesh,
    *,
    axis: str = "sp",
    trunc_thr: float = no_truncation_threshold(),
):
    """ASP fidelity objective ``1 - |<lvec | V†(Θ) phi>|²`` and its real
    analytic gradient, with EVERY state, environment stack, and pair batch
    site-sharded — per-device memory ~1/P across the full pipeline.

    The sharded twin of the replicated value/gradient contract used by the
    jitted optimizer (models/sp_lhs/jit_asp.py): V† sweep, overlap, and the
    layered co-sweep gradient all route through this module's ring/halo
    primitives.  Jit-compatible (one program per circuit)."""
    vh = chain_v_dagger_mul_mps(
        circ, thetas, phi, mesh, axis=axis, trunc_thr=trunc_thr
    )
    dot = chain_dot(lvec, vh, mesh, axis=axis)  # <lvec | V† phi>
    grad_c = chain_fast_dot_gradient(
        circ, thetas, lvec, vh, mesh, axis=axis, trunc_thr=trunc_thr
    )
    fobj = 1.0 - jnp.abs(dot) ** 2
    grad = jnp.real(-2.0 * jnp.conj(dot) * grad_c)
    return jnp.real(fobj).astype(grad.dtype), grad


def chain_optimize_horizon(
    circ,
    thetas0,
    lvec: ChainMPS,
    phi: ChainMPS,
    mesh: Mesh,
    *,
    axis: str = "sp",
    trunc_thr: float = no_truncation_threshold(),
    maxiter: int = 50,
    fobj_thr: float | None = None,
):
    """Jitted compact L-BFGS over the memory-sharded ASP objective: the
    whole optimization — V† sweeps, ring environments, halo pair updates,
    co-sweep gradients, the two-loop/Armijo optimizer — is ONE XLA program
    over the mesh.  The sharded counterpart of
    models/sp_lhs/jit_asp.optimize_horizon_mps_jit."""
    from ..optim.lbfgs import minimize_lbfgs_compact

    def vgrad(th):
        return chain_asp_objective_and_gradient(
            circ, th, lvec, phi, mesh, axis=axis, trunc_thr=trunc_thr
        )

    def value_only(th):
        # Linesearch trials need only the forward V† sweep + overlap.
        vh = chain_v_dagger_mul_mps(
            circ, th, phi, mesh, axis=axis, trunc_thr=trunc_thr
        )
        dot = chain_dot(lvec, vh, mesh, axis=axis)
        return (1.0 - jnp.abs(dot) ** 2).real.astype(th.dtype)

    def run(th0):
        return minimize_lbfgs_compact(
            value_only,
            th0,
            maxiter=maxiter,
            fobj_thr=fobj_thr,
            value_and_grad_fn=vgrad,
        )

    return jax.jit(run)(jnp.asarray(thetas0))


def chain_v_dagger_mul_mps(
    circ,
    thetas,
    cmps: ChainMPS,
    mesh: Mesh,
    *,
    axis: str = "sp",
    trunc_thr: float = no_truncation_threshold(),
) -> ChainMPS:
    """``V(Θ)† @ state`` for a layered Trotterized CX ansatz, site-sharded —
    the memory-scaling twin of ops.mps.v_dagger_mul_mps for this circuit
    family (each triplet's three daggered block gates compose into one 4x4
    per pair, so a half-layer costs ONE sharded truncated update)."""
    from ..ops.mps_gradient import _layered_eligible, _layered_plan
    from ..ops.statevector import block_gates, front_gates

    assert _layered_eligible(circ)
    thetas = jnp.asarray(thetas)
    dtype = cmps.gammas.dtype
    n = circ.num_qubits
    nb, bpl = circ.num_blocks, circ.bpl
    layers = nb // bpl
    half = circ.half_layer_num_blocks
    groups = _layered_plan(circ)
    gates = block_gates(circ, circ.subset2q(thetas), dtype, dagger=True)
    f1q = front_gates(circ, circ.subset1q(thetas), dtype, dagger=True)

    def lo_major(g, k):
        ctrl, targ = int(circ.blocks[0, k]), int(circ.blocks[1, k])
        if ctrl > targ:
            g = jnp.transpose(g.reshape(2, 2, 2, 2), (1, 0, 3, 2)).reshape(4, 4)
        return g

    def triplet_composite(gate_src, t):
        # Forward order G0, G1, G2 -> dagger composite G0† G1† G2† (the
        # gate_src already returns daggered per-block gates).
        g = lo_major(gate_src(3 * t), 3 * t)
        for b in (1, 2):
            g = jnp.matmul(g, lo_major(gate_src(3 * t + b), 3 * t + b))
        return g

    def apply_group(state, group, gate_src):
        slots, _, parity = _group_dense_maps(circ, group)
        n_slots = n // 2
        comp = jnp.stack([triplet_composite(gate_src, t) for t, _ in group])
        dense = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_slots, 4, 4))
        dense = dense.at[slots].set(comp)
        active = np.zeros(n_slots, dtype=bool)
        active[slots] = True
        return chain_apply_pairs(
            state, dense, jnp.asarray(active), parity, mesh, axis=axis,
            trunc_thr=trunc_thr,
        )

    out = cmps
    if half:
        # Trailing half-layer first (V† order): the 2nd-order Trotter tail
        # REUSES the leading even group's blocks and angles (the reference
        # symmetrization; same contract as _v_dagger_mul_mps_layers).
        assert half == 3 * len(groups[0])
        out = apply_group(out, groups[0], lambda k: gates[k])

    for layer in range(layers - 1, -1, -1):
        g_l = gates[layer * bpl : (layer + 1) * bpl]
        for group in reversed(groups):
            out = apply_group(out, group, lambda k: g_l[k])

    return chain_apply_1q_dense(out, f1q, mesh, axis=axis)
