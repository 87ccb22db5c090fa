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
