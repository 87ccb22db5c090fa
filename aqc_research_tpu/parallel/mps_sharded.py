"""Sharded MPS pair updates: spread a half-layer's truncated SVDs over chips.

BASELINE config 5 (28q chi=128 multi-chip) scaling design.  Measured facts
behind it (RESULTS.md / CLAUDE.md): the MPS sweep cost on TPU is dominated
by the per-pair eigh/SVD decompositions, and batched decompositions do NOT
amortize on one chip (XLA loops over the batch).  Within a chessboard
half-layer all pair updates are independent (disjoint (Γ, λ) tensors), so
sharding the PAIR axis of the batched update over a mesh axis divides the
dominant cost by the number of devices:

    pairs  ->  sharded over axis "tp"  ->  per-device vmap of the Vidal
    pair update  ->  updated (Γ_lo, Γ_hi, λ) slices re-gathered by XLA's
    SPMD partitioner when scattered back into the replicated MPS arrays.

Communication per half-layer is O(P·chi^2) tensor slices over ICI — tiny
compared with the O(P·chi^3) decomposition work it parallelizes.

The reference has no distributed capability at all (SURVEY.md §2.4); this
module is validated on a virtual 8-device CPU mesh (tests/test_parallel.py)
and by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mps import MPS, _pair_update, no_truncation_threshold


def apply_pairs_mps_sharded(
    mps: MPS,
    gates4: jax.Array,
    lo_sites: Tuple[int, ...],
    mesh: Mesh,
    *,
    axis: str = "tp",
    trunc_thr: float = no_truncation_threshold(),
) -> MPS:
    """Like ops.mps.apply_pairs_mps, but the pair batch is sharded over
    ``mesh`` axis ``axis`` (pad-to-multiple with identity gates).

    Call inside jit with the mesh entered (or rely on jax.sharding's lazy
    constraint): the per-pair decomposition runs device-local; XLA inserts
    the gathers when the updated slices are scattered back.
    """
    n, chi = mps.num_sites, mps.chi
    rdtype = mps.lambdas.dtype
    dtype = mps.gammas.dtype
    ndev = int(mesh.shape[axis])

    lo = np.asarray(lo_sites, dtype=int)
    assert lo.size > 0 and np.all(np.diff(lo) >= 2), "pairs must be disjoint"
    assert lo.min() >= 0 and lo.max() + 1 < n

    # Pad the pair list to a multiple of the axis size by REPEATING the last
    # pair WITH ITS REAL GATE: duplicate entries then compute identical
    # results, so the duplicate scatter below is harmless regardless of
    # write order (scatter order with duplicate indices is unspecified).
    pad = (-lo.size) % ndev
    if pad:
        lo_pad = np.concatenate([lo, np.repeat(lo[-1], pad)])
        gates4 = jnp.concatenate(
            [gates4, jnp.broadcast_to(gates4[-1], (pad, 4, 4))], axis=0
        )
    else:
        lo_pad = lo

    boundary = jnp.zeros((1, chi), rdtype).at[0, 0].set(1.0)
    lam_ext = jnp.concatenate([boundary, mps.lambdas, boundary], axis=0)

    lam_l = lam_ext[lo_pad]
    lam_c = lam_ext[lo_pad + 1]
    lam_r = lam_ext[lo_pad + 2]
    g1 = mps.gammas[lo_pad]
    g2 = mps.gammas[lo_pad + 1]

    shard = NamedSharding(mesh, P(axis))

    def batched(ll, lc, lr, a, b, g):
        # _pair_update is natively batched over the leading pair axis.
        return _pair_update(ll, lc, lr, a, b, g, chi, trunc_thr, dtype, rdtype)

    # Constrain the pair axis onto the mesh: each device decomposes its own
    # slice of pairs; everything inside the vmap is device-local.
    args = [
        jax.lax.with_sharding_constraint(x, shard)
        for x in (lam_l, lam_c, lam_r, g1, g2, gates4)
    ]
    new_g1, new_g2, new_lam = batched(*args)

    # Scatter back into the replicated MPS arrays (XLA re-gathers the shards).
    gammas = mps.gammas.at[lo_pad].set(new_g1).at[lo_pad + 1].set(new_g2)
    lambdas = mps.lambdas.at[lo_pad].set(new_lam)
    return MPS(gammas, lambdas)
