"""Memory-sharded (site-chain) MPS engine vs the replicated engine.

Every test runs on the 8-virtual-device CPU mesh (tests/conftest.py) at f64
precision; the chain engine must reproduce the replicated engine's numbers
to ~machine precision (the per-pair SVDs see bitwise-identical inputs, so
gauge freedom does not enter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.parallel.mps_chain import (
    ChainMPS,
    chain_apply_pairs,
    chain_dot,
    chain_from_mps,
    chain_to_mps,
    pairs_to_dense,
)


def _mesh(ndev):
    devs = jax.devices()[:ndev]
    return Mesh(np.array(devs), ("sp",))


def _random_mps(rng, n, chi):
    """Random normalized MPS at bond dimension chi (via a dense state)."""
    v = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    v /= np.linalg.norm(v)
    return mpsop.mps_from_dense(v, chi)


def _random_gates(rng, count):
    """Random unitary 4x4 gates (QR of a random complex matrix)."""
    a = rng.standard_normal((count, 4, 4)) + 1j * rng.standard_normal(
        (count, 4, 4)
    )
    q, _ = np.linalg.qr(a)
    return jnp.asarray(q)


class TestRepresentation:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        mps = _random_mps(rng, 8, 8)
        mesh = _mesh(4)
        cmps = chain_from_mps(mps, mesh)
        back = chain_to_mps(cmps)
        np.testing.assert_allclose(
            np.asarray(back.gammas), np.asarray(mps.gammas), atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(back.lambdas), np.asarray(mps.lambdas), atol=1e-14
        )

    def test_sharded_layout(self):
        rng = np.random.default_rng(8)
        mps = _random_mps(rng, 8, 4)
        mesh = _mesh(4)
        cmps = chain_from_mps(mps, mesh)
        # Site axis is split: each device holds 2 of the 8 site rows.
        shard_shapes = {
            s.data.shape for s in cmps.gammas.addressable_shards
        }
        assert shard_shapes == {(2, 2, 4, 4)}

    def test_block_size_contract(self):
        rng = np.random.default_rng(9)
        mps = _random_mps(rng, 6, 4)
        with pytest.raises(AssertionError):
            chain_from_mps(mps, _mesh(4))  # 6 % 4 != 0


class TestChainDot:
    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_dot_parity(self, ndev):
        rng = np.random.default_rng(11)
        n, chi = 8, 8
        a = _random_mps(rng, n, chi)
        b = _random_mps(rng, n, chi)
        want = complex(np.asarray(mpsop.mps_dot(a, b)))
        mesh = _mesh(ndev)
        got = complex(
            np.asarray(chain_dot(chain_from_mps(a, mesh), chain_from_mps(b, mesh), mesh))
        )
        assert abs(got - want) < 1e-12

    def test_dot_mixed_chi(self):
        rng = np.random.default_rng(12)
        a = _random_mps(rng, 8, 8)
        b = _random_mps(rng, 8, 4)
        want = complex(np.asarray(mpsop.mps_dot(a, b)))
        mesh = _mesh(2)
        got = complex(
            np.asarray(chain_dot(chain_from_mps(a, mesh), chain_from_mps(b, mesh), mesh))
        )
        assert abs(got - want) < 1e-12

    def test_norm_one(self):
        # chi=16 represents an 8-qubit state EXACTLY (center rank 2^4), so
        # the norm is truly 1; smaller chi truncates and norms drift below 1.
        rng = np.random.default_rng(13)
        a = _random_mps(rng, 8, 16)
        mesh = _mesh(4)
        ca = chain_from_mps(a, mesh)
        assert abs(complex(np.asarray(chain_dot(ca, ca, mesh))) - 1.0) < 1e-12


class TestChainApplyPairs:
    def _check(self, n, chi, ndev, lo_sites, seed, trunc_thr=None):
        rng = np.random.default_rng(seed)
        mps = _random_mps(rng, n, chi)
        gates = _random_gates(rng, len(lo_sites))
        thr = (
            mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr
        )
        want = mpsop.apply_pairs_mps(mps, gates, tuple(lo_sites), trunc_thr=thr)

        mesh = _mesh(ndev)
        cmps = chain_from_mps(mps, mesh)
        dense, active, parity = pairs_to_dense(
            n, gates, lo_sites, mps.gammas.dtype
        )
        got = chain_to_mps(
            chain_apply_pairs(
                cmps, dense, active, parity, mesh, trunc_thr=thr
            )
        )
        np.testing.assert_allclose(
            np.asarray(got.gammas), np.asarray(want.gammas), atol=1e-10,
            err_msg="gammas mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(got.lambdas), np.asarray(want.lambdas), atol=1e-10,
            err_msg="lambdas mismatch",
        )

    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_even_half_layer(self, ndev):
        self._check(8, 8, ndev, [0, 2, 4, 6], seed=21)

    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_odd_half_layer_straddles_blocks(self, ndev):
        self._check(8, 8, ndev, [1, 3, 5], seed=22)

    def test_partial_even(self):
        self._check(8, 8, 4, [2, 6], seed=23)

    def test_partial_odd_only_straddle(self):
        # n=8 over 4 devices: m=2, anchor 1/3/5 all straddle; exercise a
        # single active straddling pair with every other slot masked.
        self._check(8, 8, 4, [3], seed=24)

    def test_minimal_blocks_m2(self):
        # m=2: even pairs are exactly one interior pair per device, odd
        # pairs are ALL straddles.
        self._check(8, 6, 4, [0, 2, 4, 6], seed=25)
        self._check(8, 6, 4, [1, 3, 5], seed=26)

    def test_with_truncation(self):
        # chi=4 forces real truncation decisions through the sharded path.
        self._check(8, 4, 4, [1, 3, 5], seed=27, trunc_thr=1e-8)

    def test_sequence_of_half_layers_stays_in_sync(self):
        rng = np.random.default_rng(31)
        n, chi, ndev = 8, 8, 4
        mps = _random_mps(rng, n, chi)
        mesh = _mesh(ndev)
        cmps = chain_from_mps(mps, mesh)
        for seed, los in ((41, [0, 2, 4, 6]), (42, [1, 3, 5]), (43, [0, 2, 4, 6])):
            g = _random_gates(np.random.default_rng(seed), len(los))
            mps = mpsop.apply_pairs_mps(mps, g, tuple(los))
            dense, active, parity = pairs_to_dense(n, g, los, cmps.gammas.dtype)
            cmps = chain_apply_pairs(cmps, dense, active, parity, mesh)
        got = chain_to_mps(cmps)
        np.testing.assert_allclose(
            np.asarray(got.gammas), np.asarray(mps.gammas), atol=1e-9
        )
        # End-to-end overlap must equal the replicated self-overlap (NOT
        # necessarily 1: chi=8 truncates a random 8-qubit state, so the
        # truncated norm sits below 1 in both engines identically).
        ov = complex(np.asarray(mpsop.mps_dot(got, mps)))
        self_ov = complex(np.asarray(mpsop.mps_dot(mps, mps)))
        assert abs(ov - self_ov) < 1e-10
