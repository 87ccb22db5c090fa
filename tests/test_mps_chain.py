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

    def test_bytes_per_device_scaling(self):
        """The memory-scaling contract, measured: each device holds exactly
        global/P bytes of the chain state, and a sharded half-layer update
        KEEPS the output site-sharded (no silent replication)."""
        from aqc_research_tpu.parallel.mps_chain import chain_bytes_per_device

        rng = np.random.default_rng(10)
        n, chi, ndev = 8, 8, 4
        mps = _random_mps(rng, n, chi)
        mesh = _mesh(ndev)
        cmps = chain_from_mps(mps, mesh)
        per_dev, total = chain_bytes_per_device(cmps)
        assert per_dev * ndev == total

        gates = _random_gates(rng, 3)
        dense, active, parity = pairs_to_dense(n, gates, [1, 3, 5], cmps.gammas.dtype)
        out = chain_apply_pairs(cmps, dense, active, parity, mesh, trunc_thr=1e-8)
        out_per_dev, out_total = chain_bytes_per_device(out)
        assert out_per_dev * ndev == out_total
        assert {s.data.shape for s in out.gammas.addressable_shards} == {
            (n // ndev, 2, chi, chi)
        }

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

    def test_chain_composes_with_fused_kernels(self):
        """The fused Pallas routes (fused_pair / fused_rand) compose with
        the memory-sharded chain engine: the halo pair updates call the
        shared ops.mps._pair_update, so the per-device batched decomposition
        routes into a pallas_call per shard (interpret mode here — the same
        program structure the TPU compiles).  Parity vs the UNSHARDED
        native-impl reference on the physical state (gauge-free: different
        impls rotate degenerate factors, so raw tensors are NOT comparable).
        Odd pairs straddle block boundaries, so the fused routes also run
        through the halo-exchange path."""
        from aqc_research_tpu.config import (
            set_fused_pair,
            set_precision,
            set_svd_impl,
        )
        from aqc_research_tpu.ops import rand_svd
        from aqc_research_tpu.ops.mps import mps_to_vector

        set_precision("fast")  # the fused paths are c64-only by design
        saved_min_n = rand_svd.RAND_MIN_N
        try:
            rng = np.random.default_rng(61)
            n, chi, ndev = 8, 16, 4
            mps = _random_mps(rng, n, chi)
            los = [1, 3, 5]  # all straddle blocks at m=2
            gates = _random_gates(rng, len(los))

            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(
                mps_to_vector(
                    mpsop.apply_pairs_mps(mps, gates, tuple(los), trunc_thr=1e-6)
                )
            )

            mesh = _mesh(ndev)
            rand_svd.RAND_MIN_N = 2 * chi  # activate rand at this test size
            for impl in ("jacobi", "rand"):
                set_svd_impl(impl)
                set_fused_pair(True)
                jax.clear_caches()
                cmps = chain_from_mps(mps, mesh)
                dense, active, parity = pairs_to_dense(
                    n, gates, los, cmps.gammas.dtype
                )
                got = chain_to_mps(
                    chain_apply_pairs(
                        cmps, dense, active, parity, mesh, trunc_thr=1e-6
                    )
                )
                np.testing.assert_allclose(
                    np.asarray(mps_to_vector(got)), ref, atol=5e-5,
                    err_msg=f"chain fused impl={impl}",
                )
        finally:
            rand_svd.RAND_MIN_N = saved_min_n
            set_fused_pair(None)
            set_svd_impl(None)
            set_precision("high")
            jax.clear_caches()


# -----------------------------------------------------------------------------
# Phase B: environment pipelines + the sharded layered co-sweep gradient.
# -----------------------------------------------------------------------------

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.mps_gradient import _env_stacks, fast_dot_gradient
from aqc_research_tpu.parallel.mps_chain import (
    chain_env_stacks,
    chain_fast_dot_gradient,
    chain_v_dagger_mul_mps,
)
from aqc_research_tpu.utils import rand_thetas


class TestChainEnvStacks:
    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_stack_parity(self, ndev):
        rng = np.random.default_rng(51)
        n, chi = 8, 8
        w = _random_mps(rng, n, chi)
        z = _random_mps(rng, n, chi)
        _, _, l_want, r_want = _env_stacks(w, z)
        mesh = _mesh(ndev)
        l_got, r_got = chain_env_stacks(
            chain_from_mps(w, mesh), chain_from_mps(z, mesh), mesh
        )
        np.testing.assert_allclose(
            np.asarray(l_got), np.asarray(l_want[:n]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(r_got), np.asarray(r_want[:n]), atol=1e-12
        )


def _chain_grad_case(n, layers, chi, ndev, seed, second_order, trunc_thr=None):
    rng = np.random.default_rng(seed)
    circ = TrotterAnsatz.make(
        n, make_trotter_like_circuit(n, layers), second_order
    )
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, circ.num_thetas))
    lvec = _random_mps(rng, n, chi)
    phi = _random_mps(rng, n, chi)
    vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi)
    thr = mpsop.no_truncation_threshold() if trunc_thr is None else trunc_thr

    want = np.asarray(
        fast_dot_gradient(circ, thetas, lvec, vh_phi, trunc_thr=thr)
    )
    mesh = _mesh(ndev)
    got = np.asarray(
        chain_fast_dot_gradient(
            circ, thetas, lvec, vh_phi, mesh, trunc_thr=thr
        )
    )
    return got, want, circ, thetas, phi, vh_phi, mesh


class TestChainGradient:
    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_gradient_parity_first_order(self, ndev):
        got, want, *_ = _chain_grad_case(8, 2, 16, ndev, 61, False)
        assert np.max(np.abs(got - want)) < 1e-10

    def test_gradient_parity_second_order(self):
        got, want, *_ = _chain_grad_case(8, 2, 16, 4, 62, True)
        assert np.max(np.abs(got - want)) < 1e-10

    def test_gradient_parity_truncating(self):
        # chi below the exact rank: both engines make the SAME truncation
        # decisions (identical per-pair inputs), so parity still holds.
        got, want, *_ = _chain_grad_case(8, 2, 8, 4, 63, False, trunc_thr=1e-9)
        assert np.max(np.abs(got - want)) < 1e-9


class TestChainVdagger:
    @pytest.mark.parametrize("second_order", [False, True])
    def test_vdagger_parity(self, second_order):
        # The comparison is PHYSICAL (bond spectra + overlaps with external
        # probes), not raw tensors: near-degenerate singular values let
        # 1e-16 compilation-level differences in the composed gates rotate
        # SVD factors O(1) within clustered subspaces, so Γ entries are
        # only comparable when both paths consume bitwise-identical gate
        # arrays (which the apply-pairs tests pin).  λ and every physical
        # quantity are stable.
        rng = np.random.default_rng(71)
        n, chi, layers = 8, 16, 2
        circ = TrotterAnsatz.make(
            n, make_trotter_like_circuit(n, layers), second_order
        )
        thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, circ.num_thetas))
        phi = _random_mps(rng, n, chi)
        want, _cache = mpsop.v_dagger_mul_mps_layers(circ, thetas, phi)
        mesh = _mesh(4)
        got_c = chain_v_dagger_mul_mps(
            circ, thetas, chain_from_mps(phi, mesh), mesh
        )
        got = chain_to_mps(got_c)
        # Bond spectra match everywhere.
        np.testing.assert_allclose(
            np.asarray(got.lambdas), np.asarray(want.lambdas), atol=1e-11
        )
        # Overlaps with independent probe states match.
        for seed in (101, 102, 103):
            probe = _random_mps(np.random.default_rng(seed), n, chi)
            ov_got = complex(
                np.asarray(
                    chain_dot(chain_from_mps(probe, mesh), got_c, mesh)
                )
            )
            ov_want = complex(np.asarray(mpsop.mps_dot(probe, want)))
            assert abs(ov_got - ov_want) < 1e-10, seed

    @pytest.mark.parametrize("second_order", [False, True])
    def test_vdagger_physical_parity(self, second_order):
        # Against the block-at-a-time engine the comparison must be
        # physical: overlaps with external states, not raw tensors.
        rng = np.random.default_rng(73)
        n, chi = 8, 16
        circ = TrotterAnsatz.make(
            n, make_trotter_like_circuit(n, 2), second_order
        )
        thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, circ.num_thetas))
        phi = _random_mps(rng, n, chi)
        probe = _random_mps(rng, n, chi)
        want = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        mesh = _mesh(4)
        got_c = chain_v_dagger_mul_mps(
            circ, thetas, chain_from_mps(phi, mesh), mesh
        )
        ov_got = complex(
            np.asarray(chain_dot(chain_from_mps(probe, mesh), got_c, mesh))
        )
        ov_want = complex(np.asarray(mpsop.mps_dot(probe, want)))
        assert abs(ov_got - ov_want) < 1e-10

    def test_objective_value_parity(self):
        # End-to-end objective: <lvec | V† phi> computed fully sharded.
        rng = np.random.default_rng(72)
        n, chi = 8, 16
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, circ.num_thetas))
        lvec = _random_mps(rng, n, chi)
        phi = _random_mps(rng, n, chi)
        mesh = _mesh(4)
        vh_c = chain_v_dagger_mul_mps(
            circ, thetas, chain_from_mps(phi, mesh), mesh
        )
        got = complex(
            np.asarray(chain_dot(chain_from_mps(lvec, mesh), vh_c, mesh))
        )
        want = complex(
            np.asarray(
                mpsop.mps_dot(lvec, mpsop.v_dagger_mul_mps(circ, thetas, phi))
            )
        )
        assert abs(got - want) < 1e-10


class TestChainCollectiveProfile:
    """Pinned compiled-HLO collective profile of the chain engine (the
    SURVEY §5 ring contract): ZERO all-gathers — no program ever
    rematerializes the full state — and only the designed O(chi^2)
    ppermute ring traffic."""

    @staticmethod
    def _counts(compiled_text):
        import collections
        import re

        return collections.Counter(
            re.findall(
                r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([\w-]+)\(",
                compiled_text,
                re.M,
            )
        )

    def test_apply_pairs_profile_odd_parity(self):
        # Odd parity is the halo-heaviest path: lam-left in, (Gamma0,
        # lambda0) from the right, updated straddling Gamma0 back.
        rng = np.random.default_rng(81)
        n, chi, ndev = 16, 8, 4
        mps = _random_mps(rng, n, chi)
        mesh = _mesh(ndev)
        cmps = chain_from_mps(mps, mesh)
        gates = _random_gates(rng, 7)
        dense, active, parity = pairs_to_dense(
            n, gates, [1, 3, 5, 7, 9, 11, 13], cmps.gammas.dtype
        )
        assert parity == 1

        def f(g, l, gd, act):
            out = chain_apply_pairs(ChainMPS(g, l), gd, act, 1, mesh)
            return out.gammas, out.lam_r

        txt = (
            jax.jit(f)
            .lower(cmps.gammas, cmps.lam_r, dense, active)
            .compile()
            .as_text()
        )
        counts = self._counts(txt)
        assert counts.get("all-gather", 0) == 0, counts
        assert counts.get("all-gather-start", 0) == 0, counts
        assert counts.get("all-to-all", 0) == 0, counts
        # Designed halos: lam-left, Gamma0+lambda0 right-to-left, Gamma0
        # back — XLA may split or fuse them, so pin a tight range.
        cp = counts.get("collective-permute", 0) + counts.get(
            "collective-permute-start", 0
        )
        assert 1 <= cp <= 8, counts

    def test_dot_profile_ring(self):
        rng = np.random.default_rng(82)
        n, chi, ndev = 16, 8, 4
        a = chain_from_mps(_random_mps(rng, n, chi), _mesh(ndev))
        mesh = _mesh(ndev)

        def f(ga, la, gb, lb):
            return chain_dot(ChainMPS(ga, la), ChainMPS(gb, lb), mesh)

        txt = (
            jax.jit(f)
            .lower(a.gammas, a.lam_r, a.gammas, a.lam_r)
            .compile()
            .as_text()
        )
        counts = self._counts(txt)
        assert counts.get("all-gather", 0) == 0, counts
        assert counts.get("all-to-all", 0) == 0, counts
        # The ring: one chi x chi env handoff per round (P rounds), plus
        # the final scalar psum (all-reduce).
        cp = counts.get("collective-permute", 0) + counts.get(
            "collective-permute-start", 0
        )
        assert 1 <= cp <= ndev + 1, counts

    def test_env_stacks_profile(self):
        rng = np.random.default_rng(83)
        n, chi, ndev = 16, 8, 4
        mesh = _mesh(ndev)
        w = chain_from_mps(_random_mps(rng, n, chi), mesh)

        def f(gw, lw, gz, lz):
            return chain_env_stacks(
                ChainMPS(gw, lw), ChainMPS(gz, lz), mesh
            )

        txt = (
            jax.jit(f)
            .lower(w.gammas, w.lam_r, w.gammas, w.lam_r)
            .compile()
            .as_text()
        )
        counts = self._counts(txt)
        assert counts.get("all-gather", 0) == 0, counts
        cp = counts.get("collective-permute", 0) + counts.get(
            "collective-permute-start", 0
        )
        # Two pipelines (left + right) of P handoffs each.
        assert 2 <= cp <= 2 * ndev + 2, counts


class TestChainOptimize:
    """End-to-end memory-sharded production story: the ASP objective, its
    analytic gradient, and a full jitted L-BFGS horizon — every state and
    environment site-sharded."""

    def _setup(self, n, chi, layers, perturb, seed):
        import aqc_research_tpu.targets.trotter as trotop

        rng = np.random.default_rng(seed)
        circ = TrotterAnsatz.make(
            n, make_trotter_like_circuit(n, layers), True
        )
        th0 = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=0.8, delta=1.0
            )
        )
        th = th0 + perturb * jnp.asarray(rng.standard_normal(circ.num_thetas))
        ini = trotop.neel_init_state(n)
        phi = trotop.Trotter(
            num_qubits=n, evol_time=0.8, num_steps=3, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-10, chi_max=chi)
        lvec = mpsop.mps_from_program(ini, n, chi_max=chi)
        return circ, th, lvec, phi

    def test_objective_and_gradient_parity(self):
        from aqc_research_tpu.parallel.mps_chain import (
            chain_asp_objective_and_gradient,
        )

        n, chi = 8, 16
        circ, th, lvec, phi = self._setup(n, chi, 2, 0.1, 91)
        mesh = _mesh(4)
        fobj_c, grad_c = chain_asp_objective_and_gradient(
            circ,
            th,
            chain_from_mps(lvec, mesh),
            chain_from_mps(phi, mesh),
            mesh,
        )
        # Replicated twin of the same contract.
        vh = mpsop.v_dagger_mul_mps_layers(circ, th, phi)[0]
        dot = mpsop.mps_dot(lvec, vh)
        g = fast_dot_gradient(circ, th, lvec, vh)
        fobj_r = 1.0 - abs(complex(np.asarray(dot))) ** 2
        grad_r = np.real(-2.0 * np.conj(complex(np.asarray(dot))) * np.asarray(g))
        assert abs(float(fobj_c) - fobj_r) < 1e-10
        np.testing.assert_allclose(np.asarray(grad_c), grad_r, atol=1e-9)

    def test_full_sharded_lbfgs_horizon(self):
        from aqc_research_tpu.parallel.mps_chain import (
            chain_asp_objective_and_gradient,
            chain_optimize_horizon,
        )

        n, chi = 8, 16
        circ, th, lvec, phi = self._setup(n, chi, 2, 0.1, 92)
        mesh = _mesh(4)
        lvec_c, phi_c = chain_from_mps(lvec, mesh), chain_from_mps(phi, mesh)
        f0, _ = chain_asp_objective_and_gradient(
            circ, th, lvec_c, phi_c, mesh
        )
        res = chain_optimize_horizon(
            circ, th, lvec_c, phi_c, mesh, maxiter=25, fobj_thr=1e-5
        )
        f_final = float(np.asarray(res.fobj))
        assert f_final < float(f0) * 0.05, (f_final, float(f0))
        assert f_final < 1e-3, f_final
