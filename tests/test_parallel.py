"""Tests of the device-parallel layer: vmap multi-start, mesh sharding,
executor, and checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqc_research_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from aqc_research_tpu.ops.mps import mps_from_program, mps_to_vector
from aqc_research_tpu.circuit.program import ProgramBuilder
from aqc_research_tpu.parallel.executor import run_jobs
from aqc_research_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from aqc_research_tpu.parallel.multistart import (
    multistart_minimize,
    random_initial_thetas,
)


def _quad(x):
    return jnp.sum((x - 1.5) ** 2)


class TestMultistart:
    def test_vmap_lbfgs(self):
        key = jax.random.key(0)
        batch = random_initial_thetas(key, 6, 4)
        res = multistart_minimize(_quad, batch, maxiter=50)
        assert res.fobj.shape == (6,)
        assert float(jnp.max(res.fobj)) < 1e-8
        assert np.allclose(np.asarray(res.thetas), 1.5, atol=1e-3)

    def test_sharded_multistart(self):
        mesh = make_mesh((len(jax.devices()),), ("dp",))
        batch = random_initial_thetas(jax.random.key(1), 8, 4)
        res = multistart_minimize(
            _quad, batch, maxiter=50, mesh=mesh, batch_axis="dp"
        )
        assert float(jnp.max(res.fobj)) < 1e-8

    def test_multistart_on_real_objective(self):
        """Batched ASP loss over a mesh-sharded statevector."""
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops.statevector import v_dagger_mul_vec
        from aqc_research_tpu.utils import rand_state

        n = 5
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 1), False)
        target = jnp.asarray(rand_state(n))

        def loss(thetas):
            vh = v_dagger_mul_vec(circ, thetas, target)
            return 1.0 - jnp.abs(vh[0]) ** 2

        batch = random_initial_thetas(jax.random.key(2), 4, circ.num_thetas)
        res = multistart_minimize(loss, batch, maxiter=30)
        assert res.fobj.shape == (4,)
        # optimization reduces the loss from the random inits
        init_losses = jax.vmap(loss)(batch)
        assert float(jnp.min(res.fobj)) < float(jnp.min(init_losses))


class TestMesh:
    def test_sharded_state_apply(self):
        """Gate application on a tp-sharded statevector matches unsharded."""
        from aqc_research_tpu.circuit.ansatz import Ansatz
        from aqc_research_tpu.ops.statevector import v_mul_vec
        from aqc_research_tpu.utils import rand_circuit, rand_state, rand_thetas

        n = 6
        circ = Ansatz.make(n, "cx", rand_circuit(n, 8))
        thetas = rand_thetas(circ.num_thetas)
        state = rand_state(n)
        expected = np.asarray(v_mul_vec(circ, thetas, jnp.asarray(state)))

        mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
        sharded = shard_state(jnp.asarray(state), mesh, "tp")
        got = np.asarray(v_mul_vec(circ, thetas, sharded))
        assert np.max(np.abs(got - expected)) < 1e-12


class TestExecutor:
    def test_run_jobs_seeding_and_failure(self):
        def job(idx, config):
            if idx == 1:
                raise RuntimeError("boom")
            return {"cost": float(np.random.rand()), "idx": idx}

        results = run_jobs(
            [{}, {}, {}], seed=42, job_function=job, tolerate_failure=True
        )
        assert len(results) == 2  # failed job filtered
        assert all(r["status"] == "ok" for r in results)
        assert results[0]["seed"] == 42 + 7  # reference seeding convention

        with pytest.raises(RuntimeError):
            run_jobs([{}], seed=0, job_function=lambda i, c: 1 / 0)

    def test_run_jobs_cache_resume(self, tmp_path):
        """cache_dir: completed jobs persist and are reused on re-run;
        failed jobs are retried; a different base seed recomputes."""
        cache = str(tmp_path / "jobs")
        calls = {"n": 0}
        fail_once = {1: True}

        def job(idx, config):
            calls["n"] += 1
            if fail_once.pop(idx, False):
                raise RuntimeError("transient")
            return {"cost": float(np.random.rand()), "idx": idx}

        # First run: job 1 fails (and must NOT be cached).
        results = run_jobs(
            [{}] * 3, seed=42, job_function=job, tolerate_failure=True,
            cache_dir=cache,
        )
        assert len(results) == 2 and calls["n"] == 3
        first_costs = {r["idx"]: r["cost"] for r in results}

        # Resume: jobs 0/2 load from cache, job 1 is retried and succeeds.
        results = run_jobs(
            [{}] * 3, seed=42, job_function=job, tolerate_failure=True,
            cache_dir=cache,
        )
        assert calls["n"] == 4  # only the failed job recomputed
        assert len(results) == 3
        by_idx = {r["idx"]: r for r in results}
        for i in (0, 2):
            assert by_idx[i]["cached"] is True
            assert by_idx[i]["cost"] == first_costs[i]
        assert "cached" not in by_idx[1]

        # A different base seed invalidates every cache entry.
        results = run_jobs(
            [{}] * 3, seed=43, job_function=job, tolerate_failure=True,
            cache_dir=cache,
        )
        assert calls["n"] == 7
        assert all("cached" not in r for r in results)

    def test_run_jobs_cache_rejects_changed_config(self, tmp_path):
        """Same seed + same cache dir but CHANGED parameters (e.g. a
        different target matrix or maxiter) must recompute — stale results
        scored against a new target would silently corrupt the output."""
        cache = str(tmp_path / "jobs")
        calls = {"n": 0}

        def job(idx, config):
            calls["n"] += 1
            return {"cost": float(config["target"].sum()) + config["maxiter"]}

        cfg = {"target": np.eye(2), "maxiter": 10}
        run_jobs([cfg], seed=1, job_function=job, cache_dir=cache)
        assert calls["n"] == 1
        # Identical config: cache hit.
        res = run_jobs([cfg], seed=1, job_function=job, cache_dir=cache)
        assert calls["n"] == 1 and res[0]["cached"] is True
        # Changed scalar: recompute.
        cfg2 = {"target": np.eye(2), "maxiter": 20}
        res = run_jobs([cfg2], seed=1, job_function=job, cache_dir=cache)
        assert calls["n"] == 2 and "cached" not in res[0]
        # Changed target CONTENT (same shape/dtype): recompute.
        cfg3 = {"target": 2.0 * np.eye(2), "maxiter": 20}
        res = run_jobs([cfg3], seed=1, job_function=job, cache_dir=cache)
        assert calls["n"] == 3 and "cached" not in res[0]


class TestCheckpoint:
    def test_roundtrip_with_mps(self, tmp_path):
        qb = ProgramBuilder(3)
        qb.h(0)
        qb.cx(0, 1)
        mps = mps_from_program(qb.build(), 3, chi_max=4)
        state = {
            "thetas": np.arange(5.0),
            "horizon": 2,
            "tag": "exp1",
            "target": mps,
        }
        path = save_checkpoint(str(tmp_path / "ckpt"), state)
        loaded = load_checkpoint(path)
        np.testing.assert_allclose(loaded["thetas"], state["thetas"])
        assert loaded["horizon"] == 2 and loaded["tag"] == "exp1"
        np.testing.assert_allclose(
            np.asarray(mps_to_vector(loaded["target"])),
            np.asarray(mps_to_vector(mps)),
        )

    def test_missing_returns_none(self, tmp_path):
        assert load_checkpoint(str(tmp_path / "nope")) is None


class TestShardedMps:
    def test_sharded_pair_updates_match(self):
        """A half-layer of sharded pair updates matches the unsharded batch,
        including the pad-to-multiple path (BASELINE config 5 design)."""
        from aqc_research_tpu.ops.mps import apply_pairs_mps, rand_mps_vec
        from aqc_research_tpu.parallel.mps_sharded import apply_pairs_mps_sharded
        from aqc_research_tpu.circuit import gates as G

        np.random.seed(3)
        n, chi = 8, 8
        mps = rand_mps_vec(n, num_layers=2, chi_max=chi)
        los = (0, 2, 4)  # 3 pairs -> pads to 4 on a 4-device axis
        rng = np.random.default_rng(5)
        gates = []
        for _ in los:
            # random 2q unitary: product of 1q rotations + CX
            g = np.kron(
                np.asarray(G.np_ry(rng.uniform(-3, 3))),
                np.asarray(G.np_rz(rng.uniform(-3, 3))),
            )
            cx = np.asarray(G.controlled(G.np_x()))
            gates.append(cx @ g)
        gates = jnp.asarray(np.stack(gates))

        ref = apply_pairs_mps(mps, gates, los, trunc_thr=1e-12)

        mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
        got = apply_pairs_mps_sharded(
            mps, gates, los, mesh, trunc_thr=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(got.lambdas), np.asarray(ref.lambdas), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(mps_to_vector(got)), np.asarray(mps_to_vector(ref)),
            atol=1e-10,
        )

    def test_sharded_pair_updates_fused_kernels(self):
        """The fused Pallas routes (fused_pair / fused_rand) compose with
        the explicit shard_map engine: the device-local _pair_update calls
        route into a pallas_call per shard (interpret mode here — the same
        program structure the TPU compiles).  Parity vs the UNSHARDED
        native-impl reference on the physical state (gauge-free)."""
        from aqc_research_tpu.config import (
            set_fused_pair,
            set_precision,
            set_svd_impl,
        )
        from aqc_research_tpu.ops import rand_svd
        from aqc_research_tpu.ops.mps import apply_pairs_mps, rand_mps_vec
        from aqc_research_tpu.parallel.mps_sharded import apply_pairs_mps_sharded
        from aqc_research_tpu.circuit import gates as G

        np.random.seed(7)
        set_precision("fast")  # the fused paths are c64-only by design
        saved_min_n = rand_svd.RAND_MIN_N
        try:
            n, chi = 6, 16
            mps = rand_mps_vec(n, num_layers=2, chi_max=chi)
            los = (0, 2, 4)  # 3 pairs -> pads to 4 on a 4-device axis
            rng = np.random.default_rng(11)
            gates = []
            for _ in los:
                g = np.kron(
                    np.asarray(G.np_ry(rng.uniform(-3, 3))),
                    np.asarray(G.np_rz(rng.uniform(-3, 3))),
                )
                gates.append(np.asarray(G.controlled(G.np_x())) @ g)
            gates = jnp.asarray(np.stack(gates).astype(np.complex64))

            set_svd_impl("native")
            jax.clear_caches()
            ref = np.asarray(
                mps_to_vector(apply_pairs_mps(mps, gates, los, trunc_thr=1e-6))
            )

            mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
            rand_svd.RAND_MIN_N = 2 * chi  # activate rand at this test size
            for impl in ("jacobi", "rand"):
                set_svd_impl(impl)
                set_fused_pair(True)
                jax.clear_caches()
                got = apply_pairs_mps_sharded(
                    mps, gates, los, mesh, trunc_thr=1e-6
                )
                # Cross-IMPL f32 comparison (fused Pallas kernel vs native
                # LAPACK reference): factor roundoff through three pair
                # SVDs legitimately drifts the c64 state to ~1e-4 absolute
                # (measured flake at atol=5e-5: 6.7e-5 on 2/64 amplitudes,
                # run-to-run variant with XLA:CPU codegen).  This test pins
                # the sharded COMPOSITION of the fused routes; strict
                # factor-level parity lives in test_fused_pair/_rand.
                np.testing.assert_allclose(
                    np.asarray(mps_to_vector(got)), ref, atol=3e-4,
                    err_msg=f"sharded fused impl={impl}",
                )
        finally:
            rand_svd.RAND_MIN_N = saved_min_n
            set_fused_pair(None)
            set_svd_impl(None)
            set_precision("high")
            jax.clear_caches()

    def test_sharded_pad_multiple_duplicates(self):
        """2 pairs on a 4-device axis -> 2 duplicate pad entries."""
        from aqc_research_tpu.ops.mps import apply_pairs_mps, rand_mps_vec
        from aqc_research_tpu.parallel.mps_sharded import apply_pairs_mps_sharded
        from aqc_research_tpu.circuit import gates as G

        np.random.seed(9)
        n, chi = 6, 8
        mps = rand_mps_vec(n, num_layers=2, chi_max=chi)
        los = (1, 4)
        cz = np.asarray(G.controlled(G.np_z()))
        ry = np.kron(np.asarray(G.np_ry(0.7)), np.asarray(G.np_rz(-0.4)))
        gates = jnp.asarray(np.stack([cz @ ry, ry @ cz]))
        ref = apply_pairs_mps(mps, gates, los, trunc_thr=1e-12)
        mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
        got = apply_pairs_mps_sharded(mps, gates, los, mesh, trunc_thr=1e-12)
        np.testing.assert_allclose(
            np.asarray(mps_to_vector(got)), np.asarray(mps_to_vector(ref)),
            atol=1e-10,
        )

    def test_sharded_inside_jit(self):
        """The sharded update compiles inside jit (SPMD partitioning path)."""
        from aqc_research_tpu.ops.mps import mps_zero
        from aqc_research_tpu.parallel.mps_sharded import apply_pairs_mps_sharded
        from aqc_research_tpu.circuit import gates as G

        n, chi = 6, 4
        mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
        los = (0, 2, 4)

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def step(m, g):
            return apply_pairs_mps_sharded(m, g, los, mesh, trunc_thr=1e-10)

        m0 = mps_zero(n, chi)
        cx = jnp.asarray(np.asarray(G.controlled(G.np_x())))
        g = jnp.broadcast_to(cx, (len(los), 4, 4))
        out = step(m0, g)
        v = np.asarray(mps_to_vector(out))
        # CX on |00..0> is identity.
        assert abs(v[0] - 1.0) < 1e-9


    def test_collective_profile(self):
        """PINNED collective profile of the explicit shard_map pair update
        (VERDICT r2 item 2): zero all-gathers of the FULL Γ array — only the
        updated O(P·chi^2) pair slices (new Γ_lo / Γ_hi / λ') are exchanged
        per half-layer, plus O(1) tiny gate-padding collectives."""
        import collections
        import functools
        import re

        from aqc_research_tpu.circuit import gates as G
        from aqc_research_tpu.ops.mps import mps_zero
        from aqc_research_tpu.parallel.mps_sharded import apply_pairs_mps_sharded

        n, chi = 20, 32
        mesh = make_mesh((8,), ("tp",))
        los = tuple(range(0, n - 1, 2))  # 10 pairs -> padded to 16 over tp=8
        p_pad = 16

        @jax.jit
        def step(m, g):
            return apply_pairs_mps_sharded(m, g, los, mesh, trunc_thr=1e-10)

        m0 = mps_zero(n, chi)
        cx = jnp.asarray(np.asarray(G.controlled(G.np_x())))
        g = jnp.broadcast_to(cx, (len(los), 4, 4))
        txt = step.lower(m0, g).compile().as_text()

        counts = collections.Counter(
            re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([\w-]+)\(", txt, re.M)
        )
        # Bounded collective census: the three slice exchanges + one tiny
        # gate-padding gather; no all-to-alls.
        assert counts.get("all-gather", 0) <= 4, counts
        assert counts.get("all-to-all", 0) == 0, counts
        assert counts.get("collective-permute", 0) <= 4, counts

        # Every all-gather result must be at most the padded-slice volume —
        # in particular NOT the full (n, 2, chi, chi) Γ array.
        full_gamma = n * 2 * chi * chi
        slice_elems = p_pad * 2 * chi * chi
        for m_ in re.finditer(r"= (\w+)\[([\d,]*)\] all-gather\(", txt):
            dims = [int(d) for d in m_.group(2).split(",") if d]
            elems = int(np.prod(dims)) if dims else 1
            assert elems <= slice_elems, (m_.group(0), elems)
            assert elems < full_gamma, (m_.group(0), elems)

        # And it executes: CX half-layer on |0...0> is the identity.
        out = step(m0, g)
        v = np.asarray(mps_to_vector(out))
        assert abs(v[0] - 1.0) < 1e-9

    def test_pair_sharding_policy_routes_engine(self):
        """set_pair_sharding routes the WHOLE MPS engine (V† layer sweep +
        z-free gradient) through the shard_map path, with exact parity vs
        the unsharded engine."""
        import aqc_research_tpu.targets.trotter as trotop
        from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops import mps as mpsop
        from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient

        n, chi, layers = 8, 16, 2
        trunc_thr = 1e-8
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        thetas = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=0.8, delta=1.0
            )
        )
        ini = trotop.neel_init_state(n)
        target = trotop.Trotter(
            num_qubits=n, evol_time=0.8, num_steps=2, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
        lvec = mpsop.mps_from_program(ini, n, chi_max=chi)

        def sweep():
            vh, zc = mpsop.v_dagger_mul_mps_layers(
                circ, thetas, target, trunc_thr=trunc_thr
            )
            g = fast_dot_gradient(
                circ, thetas, lvec, vh, trunc_thr=trunc_thr, z_layers=zc
            )
            return np.asarray(g)

        ref = sweep()
        mesh = make_mesh((1, min(4, len(jax.devices()))), ("dp", "tp"))
        mpsop.set_pair_sharding(mesh, "tp")
        try:
            got = sweep()
        finally:
            mpsop.set_pair_sharding(None)
        np.testing.assert_allclose(got, ref, atol=1e-9)


class TestShardedStatevector:
    """Explicit TP statevector engine (parallel/statevector_tp.py): parity +
    PINNED collective profile (VERDICT round-1 weak #5).

    The constraint-only path (shard the state, let the SPMD partitioner
    place collectives) measurably regathers the full state around the gate
    reshapes; the explicit shard_map engine must show ZERO all-gathers and
    O(1) collective-permutes per sharded-qubit gate."""

    def _hlo_op_counts(self, compiled_text):
        import collections
        import re

        return collections.Counter(
            re.findall(
                r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([\w-]+)\(", compiled_text, re.M
            )
        )

    def test_parity_all_gate_placements(self):
        """n=10, tp=8: every qubit role (local / mixed / both-sharded),
        entanglers and dagger, vs the single-device engine."""
        from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
        from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
        from aqc_research_tpu.ops.statevector import v_dagger_mul_vec, v_mul_vec
        from aqc_research_tpu.parallel.statevector_tp import (
            v_dagger_mul_vec_tp,
            v_mul_vec_tp,
        )
        from aqc_research_tpu.utils import rand_state, rand_thetas
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = 10
        mesh = make_mesh((8,), ("tp",))
        sh = NamedSharding(mesh, P("tp"))
        state = rand_state(n)
        sj = jax.device_put(jnp.asarray(state), sh)

        # local, boundary-mixed, both-sharded, non-adjacent mixed blocks
        blocks = np.array([[0, 4, 8, 9, 2, 7, 9], [1, 5, 9, 8, 3, 8, 6]])
        for entangler in ("cx", "cp"):
            circ = Ansatz.make(n, entangler, blocks)
            th = rand_thetas(circ.num_thetas)
            ref = np.asarray(v_mul_vec(circ, th, jnp.asarray(state)))
            got = np.asarray(v_mul_vec_tp(circ, jnp.asarray(th), sj, mesh))
            assert np.max(np.abs(got - ref)) < 1e-12, entangler
            refd = np.asarray(v_dagger_mul_vec(circ, th, jnp.asarray(state)))
            gotd = np.asarray(v_dagger_mul_vec_tp(circ, jnp.asarray(th), sj, mesh))
            assert np.max(np.abs(gotd - refd)) < 1e-12, entangler

        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        th = rand_thetas(circ.num_thetas)
        ref = np.asarray(v_mul_vec(circ, th, jnp.asarray(state)))
        got = np.asarray(v_mul_vec_tp(circ, jnp.asarray(th), sj, mesh))
        assert np.max(np.abs(got - ref)) < 1e-12

    def test_pauli_dot_tp(self):
        from aqc_research_tpu.ops.statevector import pauli_dot
        from aqc_research_tpu.parallel.statevector_tp import pauli_dot_tp
        from aqc_research_tpu.utils import rand_state
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = 10
        mesh = make_mesh((8,), ("tp",))
        sh = NamedSharding(mesh, P("tp"))
        w, z = rand_state(n), rand_state(n)
        wj = jax.device_put(jnp.asarray(w), sh)
        zj = jax.device_put(jnp.asarray(z), sh)
        for p in ("x", "y", "z"):
            for q in (0, 6, 7, 8, 9):
                a = complex(pauli_dot(jnp.asarray(w), jnp.asarray(z), p, q))
                b = complex(pauli_dot_tp(wj, zj, p, q, mesh))
                assert abs(a - b) < 1e-12, (p, q)

    def test_collective_profile_n20(self):
        """n=20, tp=8: the compiled HLO contains ZERO all-gathers and at most
        3 collective-permutes per sharded-qubit gate (pinned profile)."""
        from aqc_research_tpu.circuit.ansatz import Ansatz
        from aqc_research_tpu.parallel.statevector_tp import _build_tp_apply
        from aqc_research_tpu.utils import rand_thetas
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = 20
        # 2 local blocks, 1 boundary-mixed, 2 both-sharded (tp=8 -> 3 top bits)
        blocks = np.array([[0, 5, 16, 17, 18], [1, 6, 17, 18, 19]])
        circ = Ansatz.make(n, "cx", blocks)
        mesh = make_mesh((8,), ("tp",))
        f = _build_tp_apply(circ, mesh, "tp", False, 1)
        th = jnp.asarray(rand_thetas(circ.num_thetas))
        sh = NamedSharding(mesh, P("tp"))
        state = jax.device_put(
            jnp.zeros(2**n, jnp.complex128).at[0].set(1.0), sh
        )
        txt = f.lower(th, state).compile().as_text()
        counts = self._hlo_op_counts(txt)
        assert counts.get("all-gather", 0) == 0, counts
        assert counts.get("all-gather-start", 0) == 0, counts
        assert counts.get("all-to-all", 0) == 0, counts
        sharded_touches = 3  # blocks (16,17), (17,18), (18,19)
        assert 0 < counts.get("collective-permute", 0) <= 5 * sharded_touches, counts

        # and the program executes with parity vs the local engine
        from aqc_research_tpu.ops.statevector import v_mul_vec

        out = np.asarray(f(th, state))
        ref = np.asarray(
            v_mul_vec(circ, th, jnp.zeros(2**n, jnp.complex128).at[0].set(1.0))
        )
        assert np.max(np.abs(out - ref)) < 1e-12
