"""MPS fast gradient vs the dense co-sweep gradient.

Ports the reference's shared gradient-test harness applied to the MPS engine
(``test_mps_fast_dot_gradient.py:34-109``): same config matrix over
{trotter 1st/2nd order} x {flip bit}, comparing against the (already
oracle-verified) dense-engine gradient at no-truncation threshold.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.program import ProgramBuilder
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.ops.gradients import grad_of_dot_product
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient
from aqc_research_tpu.ops.statevector import v_dagger_mul_vec
from aqc_research_tpu.utils import rand_thetas

from .oracle import relative_diff


def _flip_state_pair(n, flip_bit, chi):
    """(dense, MPS) of |0> or X_i|0>."""
    qb = ProgramBuilder(n)
    if flip_bit >= 0:
        qb.x(flip_bit)
    prog = qb.build()
    dense = np.zeros(2**n, dtype=np.complex128)
    dense[0 if flip_bit < 0 else (1 << flip_bit)] = 1
    return dense, mpsop.mps_from_program(prog, n, chi_max=chi)


CONFIGS = [
    (n, so, fb)
    for n in (2, 3)
    for so in (False, True)
    for fb in (-1, 0)
]


class TestMpsFastDotGradient:
    @pytest.mark.parametrize("num_qubits,second_order,flip_bit", CONFIGS)
    def test_full_gradient_vs_dense(self, num_qubits, second_order, flip_bit):
        n = num_qubits
        layers = int(np.random.randint(1, 3))
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), second_order)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n  # exact

        # Random target state (moderately entangled).
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))

        vh_phi_mps = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_phi_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        assert (
            relative_diff(np.asarray(mpsop.mps_to_vector(vh_phi_mps)), vh_phi_dense)
            < 1e-8
        )

        x_dense, x_mps = _flip_state_pair(n, flip_bit, chi)
        g_mps = np.asarray(fast_dot_gradient(circ, thetas, x_mps, vh_phi_mps))
        g_dense = np.asarray(
            grad_of_dot_product(circ, thetas, x_dense, vh_phi_dense)
        )
        assert np.max(np.abs(g_mps - g_dense)) < 1e-10

    def test_partial_gradient_vs_dense(self):
        n = 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        vh_mps = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        x_dense, x_mps = _flip_state_pair(n, -1, chi)

        block_range = (circ.bpl, 2 * circ.bpl)  # second layer only
        for front in (False, True):
            g_mps = np.asarray(
                fast_dot_gradient(
                    circ, thetas, x_mps, vh_mps,
                    block_range=block_range, front_layer=front,
                )
            )
            g_dense = np.asarray(
                grad_of_dot_product(
                    circ, thetas, x_dense, vh_dense,
                    block_range=block_range, front_layer=front,
                )
            )
            assert np.max(np.abs(g_mps - g_dense)) < 1e-10
            # outside-range entries exactly zero
            assert np.all(circ.subset2q(g_mps)[: block_range[0]] == 0)


# -----------------------------------------------------------------------------
# Reference config matrix (test_mps_fast_dot_gradient.py:127-152 +
# utils_dot_gradient_test.py:241-270): entanglers {cx, cz, cp}, structured AND
# random (non-nearest-neighbour) layouts, all flip-bit variants, plus the
# independent numeric-gradient harness run directly on the MPS objective.
# -----------------------------------------------------------------------------

from aqc_research_tpu.circuit.ansatz import Ansatz  # noqa: E402
from aqc_research_tpu.circuit.structures import (  # noqa: E402
    create_ansatz_structure,
)
from aqc_research_tpu.utils import rand_circuit  # noqa: E402

from .oracle import oracle_matrix  # noqa: E402

SQRT_EPS = float(np.sqrt(np.finfo(np.float64).eps))

ENTANGLER_CONFIGS = [
    (n, e, structured)
    for n in (2, 3)
    for e in ("cx", "cz", "cp")
    for structured in ((True,) if n < 3 else (True, False))
] + [(4, "cz", False), (4, "cp", False)]


def _make_plain_circ(n, entangler, structured):
    if structured:
        depth = int(np.random.randint(n, 3 * n))
        blocks = create_ansatz_structure(n, "spin", "full", depth)
    else:
        # Random layouts include NON-ADJACENT pairs: exercises the MPS swap
        # network (reference accepts any ParametricCircuit layout via Aer).
        depth = int(np.random.randint(n, 2 * n))
        blocks = rand_circuit(n, depth)
    return Ansatz.make(n, entangler, blocks)


class TestMpsGradientEntanglers:
    """fast_dot_gradient vs the dense co-sweep for {cx, cz, cp} x layouts
    x flip bits — the full reference entangler matrix."""

    @pytest.mark.parametrize("num_qubits,entangler,structured", ENTANGLER_CONFIGS)
    def test_vs_dense(self, num_qubits, entangler, structured):
        n = num_qubits
        circ = _make_plain_circ(n, entangler, structured)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n  # exact

        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        vh_phi_mps = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_phi_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        assert (
            relative_diff(np.asarray(mpsop.mps_to_vector(vh_phi_mps)), vh_phi_dense)
            < 1e-8
        )

        for flip_bit in (-1, 0, int(np.random.randint(0, n))):
            x_dense, x_mps = _flip_state_pair(n, flip_bit, chi)
            g_mps = np.asarray(fast_dot_gradient(circ, thetas, x_mps, vh_phi_mps))
            g_dense = np.asarray(
                grad_of_dot_product(circ, thetas, x_dense, vh_phi_dense)
            )
            assert np.max(np.abs(g_mps - g_dense)) < 1e-10, (flip_bit, entangler)


class TestMpsNumericGradient:
    """The reference's independent numeric harness run ON THE MPS PATH
    (utils_dot_gradient_test.py:166-238): central differences with step
    halving -> relative error <= 1e-5 over the last 4 steps AND quadratic
    Taylor-residual convergence."""

    @pytest.mark.parametrize(
        "num_qubits,entangler,trotter",
        [(3, "cz", False), (3, "cp", False), (3, "cx", True)],
    )
    def test_numeric_and_taylor(self, num_qubits, entangler, trotter):
        n = num_qubits
        if trotter:
            circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, 2), True)
        else:
            circ = _make_plain_circ(n, entangler, structured=True)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n

        target_thetas = thetas + 0.1 * rand_thetas(circ.num_thetas)  # close states
        from aqc_research_tpu.circuit.export import ansatz_to_program

        phi_mps = mpsop.mps_from_program(
            ansatz_to_program(circ, target_thetas), n, chi_max=chi
        )
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        _, lvec_mps = _flip_state_pair(n, -1, chi)

        def objective_mps(th):
            vh = mpsop.v_dagger_mul_mps(circ, th, phi_mps)
            return complex(mpsop.mps_dot(lvec_mps, vh))

        def objective_from_matrix(th):
            v = oracle_matrix(circ, th)
            return complex(np.vdot(v[:, 0], phi_dense))  # <0|V.H|phi> = conj(V|0>). phi

        fobj = objective_mps(thetas)
        assert abs(fobj - objective_from_matrix(thetas)) < SQRT_EPS

        vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        grad = np.asarray(fast_dot_gradient(circ, thetas, lvec_mps, vh_phi))

        tau = 0.25
        residual_prev = 1e20
        errors, orders = [], []
        for step in range(12):
            num_grad = np.zeros(thetas.size, dtype=complex)
            th_tau = thetas.copy()
            for i in range(thetas.size):
                th_tau[i] = thetas[i] - tau
                f_m = objective_from_matrix(th_tau)
                th_tau[i] = thetas[i] + tau
                f_p = objective_from_matrix(th_tau)
                num_grad[i] = (f_p - f_m) / (2.0 * tau)
                th_tau[i] = thetas[i]

            grad_norm = max(np.linalg.norm(grad), np.finfo(np.float64).eps ** 2)
            errors.append(float(np.linalg.norm(grad - num_grad) / grad_norm))

            grad_dir = grad / grad_norm
            delta = np.real(grad_dir * tau)
            fobj_delta = objective_mps(thetas + delta)
            residual = abs(fobj + np.dot(grad, delta) - fobj_delta)
            orders.append(
                0.0
                if step == 0
                else (np.log(residual_prev) - np.log(residual)) / np.log(2.0)
            )
            tau /= 2
            residual_prev = residual

        assert np.all(np.asarray(errors[-4:]) <= 1e-5), errors
        assert np.all(
            (1.8 <= np.asarray(orders[-4:])) & (np.asarray(orders[-4:]) <= 2.2)
        ), orders


class TestMpsPartialGradientRandomLayout:
    """Partial-vs-full gradient with random block insertion into a RANDOM
    (possibly non-adjacent) layout, on the MPS path
    (utils_dot_gradient_test.py:88-163)."""

    @pytest.mark.parametrize("entangler", ["cz", "cp"])
    @pytest.mark.parametrize("front_layer", [False, True])
    def test_partial_vs_full(self, entangler, front_layer):
        n = 3
        tol = SQRT_EPS
        circ = Ansatz.make(n, entangler, rand_circuit(n, int(np.random.randint(n, 2 * n))))
        new_blocks = rand_circuit(n, int(np.random.randint(1, n)))
        insert_pos = int(np.random.randint(0, circ.num_blocks + 1))
        block_range = (insert_pos, insert_pos + new_blocks.shape[1])
        thetas = rand_thetas(circ.num_thetas)
        circ, thetas, idx = circ.insert_unit_blocks(insert_pos, new_blocks, thetas)
        assert np.all(thetas[idx] == 0)

        chi = 2**n
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        _, lvec_mps = _flip_state_pair(n, -1, chi)
        vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)

        g_full = np.asarray(fast_dot_gradient(circ, thetas, lvec_mps, vh_phi))
        g_part = np.asarray(
            fast_dot_gradient(
                circ, thetas, lvec_mps, vh_phi,
                block_range=block_range, front_layer=front_layer,
            )
        )

        front_part, front_full = circ.subset1q(g_part), circ.subset1q(g_full)
        if front_layer:
            assert np.allclose(front_part, front_full, atol=tol, rtol=tol)
        else:
            assert np.allclose(front_part, 0, atol=tol, rtol=tol)
        assert np.allclose(g_part[idx], g_full[idx], atol=tol, rtol=tol)
        old = circ.subset2q(g_part)[: block_range[0], :]
        assert old.size == 0 or np.allclose(old, 0, atol=tol, rtol=tol)
        old = circ.subset2q(g_part)[block_range[1] :, :]
        assert old.size == 0 or np.allclose(old, 0, atol=tol, rtol=tol)


class TestMpsLayeredPlainPath:
    """The generic layer-batched gradient (non-Trotter layer-periodic
    ansatze, entanglers {cx, cz, cp}) must match both the sequential
    env-cached sweep and the dense co-sweep."""

    @pytest.mark.parametrize("entangler", ["cx", "cz", "cp"])
    @pytest.mark.parametrize("layers", [2, 3])
    def test_vs_sequential_and_dense(self, entangler, layers):
        from aqc_research_tpu.ops.mps_gradient import (
            _fast_dot_gradient_impl,
            _plain_layered_eligible,
        )

        n = 3
        one_layer = create_ansatz_structure(n, "spin", "full", n - 1)
        blocks = np.concatenate([one_layer] * layers, axis=1)
        circ = Ansatz.make(n, entangler, blocks)
        assert _plain_layered_eligible(circ)

        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        _, lvec = _flip_state_pair(n, -1, chi)
        x_dense = np.zeros(2**n, complex)
        x_dense[0] = 1

        g_layered = np.asarray(fast_dot_gradient(circ, thetas, lvec, vh_phi))
        g_seq = np.asarray(
            _fast_dot_gradient_impl(
                circ,
                np.asarray(thetas),
                lvec,
                vh_phi,
                float(mpsop.no_truncation_threshold()),
                (0, circ.num_blocks),
                True,
            )
        )
        g_dense = np.asarray(grad_of_dot_product(circ, thetas, x_dense, vh_dense))
        assert np.max(np.abs(g_layered - g_seq)) < 1e-10, entangler
        assert np.max(np.abs(g_layered - g_dense)) < 1e-10, entangler

    def test_partial_and_front_toggle(self):
        from aqc_research_tpu.ops.mps_gradient import _plain_layered_eligible

        n, layers = 3, 3
        one_layer = create_ansatz_structure(n, "spin", "full", n - 1)
        circ = Ansatz.make(n, "cp", np.concatenate([one_layer] * layers, axis=1))
        assert _plain_layered_eligible(circ)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi_mps = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi_mps))
        vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi_mps)
        vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))
        _, lvec = _flip_state_pair(n, -1, chi)
        x_dense = np.zeros(2**n, complex)
        x_dense[0] = 1

        bpl = n - 1
        block_range = (bpl, 2 * bpl)  # second layer only
        for front in (False, True):
            g_mps = np.asarray(
                fast_dot_gradient(
                    circ, thetas, lvec, vh_phi,
                    block_range=block_range, front_layer=front,
                )
            )
            g_dense = np.asarray(
                grad_of_dot_product(
                    circ, thetas, x_dense, vh_dense,
                    block_range=block_range, front_layer=front,
                )
            )
            assert np.max(np.abs(g_mps - g_dense)) < 1e-10
            assert np.all(circ.subset2q(g_mps)[: block_range[0]] == 0)
            assert np.all(circ.subset2q(g_mps)[block_range[1] :] == 0)


class TestZLayerCachedGradient:
    """The V†-sweep layer cache (v_dagger_mul_mps_layers) feeds
    fast_dot_gradient(z_layers=...): at no-truncation the cached co-sweep is
    EXACTLY the plain layered gradient (the cached boundary IS the state the
    skipped z update would produce)."""

    @pytest.mark.parametrize("num_qubits,second_order,layers", [
        (3, True, 2), (4, True, 3), (4, False, 2),
    ])
    def test_cached_matches_plain(self, num_qubits, second_order, layers):
        n = num_qubits
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), second_order)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        assert mpsop.v_dagger_layer_cache_eligible(circ)

        vh_a = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        vh_b, cache = mpsop.v_dagger_mul_mps_layers(circ, thetas, phi)
        assert (
            np.max(np.abs(
                np.asarray(mpsop.mps_to_vector(vh_a))
                - np.asarray(mpsop.mps_to_vector(vh_b))
            )) < 1e-12
        )

        _, lvec = _flip_state_pair(n, -1, chi)
        g_ref = np.asarray(fast_dot_gradient(circ, thetas, lvec, vh_a))
        g_cached = np.asarray(
            fast_dot_gradient(circ, thetas, lvec, vh_b, z_layers=cache)
        )
        assert np.max(np.abs(g_cached - g_ref)) < 1e-12

    def test_cached_partial_gradient(self):
        n, layers = 3, 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        vh, cache = mpsop.v_dagger_mul_mps_layers(circ, thetas, phi)
        _, lvec = _flip_state_pair(n, -1, chi)
        block_range = (circ.bpl, 2 * circ.bpl)
        for front in (False, True):
            g_ref = np.asarray(fast_dot_gradient(
                circ, thetas, lvec, vh,
                block_range=block_range, front_layer=front,
            ))
            g_c = np.asarray(fast_dot_gradient(
                circ, thetas, lvec, vh,
                block_range=block_range, front_layer=front, z_layers=cache,
            ))
            assert np.max(np.abs(g_c - g_ref)) < 1e-12

    def test_cached_under_truncation_stays_close(self):
        """Under a working truncation threshold the z-free cached gradient
        and the plain layered gradient follow different (equally valid)
        approximation paths; they must stay close — a regression that
        degrades the boundary-substitution accuracy shows up here."""
        n, layers = 4, 3
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        thetas = rand_thetas(circ.num_thetas)
        chi = 8  # < 2^n: truncation active
        thr = 1e-6
        phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        vh_plain = mpsop.v_dagger_mul_mps(circ, thetas, phi, trunc_thr=thr)
        vh_c, cache = mpsop.v_dagger_mul_mps_layers(circ, thetas, phi, trunc_thr=thr)
        _, lvec = _flip_state_pair(n, -1, chi)
        g_plain = np.asarray(
            fast_dot_gradient(circ, thetas, lvec, vh_plain, trunc_thr=thr)
        )
        g_cached = np.asarray(
            fast_dot_gradient(
                circ, thetas, lvec, vh_c, trunc_thr=thr, z_layers=cache
            )
        )
        norm = max(np.linalg.norm(g_plain), 1e-12)
        assert np.linalg.norm(g_cached - g_plain) / norm < 1e-5


class TestChiGrowthScheduling:
    """χ-growth scheduling (VERDICT r2 item 1b): head phases at growing
    static bond dimensions are EXACT — rank is bounded by 2^phases."""

    def _setup(self, n, chi, layers, thr, seed=2):
        import aqc_research_tpu.targets.trotter as trotop

        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        rng = np.random.default_rng(seed)
        th = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
            )
        )
        th = th + 0.3 * jnp.asarray(rng.standard_normal(circ.num_thetas))
        bits = tuple(1 if q % 2 == 0 else 0 for q in range(n))
        ini = trotop.neel_init_state(n)
        target = trotop.Trotter(
            num_qubits=n, evol_time=1.2, num_steps=3, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=thr, chi_max=chi)
        return circ, th, bits, target

    @pytest.mark.parametrize(
        "n,chi,layers,thr",
        [(6, 16, 3, 1e-16), (8, 16, 3, 1e-6), (8, 64, 2, 1e-8)],
    )
    def test_growing_value_sweep_matches_full_chi(self, n, chi, layers, thr):
        circ, th, bits, _ = self._setup(n, chi, layers, thr)
        lvec = mpsop.mps_basis_state(bits, chi)
        ref = mpsop.v_mul_mps(circ, th, lvec, trunc_thr=thr)
        got = mpsop.v_mul_mps_growing(circ, th, bits, chi, trunc_thr=thr)
        assert (
            np.abs(
                np.asarray(mpsop.mps_to_vector(ref))
                - np.asarray(mpsop.mps_to_vector(got))
            ).max()
            < 1e-12
        )
        assert (
            np.abs(np.asarray(ref.lambdas) - np.asarray(got.lambdas)).max()
            < 1e-12
        )

    @pytest.mark.parametrize(
        "n,chi,layers,thr",
        [(6, 16, 3, 1e-16), (10, 32, 4, 1e-6), (8, 64, 2, 1e-8)],
    )
    def test_grow_w_gradient_matches(self, n, chi, layers, thr):
        from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient_with_state

        circ, th, bits, target = self._setup(n, chi, layers, thr)
        lvec = mpsop.mps_basis_state(bits, chi)
        vh, zc = mpsop.v_dagger_mul_mps_layers(circ, th, target, trunc_thr=thr)
        g_ref, w_ref = fast_dot_gradient_with_state(
            circ, th, lvec, vh, zc, trunc_thr=thr
        )
        g_grow, w_grow = fast_dot_gradient_with_state(
            circ, th, lvec, vh, zc, trunc_thr=thr, grow_w=True
        )
        assert np.abs(np.asarray(g_ref) - np.asarray(g_grow)).max() < 1e-12
        assert (
            np.abs(
                np.asarray(mpsop.mps_to_vector(w_ref))
                - np.asarray(mpsop.mps_to_vector(w_grow))
            ).max()
            < 1e-12
        )


class TestPermutedTripletOrder:
    """A valid Trotter layout may list a layer's triplets in ANY order
    (check_block_layout constrains triplet structure, not ordering).  The
    layered gradient paths must sort each half-layer group's pair sites
    before the batched pair update (regression: unsorted los tripped
    apply_pairs_mps's disjointness assert at trace time)."""

    @staticmethod
    def _permuted_circuit(n, layers):
        blocks = make_trotter_like_circuit(n, layers)
        # Reverse the triplets within each layer (same circuit family, valid
        # layout, non-ascending group los).
        b = blocks.reshape(2, layers, n - 1, 3)[:, :, ::-1, :]
        return TrotterAnsatz.make(n, b.reshape(2, -1).copy(), False)

    def test_layered_gradient_permuted_layout(self):
        n, layers = 6, 2
        circ = self._permuted_circuit(n, layers)
        from aqc_research_tpu.ops.mps_gradient import _layered_eligible

        assert _layered_eligible(circ)
        # The permuted layout's triplet sequence must genuinely be
        # non-ascending (otherwise this test exercises nothing).
        los_seq = [
            min(int(circ.blocks[0, 3 * t]), int(circ.blocks[1, 3 * t]))
            for t in range(circ.bpl // 3)
        ]
        assert los_seq != sorted(los_seq)

        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        vh_phi = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        phi_dense = np.asarray(mpsop.mps_to_vector(phi))
        vh_dense = np.asarray(v_dagger_mul_vec(circ, thetas, phi_dense))

        x_dense, x_mps = _flip_state_pair(n, -1, chi)
        g_mps = np.asarray(fast_dot_gradient(circ, thetas, x_mps, vh_phi))
        g_dense = np.asarray(
            grad_of_dot_product(circ, thetas, x_dense, vh_dense)
        )
        assert np.max(np.abs(g_mps - g_dense)) < 1e-10

    def test_zcache_gradient_permuted_layout(self):
        n, layers = 6, 2
        circ = self._permuted_circuit(n, layers)
        assert mpsop.v_dagger_layer_cache_eligible(circ)
        thetas = rand_thetas(circ.num_thetas)
        chi = 2**n
        phi = mpsop.rand_mps_vec(n, num_layers=2, chi_max=chi)
        vh_a = mpsop.v_dagger_mul_mps(circ, thetas, phi)
        vh_b, cache = mpsop.v_dagger_mul_mps_layers(circ, thetas, phi)
        _, lvec = _flip_state_pair(n, -1, chi)
        g_ref = np.asarray(fast_dot_gradient(circ, thetas, lvec, vh_a))
        g_cached = np.asarray(
            fast_dot_gradient(circ, thetas, lvec, vh_b, z_layers=cache)
        )
        assert np.max(np.abs(g_cached - g_ref)) < 1e-12
