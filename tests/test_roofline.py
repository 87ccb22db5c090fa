"""The roofline census must match what the engine actually executes
(ops/roofline.py vs a live capture of every truncated-SVD phase)."""

import jax
import jax.numpy as jnp
import numpy as np

import aqc_research_tpu.ops.mps as mpsmod
import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient_with_state
from aqc_research_tpu.ops.roofline import (
    decomposition_census,
    jacobi_kernel_flops,
    measure_attainable,
    sweep_flops,
)


class TestCensusMatchesEngine:
    def test_census_vs_capture(self):
        n, chi, layers, thr = 8, 16, 2, 1e-8
        circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
        th = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=0.8, delta=1.0
            )
        )
        ini = trotop.neel_init_state(n)
        target = trotop.Trotter(
            num_qubits=n, evol_time=0.8, num_steps=2, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=thr, chi_max=chi)
        bits = tuple(1 if q % 2 == 0 else 0 for q in range(n))
        lvec = mpsmod.mps_basis_state(bits, chi)

        captured = []
        orig = mpsmod._truncated_svd

        def capture(m, c, t):
            def save(shape0, shape1):
                captured.append((int(shape0), int(shape1)))

            b = int(np.prod(m.shape[:-2])) if m.ndim > 2 else 1
            jax.experimental.io_callback(
                save, None, jnp.asarray(b), jnp.asarray(m.shape[-1]),
                ordered=True,
            )
            return orig(m, c, t)

        mpsmod._truncated_svd = capture
        try:
            stages = {}
            vh, zc = mpsmod.v_dagger_mul_mps_layers(circ, th, target, trunc_thr=thr)
            jax.block_until_ready(vh)
            stages["vdag"] = list(captured)
            captured.clear()
            g, _ = fast_dot_gradient_with_state(
                circ, th, lvec, vh, zc, trunc_thr=thr, grow_w=True
            )
            jax.block_until_ready(g)
            stages["grad"] = list(captured)
            captured.clear()
            val = mpsmod.v_mul_mps_growing(
                circ, th, bits, chi, trunc_thr=thr, dtype=target.gammas.dtype
            )
            jax.block_until_ready(val.gammas)
            stages["value"] = list(captured)
        finally:
            mpsmod._truncated_svd = orig

        census = decomposition_census(circ, chi, grow=True)
        for stage in ("vdag", "grad", "value"):
            # The scan repeats one traced layer body; the capture sees the
            # RUNTIME calls — counts and (batch, matrix_n) must match.
            assert stages[stage] == census[stage], (
                stage, stages[stage], census[stage]
            )

    def test_flops_model_positive_and_monotone(self):
        circ = TrotterAnsatz.make(8, make_trotter_like_circuit(8, 2), True)
        census = decomposition_census(circ, 16, grow=True)
        v1, m1 = sweep_flops(census, {"vdag": 5, "grad": 5, "value": 5})
        v2, m2 = sweep_flops(census, {"vdag": 10, "grad": 5, "value": 5})
        assert 0 < v1 < v2 and m1 == m2 > 0
        assert jacobi_kernel_flops(128, 2, 10) == 2 * jacobi_kernel_flops(128, 1, 10)

    def test_attainable_runs_on_cpu(self):
        att = measure_attainable(repeats=2)
        assert att["vpu_gflops"] > 0 and att["mxu_gflops"] > 0
        assert att["hbm_gbps"] > 0
