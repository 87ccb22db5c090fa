"""Secondary benchmark: MPS fast-gradient sweeps/sec (BASELINE.md config 3/5).

Measures the steady-state rate of full analytic co-sweep gradients (objective
``<0...|V† |phi>``) on a Trotterized ansatz in MPS form — the workload whose
reference implementation pays one full Aer C++ re-simulation per gate
(SURVEY.md §3.4).

Usage:  python benchmarks/bench_mps.py [num_qubits] [chi] [layers] [batch]
Prints one JSON line with sweeps/sec.

``batch`` > 1 vmaps the whole objective+gradient sweep over a fleet of theta
vectors (the multistart pattern of parallel/multistart.py).  Measured: the
decomposition cost is THROUGHPUT-bound (per-matrix), so a fleet's aggregate
rate stays below the single-sweep rate on one chip — the honest fleet lever
is sharding pairs across chips (parallel/mps_sharded.py).  The reported
rate is aggregate sweeps/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(
    num_qubits: int = 20,
    chi: int = 64,
    layers: int = 4,
    batch: int = 1,
    svd_impl: str | None = None,
    perturb: float = 0.0,
):
    import jax.numpy as jnp

    from aqc_research_tpu.config import is_tpu, set_precision, set_svd_impl
    from aqc_research_tpu.config import svd_impl as _effective_impl

    set_precision("fast" if is_tpu() else "high")
    if svd_impl is not None:  # None must not mask AQC_TPU_SVD_IMPL
        set_svd_impl(svd_impl)

    import aqc_research_tpu.targets.trotter as trotop
    from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
    from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
    from aqc_research_tpu.ops import mps as mpsop
    from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient

    evol_time, delta = 1.2, 1.0
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=delta
    )
    if perturb:
        # Mid-optimization stand-in: adaptive sweep counts (and their spread)
        # are larger away from the perfect init (RESULTS.md roofline table);
        # seed matches benchmarks/probe_sweep_counts.py so the captured
        # count tables describe THIS point.
        rng = np.random.default_rng(5)
        thetas = thetas + perturb * rng.standard_normal(circ.num_thetas)
    thetas = jnp.asarray(thetas)

    ini = trotop.neel_init_state(num_qubits)
    trunc_thr = 1e-6
    target = trotop.Trotter(
        num_qubits=num_qubits,
        evol_time=evol_time,
        num_steps=3,
        delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)

    lvec = mpsop.mps_from_program(ini, num_qubits, chi_max=chi)

    import jax

    @jax.jit
    def gnorm(g):
        return jnp.linalg.norm(jnp.real(g)).reshape(1).astype(jnp.float32)

    # target/lvec must be TRACED arguments: letting jit close over
    # device-resident complex arrays fails on this runtime (CLAUDE.md).
    def one_sweep(th, tgt, lv):
        if mpsop.v_dagger_layer_cache_eligible(circ):
            vh, zc = mpsop.v_dagger_mul_mps_layers(circ, th, tgt, trunc_thr=trunc_thr)
            # grow_w: the production configuration (χ-growth scheduling on
            # the co-sweep's w side; jit_asp uses the same flags).
            return fast_dot_gradient(
                circ, th, lv, vh, trunc_thr=trunc_thr, z_layers=zc, grow_w=True
            )
        vh = mpsop.v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        return fast_dot_gradient(circ, th, lv, vh, trunc_thr=trunc_thr)

    if batch > 1:
        # Fleet mode: one sweep per theta vector, vmapped (multistart SPMD).
        rng = np.random.default_rng(1)
        pert = 0.05 * rng.standard_normal((batch, circ.num_thetas))
        thetas = thetas[None, :] + jnp.asarray(pert, thetas.dtype)
        sweep_fn = jax.jit(jax.vmap(one_sweep, in_axes=(0, None, None)))
    else:
        sweep_fn = jax.jit(one_sweep)

    def sweep(th):
        return sweep_fn(th, target, lvec)

    tic = time.perf_counter()
    g = sweep(thetas)
    # FETCH a derived value: on some TPU runtimes failed executions surface
    # only at device->host transfer, not at block_until_ready — a fetch
    # proves the computation actually ran.
    norm_val = float(np.asarray(gnorm(g))[0])
    assert np.isfinite(norm_val) and norm_val > 0, norm_val
    compile_s = time.perf_counter() - tic

    repeats = 5
    tic = time.perf_counter()
    for _ in range(repeats):
        g = sweep(thetas)
    g.block_until_ready()
    per_step = (time.perf_counter() - tic) / repeats

    print(
        json.dumps(
            {
                "metric": (
                    f"MPS objective+gradient sweeps/sec, {num_qubits}q chi={chi} "
                    f"{layers}-layer Trotter ansatz (trunc 1e-6)"
                    + (f", fleet of {batch}" if batch > 1 else "")
                    + (f", {perturb}-rad perturbed" if perturb else "")
                ),
                "value": round(batch / per_step, 4),
                "unit": "sweeps/s",
                "compile_s": round(compile_s, 1),
                "num_thetas": circ.num_thetas,
                "batch": batch,
                "svd_impl": _effective_impl(),  # what actually ran
                "grad_norm": round(norm_val, 6),  # fetched — proves execution
            }
        )
    )


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    impl = None
    perturb = 0.0
    for a in list(argv):
        if a.startswith("--svd-impl="):
            impl = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--perturb="):
            perturb = float(a.split("=", 1)[1])
            argv.remove(a)
    main(*[int(a) for a in argv[:4]], svd_impl=impl, perturb=perturb)
