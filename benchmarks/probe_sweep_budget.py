"""Stage-timed budget of the FULL production obj+grad sweep (in-jit slopes).

VERDICT r4 #6: the remaining gap between the measured 20q chi=64 sweep time
and its composite roofline floor was attributed only INSIDE the rand
decomposition (~51% range-finder QRs / ~48% reduced-Jacobi tail); nothing
AROUND the decomposition (theta builds, environment contractions,
scatter/writeback, intra-program dispatch) had been measured directly.

This probe times the production sweep (bench_mps.py's one_sweep: layered V†
sweep + z-free co-sweep gradient with grow_w, trunc 1e-6) with the two-point
in-jit slope method (probe_rand_injit_slope.py — dispatch/fetch overheads
cancel exactly), split three ways:

* by ROUTE — the same sweep under ``svd_impl`` = production (rand/fused on
  TPU), "jacobi", and "nullsvd" (the measurement-only pass-through that
  skips the decomposition entirely).  ``total[impl] - total[nullsvd]`` is
  the decomposition's true in-context cost; ``total[nullsvd]`` is the
  measured everything-around-it floor the roofline only modeled.
* by PHASE — the V† layer-cache sweep alone vs the gradient co-sweep alone
  (with vh/z held fixed as inputs); their sum cross-checks the total.

Caveat: under "nullsvd" the theta build runs in unfused XLA form (the fused
Pallas megakernels only engage for jacobi/rand), so the floor slightly
UNDERCOUNTS the production route's non-decomposition work if the fused theta
pass is slower than XLA's — the bias direction makes the decomposition-share
estimate conservative.  States under nullsvd are garbage; only times matter.

Usage: probe_sweep_budget.py [n chi layers] [--cpu] [--klo=3] [--khi=13]
       [--stages=total[rand],vdag]  (substring filter; skips the summary)
Default 20 64 4 (the production benchmark config, 0.05-rad perturbed point).
A k-pair consistency check (e.g. --klo=5 --khi=25 --stages=total) should
reproduce the default k=(3,13) slope within noise; disagreement means the
slope is contaminated (hoisting, adaptive-count drift, or timing noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision  # noqa: E402

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import aqc_research_tpu.targets.trotter as trotop  # noqa: E402
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz  # noqa: E402
from aqc_research_tpu.circuit.structures import (  # noqa: E402
    make_trotter_like_circuit,
)
from aqc_research_tpu.config import svd_impl, svd_impl_override  # noqa: E402
from aqc_research_tpu.ops import mps as mpsop  # noqa: E402
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient  # noqa: E402


def slope_time(name, stage, inputs, k_lo, k_hi):
    """Per-iteration ms of ``stage(inputs, c)`` via two-point slope timing;
    the f32 scalar returned by ``stage`` is the next carry (x1e-20, NaN
    scrubbed) so iterations chain and nothing hoists."""

    def looped(k):
        @jax.jit
        def run(inputs):
            def body(c, _):
                out = stage(inputs, c)
                return jnp.nan_to_num(out) * jnp.float32(1e-20), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return run

    run_lo, run_hi = looped(k_lo), looped(k_hi)
    float(np.asarray(run_lo(inputs)))  # warm-up + first fetch (CLAUDE.md)
    float(np.asarray(run_hi(inputs)))
    t_lo = t_hi = np.inf
    for _ in range(3):
        tic = time.perf_counter()
        float(np.asarray(run_lo(inputs)))
        t_lo = min(t_lo, time.perf_counter() - tic)
        tic = time.perf_counter()
        float(np.asarray(run_hi(inputs)))
        t_hi = min(t_hi, time.perf_counter() - tic)
    per_ms = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    print(json.dumps({"stage": name, "ms_per_iter": round(per_ms, 3)}), flush=True)
    return per_ms


def main(num_qubits=20, chi=64, layers=4, k_lo=3, k_hi=13, stages=None):
    trunc_thr = 1e-6
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    th = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
    )
    th = th + 0.05 * np.random.default_rng(5).standard_normal(circ.num_thetas)
    th = jnp.asarray(th, jnp.float32)
    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=1.2, num_steps=3, delta=1.0,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    lvec = mpsop.mps_from_program(ini, num_qubits, chi_max=chi)
    assert mpsop.v_dagger_layer_cache_eligible(circ)

    prod = svd_impl()
    print(
        f"sweep budget: {num_qubits}q chi={chi} layers={layers} "
        f"production_impl={prod} backend={jax.default_backend()} "
        f"k=({k_lo},{k_hi})",
        flush=True,
    )

    def perturbed(base_th, c):
        return base_th * (1.0 + 1e-6 * c)

    def full_sweep(impl):
        def stage(inp, c):
            th_, tgt, lv = inp
            with svd_impl_override(impl):
                vh, zc = mpsop.v_dagger_mul_mps_layers(
                    circ, perturbed(th_, c), tgt, trunc_thr=trunc_thr
                )
                g = fast_dot_gradient(
                    circ, perturbed(th_, c), lv, vh,
                    trunc_thr=trunc_thr, z_layers=zc, grow_w=True,
                )
            return jnp.sum(jnp.abs(g)).astype(jnp.float32)

        return stage

    def vdag_only(impl):
        def stage(inp, c):
            th_, tgt = inp
            with svd_impl_override(impl):
                vh, _zc = mpsop.v_dagger_mul_mps_layers(
                    circ, perturbed(th_, c), tgt, trunc_thr=trunc_thr
                )
            return jnp.sum(jnp.abs(vh.gammas)).astype(jnp.float32)

        return stage

    # Fixed vh/z inputs for the gradient-only phase (production route).
    with svd_impl_override(prod):
        vh0, zc0 = jax.jit(
            lambda t, tgt: mpsop.v_dagger_mul_mps_layers(
                circ, t, tgt, trunc_thr=trunc_thr
            )
        )(th, target)

    def grad_only(impl):
        def stage(inp, c):
            th_, lv, vh, zc = inp
            with svd_impl_override(impl):
                g = fast_dot_gradient(
                    circ, perturbed(th_, c), lv, vh,
                    trunc_thr=trunc_thr, z_layers=zc, grow_w=True,
                )
            return jnp.sum(jnp.abs(g)).astype(jnp.float32)

        return stage

    def want(name):
        return stages is None or any(s in name for s in stages)

    r = {}
    for impl in (prod, "jacobi", "nullsvd"):
        if want(f"total[{impl}]"):
            r[f"total[{impl}]"] = slope_time(
                f"total[{impl}]", full_sweep(impl), (th, target, lvec),
                k_lo, k_hi,
            )
    for impl in (prod, "nullsvd"):
        if want(f"vdag[{impl}]"):
            r[f"vdag[{impl}]"] = slope_time(
                f"vdag[{impl}]", vdag_only(impl), (th, target), k_lo, k_hi
            )
    if want(f"grad[{prod}]"):
        r[f"grad[{prod}]"] = slope_time(
            f"grad[{prod}]", grad_only(prod), (th, lvec, vh0, zc0), k_lo, k_hi
        )
    if stages is not None:
        return  # stage-filtered runs skip the composite summary

    total, floor = r[f"total[{prod}]"], r["total[nullsvd]"]
    print(
        json.dumps(
            {
                "summary": f"{num_qubits}q chi={chi} layers={layers}",
                "production_impl": prod,
                "total_ms": round(total, 3),
                "sweeps_per_s": round(1e3 / total, 2) if total > 0 else None,
                "around_decomp_floor_ms": round(floor, 3),
                "decomp_ms": round(total - floor, 3),
                "decomp_share": round(1 - floor / total, 3) if total > 0 else None,
                "jacobi_total_ms": round(r["total[jacobi]"], 3),
                "vdag_ms": round(r[f"vdag[{prod}]"], 3),
                "grad_ms": round(r[f"grad[{prod}]"], 3),
                "phase_sum_ms": round(
                    r[f"vdag[{prod}]"] + r[f"grad[{prod}]"], 3
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    kw = {}
    for a in list(argv):
        if a.startswith("--klo="):
            kw["k_lo"] = int(a.split("=")[1])
            argv.remove(a)
        elif a.startswith("--khi="):
            kw["k_hi"] = int(a.split("=")[1])
            argv.remove(a)
        elif a.startswith("--stages="):
            kw["stages"] = a.split("=", 1)[1].split(",")
            argv.remove(a)
    main(*[int(x) for x in argv[:3]], **kw)
