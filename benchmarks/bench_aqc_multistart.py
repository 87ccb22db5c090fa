"""BASELINE configs 1 and 4: 5q full AQC and batched multi-start ASP.

Config 1 — full AQC: spin ansatz vs a dense Trotter-like target unitary,
Frobenius-cost objective ``1 - Re<V,U>/2^n`` with the analytic matrix
co-sweep gradient (reference aqc.ipynb defaults; sk_core "full" sketching).
Reports evals/sec of the fused objective+gradient kernel.

Config 4 — multi-start: optimize_horizon_multistart runs B on-device L-BFGS
instances in lock-step (the vmap replacement of joblib's run_jobs).  Reports
wall time for the fleet vs. B x the single-start time, plus the best
fidelity (execution proof).

Usage: python benchmarks/bench_aqc_multistart.py [num_qubits] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision

import jax

if "--cpu" in sys.argv:
    # Must run before the backend initializes (is_tpu() below initializes it).
    jax.config.update("jax_platforms", "cpu")

set_precision("fast" if is_tpu() else "high")

import jax.numpy as jnp

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import Ansatz, TrotterAnsatz
from aqc_research_tpu.circuit.structures import create_ansatz_structure, make_trotter_like_circuit
from aqc_research_tpu.models.sp_lhs.jit_asp import (
    flip_state_indices,
    optimize_horizon_jit,
    optimize_horizon_multistart,
)
from aqc_research_tpu.ops.gradients import grad_of_matrix_dot_product
from aqc_research_tpu.ops.statevector import v_dagger_mul_mat
from aqc_research_tpu.utils import from_host, rand_thetas


def bench_full_aqc(n: int = 5, depth: int = 160):
    """Config 1: fused Frobenius objective + gradient evals/sec."""
    blocks = create_ansatz_structure(n, "spin", depth=depth)
    circ = Ansatz.make(n, "cx", blocks)
    dim = 2**n
    u = np.asarray(
        trotop.exact_evolution(
            trotop.make_hamiltonian(n, 1.0), np.eye(dim, dtype=complex), 1.0
        )
    )
    u_dev = from_host(u.astype(np.complex64 if is_tpu() else np.complex128))
    np.random.seed(0)
    thetas = jnp.asarray(rand_thetas(circ.num_thetas))

    def obj_grad_body(th, tgt):
        vh_u = v_dagger_mul_mat(circ, th, tgt)
        hs = jnp.trace(vh_u) / dim
        fobj = 1.0 - jnp.real(hs)
        grad = grad_of_matrix_dot_product(circ, th, jnp.eye(dim, dtype=tgt.dtype), vh_u)
        return fobj, jnp.real(-grad / dim)

    obj_grad = jax.jit(obj_grad_body)

    f, g = obj_grad(thetas, u_dev)
    f0 = float(np.asarray(f))  # fetch — proves execution
    assert np.isfinite(f0) and 0 < f0 < 2, f0
    repeats = 50
    tic = time.perf_counter()
    for _ in range(repeats):
        f, g = obj_grad(thetas, u_dev)
    g.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(
        json.dumps(
            {
                "metric": f"full-AQC fused objective+gradient evals/sec, {n}q spin depth {depth}",
                "value": round(1.0 / dt, 2),
                "unit": "evals/s (per-dispatch)",
                "num_thetas": circ.num_thetas,
                "fobj": round(f0, 6),
            }
        ),
        flush=True,
    )

    # In-loop rate: the production path runs the WHOLE L-BFGS on device
    # (models/sp_lhs/jit_asp pattern), so per-call dispatch latency is paid
    # once per optimization, not once per evaluation.  The stateful solver
    # threads an evaluation counter through every call (linesearch trials
    # included) for an honest evals/s denominator.
    from aqc_research_tpu.optim.lbfgs import minimize_lbfgs_compact_stateful

    loop_iters = 60

    @jax.jit
    def run_loop(th0, tgt):
        def fval(x, st):
            f, _ = obj_grad_body(x, tgt)
            return f, st + 1

        def fgrad(x, st):
            f, gr = obj_grad_body(x, tgt)
            return f, gr, st + 1

        res, st = minimize_lbfgs_compact_stateful(
            fval, fgrad, th0, jnp.zeros((), jnp.int32), maxiter=loop_iters
        )
        return res.fobj, st

    fobj_end, n_evals = run_loop(thetas, u_dev)
    fobj_end = float(np.asarray(fobj_end))  # fetch
    n_evals = int(np.asarray(n_evals))
    assert np.isfinite(fobj_end) and fobj_end < f0, (fobj_end, f0)
    repeats = 5
    tic = time.perf_counter()
    for _ in range(repeats):
        out, cnt = run_loop(thetas, u_dev)
    out.block_until_ready()
    dt_loop = (time.perf_counter() - tic) / repeats
    print(
        json.dumps(
            {
                "metric": f"full-AQC jitted L-BFGS eval rate, {n}q spin depth {depth}",
                "value": round(n_evals / dt_loop, 2),
                "unit": "evals/s (in-loop)",
                "evals_per_run": n_evals,
                "loop_iters": loop_iters,
                "fobj_after": round(fobj_end, 6),
            }
        ),
        flush=True,
    )

    # Production fan-out mode: the AQC driver runs num_simulations restarts;
    # vmapping the fused eval over a batch of Θ costs ~1x a single eval
    # (measured), multiplying the aggregate rate.  Fetch-first then time
    # (axon measurement discipline, CLAUDE.md).
    B = 8
    np.random.seed(1)
    th_batch = jnp.asarray(
        np.stack([rand_thetas(circ.num_thetas) for _ in range(B)])
    )

    @jax.jit
    def obj_grad_batch(ths, tgt):
        return jax.vmap(obj_grad_body, in_axes=(0, None))(ths, tgt)

    fb, gb = obj_grad_batch(th_batch, u_dev)
    assert np.all(np.isfinite(np.asarray(fb)))  # fetch — proves execution
    repeats = 30
    tic = time.perf_counter()
    for _ in range(repeats):
        fb, gb = obj_grad_batch(th_batch, u_dev)
    gb.block_until_ready()
    dt_b = (time.perf_counter() - tic) / repeats
    print(
        json.dumps(
            {
                "metric": (
                    f"full-AQC batched objective+gradient aggregate rate, "
                    f"{n}q spin depth {depth}, {B} restarts"
                ),
                "value": round(B / dt_b, 2),
                "unit": "evals/s (aggregate)",
                "batch": B,
                "per_batch_ms": round(dt_b * 1e3, 3),
            }
        ),
        flush=True,
    )


def bench_multistart(n: int = 12, batch: int = 8, maxiter: int = 150):
    """Config 4: fleet-of-B on-device L-BFGS vs one instance."""
    evol_time, layers = 1.2, 2
    circ = TrotterAnsatz.make(n, make_trotter_like_circuit(n, layers), True)
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=1.0
    )
    rng = np.random.default_rng(3)
    batch0 = thetas0[None, :] + 0.2 * rng.standard_normal((batch, circ.num_thetas))
    ini = trotop.neel_init_state(n)
    target = trotop.Trotter(
        num_qubits=n, evol_time=evol_time, num_steps=6, delta=1.0,
        second_order=True,
    ).as_vector(ini)
    idx = flip_state_indices(n, ini)

    def run_single():
        res = optimize_horizon_jit(
            circ, batch0[0], target, state_idx=idx, maxiter=maxiter
        )
        return float(np.asarray(res.fobj))

    def run_fleet(fuse=False):
        res = optimize_horizon_multistart(
            circ, batch0, target, state_idx=idx, maxiter=maxiter,
            fuse_linesearch_grad=fuse,
        )
        return np.asarray(res.fobj)

    f1 = run_single()  # compile + fetch
    tic = time.perf_counter()
    f1 = run_single()
    t_single = time.perf_counter() - tic

    fb = run_fleet()  # compile + fetch
    tic = time.perf_counter()
    fb = run_fleet()
    t_fleet = time.perf_counter() - tic
    assert np.all(np.isfinite(fb)), fb

    fbf = run_fleet(fuse=True)  # compile + fetch
    tic = time.perf_counter()
    fbf = run_fleet(fuse=True)
    t_fleet_fused = time.perf_counter() - tic
    assert np.all(np.isfinite(fbf)), fbf

    # Batched-eval scaling diagnostic: raw objective+gradient at B=1 vs B,
    # isolating compute scaling from the lockstep-linesearch effect.
    from aqc_research_tpu.models.sp_lhs.jit_asp import make_surrogate_loss

    loss = make_surrogate_loss(circ, tuple(int(i) for i in idx), 0.0)
    vg = jax.value_and_grad(loss)
    tgt = jnp.asarray(target)

    @jax.jit
    def eval1(th, t):
        return vg(th, t)

    @jax.jit
    def evalB(ths, t):
        return jax.vmap(vg, in_axes=(0, None))(ths, t)

    b0 = jnp.asarray(batch0)
    for f_, args in ((eval1, (b0[0], tgt)), (evalB, (b0, tgt))):
        f_(*args)[1].block_until_ready()
    reps = 30
    tic = time.perf_counter()
    for _ in range(reps):
        out = eval1(b0[0], tgt)
    out[1].block_until_ready()
    t_e1 = (time.perf_counter() - tic) / reps
    tic = time.perf_counter()
    for _ in range(reps):
        out = evalB(b0, tgt)
    out[1].block_until_ready()
    t_eb = (time.perf_counter() - tic) / reps

    print(
        json.dumps(
            {
                "metric": f"multi-start ASP fleet efficiency, {n}q x {batch} starts, {maxiter} iters",
                "value": round(batch * t_single / t_fleet, 2),
                "unit": "x speedup vs sequential singles",
                "t_single_s": round(t_single, 3),
                "t_fleet_s": round(t_fleet, 3),
                "t_fleet_fused_s": round(t_fleet_fused, 3),
                "fused_speedup_x": round(batch * t_single / t_fleet_fused, 2),
                "best_fobj_fused": round(float(fbf.min()), 8),
                "eval_ms_b1": round(t_e1 * 1e3, 3),
                "eval_ms_bB": round(t_eb * 1e3, 3),
                "eval_batch_overhead_x": round(t_eb / t_e1, 2),
                "best_fobj": round(float(fb.min()), 8),
                "single_fobj": round(f1, 8),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    argv = [int(a) for a in argv[:2]]
    bench_full_aqc()
    bench_multistart(*(argv or [12, 8]))
