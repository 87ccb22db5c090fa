"""Component-level timing of the MPS objective+gradient sweep on TPU.

Breaks the 20q chi=64 sweep into its pieces to locate the bottleneck:
  vdag     — v_dagger_mul_mps (fused-block sweep, per-half-layer pair SVDs)
  grad     — fast_dot_gradient (layer-batched co-sweep)
  pairs    — ONE batched pair-update phase (P disjoint pairs, one SVD phase)
  envs     — ONE <w|z> environment-stack build (two n-step scans)
  flips    — mps_flip_amplitudes (objective readout)

Usage: python benchmarks/probe_mps_parts.py [num_qubits] [chi] [layers]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision

set_precision("fast" if is_tpu() else "high")

import jax
import jax.numpy as jnp

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.ops.mps_gradient import _env_stacks, fast_dot_gradient


def timeit(name, fn, *args, repeats=10):
    out = fn(*args)
    val = float(np.asarray(out)[0])
    assert np.isfinite(val), (name, val)
    tic = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - tic) / repeats
    print(f"{name:8s}: {dt * 1e3:9.2f} ms   check={val:.6f}", flush=True)
    return dt


def main(num_qubits: int = 20, chi: int = 64, layers: int = 4):
    evol_time, delta, trunc_thr = 1.2, 1.0, 1e-6
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas = jnp.asarray(
        trotop.init_ansatz_to_trotter(
            circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=delta
        )
    )
    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=evol_time, num_steps=3, delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    lvec = mpsop.mps_from_program(ini, num_qubits, chi_max=chi)
    base_bits = tuple(1 if q % 2 == 0 else 0 for q in range(num_qubits))

    @jax.jit
    def f_vdag(th, tgt):
        vh = mpsop.v_dagger_mul_mps(circ, th, tgt, trunc_thr=trunc_thr)
        return jnp.linalg.norm(vh.lambdas).reshape(1), vh

    @jax.jit
    def f_grad(th, lv, vh):
        g = fast_dot_gradient(circ, th, lv, vh, trunc_thr=trunc_thr)
        return jnp.linalg.norm(jnp.real(g)).reshape(1)

    pairs = tuple(range(0, num_qubits - 1, 2))

    @jax.jit
    def f_pairs(m):
        from aqc_research_tpu.circuit import gates as G

        ent = G.controlled(G.x(m.gammas.dtype), m.gammas.dtype)
        gates = jnp.broadcast_to(ent, (len(pairs), 4, 4))
        out = mpsop.apply_pairs_mps(m, gates, pairs, trunc_thr=trunc_thr)
        return jnp.linalg.norm(out.lambdas).reshape(1)

    @jax.jit
    def f_envs(a, b):
        _, _, l_stack, r_stack = _env_stacks(a, b)
        return jnp.linalg.norm(jnp.abs(l_stack)).reshape(1)

    @jax.jit
    def f_flips(m):
        amps = mpsop.mps_flip_amplitudes(m, base_bits)
        return jnp.abs(amps[:1]).astype(jnp.float32)

    _, vh = f_vdag(thetas, target)
    timeit("vdag", lambda th, tgt: f_vdag(th, tgt)[0], thetas, target)
    timeit("grad", f_grad, thetas, lvec, vh)
    timeit("pairs", f_pairs, vh, repeats=20)
    timeit("envs", f_envs, lvec, vh, repeats=20)
    timeit("flips", f_flips, vh, repeats=20)


if __name__ == "__main__":
    argv = sys.argv[1:]
    for a in list(argv):
        if a.startswith("--svd-impl="):
            from aqc_research_tpu.config import set_svd_impl

            set_svd_impl(a.split("=", 1)[1])
            argv.remove(a)
    main(*[int(a) for a in argv[:3]])
