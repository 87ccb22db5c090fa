"""Point diagnosis of the 16q chi=64 rand jitloop failure (r4 A/B batch:
unfused rand q=1 landed fobj=1.0 while jacobi / fused-rand / rand-q0 landed
~2.4e-3).  Reproduces the probe_mps_jit_loop setup EXACTLY (seed 7, 0.1-rad
perturbation, trunc_thr=1e-8) and evaluates, under each SVD impl variant:

  * the VALUE path   (v_mul_mps_growing — what the Armijo linesearch calls),
  * the VALUE+GRAD path (v_dagger layer cache + z-free co-sweep),
  * both again after one small gradient step,

printing fobj / gnorm / finiteness.  The two paths must agree per impl, and
all impls must agree with jacobi to f32 levels; a divergence localizes the
failure to a path and a variant without running the full L-BFGS loop.

Usage: probe_rand_16q_point.py [n chi layers] [--cpu] [--thr=1e-8]
Variants via env, e.g. AQC_TPU_RAND_POWER_ITERS / AQC_TPU_RAND_INTERMEDIATE.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision, set_svd_impl

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

if "--fast" in sys.argv:
    sys.argv.remove("--fast")
    set_precision("fast")
else:
    set_precision("fast" if is_tpu() else "high")

import jax
import jax.numpy as jnp

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.ops.mps import (
    mps_basis_state,
    mps_dot,
    v_dagger_mul_mps_layers,
    v_mul_mps_growing,
)
from aqc_research_tpu.ops.mps_gradient import fast_dot_gradient_with_state


def main(num_qubits=16, chi=64, layers=2, trunc_thr=1e-8):
    evol_time, delta = 0.6, 1.0
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=delta
    )
    rng = np.random.default_rng(7)
    thetas0 = jnp.asarray(
        thetas0 + 0.1 * rng.standard_normal(circ.num_thetas), jnp.float32
    )
    ini = trotop.neel_init_state(num_qubits)
    base_bits = tuple(1 if q % 2 == 0 else 0 for q in range(num_qubits))
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=evol_time, num_steps=3, delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    lvec = mps_basis_state(base_bits, chi, target.gammas.dtype)

    # target/lvec are device-resident complex pytrees: they must be passed as
    # traced arguments, NOT closed over (jit closure => MLIR constant
    # embedding => host fetch of c64 => UNIMPLEMENTED on the axon backend).
    @jax.jit
    def value(th, tgt):
        w = v_mul_mps_growing(
            circ, th, base_bits, chi, trunc_thr=trunc_thr,
            dtype=target.gammas.dtype,
        )
        hs = mps_dot(w, tgt)
        return (1.0 - jnp.abs(hs) ** 2).real

    @jax.jit
    def value_and_grad(th, tgt, lv):
        vh, zcache = v_dagger_mul_mps_layers(circ, th, tgt, trunc_thr=trunc_thr)
        grad, w_fin = fast_dot_gradient_with_state(
            circ, th, lv, vh, zcache, trunc_thr=trunc_thr, grow_w=True
        )
        hs0 = mps_dot(w_fin, tgt)
        fobj = (1.0 - jnp.abs(hs0) ** 2).real
        return fobj, jnp.real(-2.0 * jnp.conj(hs0) * grad)

    for impl in ("jacobi", "rand"):
        set_svd_impl(impl)
        jax.clear_caches()
        tic = time.perf_counter()
        f0 = float(np.asarray(value(thetas0, target)))
        fg0, g0 = value_and_grad(thetas0, target, lvec)
        fg0 = float(np.asarray(fg0))
        g0h = np.asarray(g0)
        gn0 = float(np.linalg.norm(g0h))
        step = thetas0 - jnp.asarray(0.05 / max(gn0, 1e-9), jnp.float32) * g0
        f1 = float(np.asarray(value(step, target)))
        fg1, g1 = value_and_grad(step, target, lvec)
        fg1 = float(np.asarray(fg1))
        gn1 = float(np.linalg.norm(np.asarray(g1)))
        print(
            f"impl={impl:7s} value(x0)={f0:.6e} vg(x0)={fg0:.6e} "
            f"gnorm={gn0:.6f} finite={np.all(np.isfinite(g0h))} | "
            f"step: value={f1:.6e} vg={fg1:.6e} gnorm={gn1:.6f} "
            f"({time.perf_counter() - tic:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    thr = 1e-8
    for a in list(sys.argv[1:]):
        if a.startswith("--thr="):
            thr = float(a.split("=", 1)[1])
            sys.argv.remove(a)
    args = [int(a) for a in sys.argv[1:4]]
    main(*args, trunc_thr=thr)
