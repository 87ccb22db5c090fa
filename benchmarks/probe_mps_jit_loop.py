"""TPU retest of optimize_horizon_mps_jit (the fully-on-device MPS L-BFGS loop).

Round-1 history: this loop appeared to poison the axon runtime.  Root cause
was the lazily-invalid complex-buffer bug (the probe's MPS target was built
via the then-eager mps_zero); the jitted-constructor / from_host fixes landed
afterwards.  This probe re-runs the loop on TPU with clean inputs, FETCHES
the results (fetch is the only reliable failure surface), and then runs a
second small program to prove the runtime is not poisoned.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision

if "--cpu" in sys.argv:  # force the CPU backend (sitecustomize pins axon)
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

if "--fast" in sys.argv:  # f32 on CPU: reproduce TPU-precision failures off-chip
    sys.argv.remove("--fast")
    set_precision("fast")
else:
    set_precision("fast" if is_tpu() else "high")

import jax.numpy as jnp

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
from aqc_research_tpu.models.sp_lhs.jit_asp import optimize_horizon_mps_jit
from aqc_research_tpu.utils import to_host


def main(
    num_qubits: int = 12,
    chi: int = 32,
    layers: int = 2,
    maxiter: int = 20,
    trunc_thr: float = 1e-8,
):
    evol_time, delta = 0.6, 1.0
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=delta
    )
    rng = np.random.default_rng(7)
    thetas0 = thetas0 + 0.1 * rng.standard_normal(circ.num_thetas)

    ini = trotop.neel_init_state(num_qubits)
    # Per-site 0/1 occupation of the Neel prep (tests/test_jit_asp.py:117).
    base_bits = [1 if q % 2 == 0 else 0 for q in range(num_qubits)]
    target = trotop.Trotter(
        num_qubits=num_qubits,
        evol_time=evol_time,
        num_steps=3,
        delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)

    tic = time.perf_counter()
    res = optimize_horizon_mps_jit(
        circ,
        jnp.asarray(thetas0),
        target,
        base_bits=base_bits,
        trunc_thr=trunc_thr,
        maxiter=maxiter,
    )
    fobj = float(np.asarray(res.fobj))  # FETCH — the real failure surface
    nit = int(np.asarray(res.num_iters))
    best = to_host(res.thetas)
    elapsed = time.perf_counter() - tic
    assert np.all(np.isfinite(best))
    print(
        f"mps jit loop OK: fobj={fobj:.6e} nit={nit} "
        f"time={elapsed:.1f}s (incl. compile)", flush=True
    )

    # Second program on the same runtime — proves no poisoning.
    x = jnp.arange(8.0)
    y = float(np.asarray(jnp.sum(x * x)))
    assert y == 140.0, y
    print("runtime healthy after loop: sum check", y, flush=True)


if __name__ == "__main__":
    thr = 1e-8
    for a in list(sys.argv[1:]):
        if a.startswith("--thr="):
            thr = float(a.split("=", 1)[1])
            sys.argv.remove(a)
    args = [int(a) for a in sys.argv[1:5]]
    main(*args, trunc_thr=thr)
