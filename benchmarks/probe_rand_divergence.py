"""Trajectory localization of the TPU-only unfused-rand 16q failure.

The on-chip 16q chi=64 jitted L-BFGS lands fobj=1.0 under the UNFUSED rand
route while jacobi / fused-rand / rand-q0 land ~2.4e-3 (results/r4/
rand_ab.log), yet every probe-point check is clean (value/grad parity at
x0 and one step; rank-deficient primitive discriminators OK).  The failure
therefore develops at some mid-optimization iterate.  This probe re-runs
the SAME optimization HOST-DRIVEN (two-loop L-BFGS + Armijo mirroring
optim/lbfgs.py's compact loop) so every iterate is fetchable, and prints
per iteration:

  * fobj and grad norm (the divergence signal),
  * the w-state bond-spectrum health under the ACTIVE impl: per-bond kept
    rank, min/max lambda, NaN count — an all-zero or NaN bond pinpoints
    the pair update that killed the state (fobj=1.0 means zero overlap,
    which is what an all-false keep mask produces: NaN singular values
    make `tail > thr*total` all-false and _pair_update zeroes the bond).

On divergence it dumps the offending thetas to --dump (npz) so the pair
matrices can be replayed per half-layer on CPU/f64 for the exact bad
decomposition.

Usage: probe_rand_divergence.py [n chi layers iters] [--cpu] [--thr=1e-8]
       [--dump=/tmp/div16.npz]
Impl via env: AQC_TPU_SVD_IMPL=rand AQC_TPU_FUSED_PAIR=0 (the failing
config), =jacobi (reference), fused default (the production route).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast" if is_tpu() or "--fast" in sys.argv else "high")
if "--fast" in sys.argv:
    sys.argv.remove("--fast")

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


def main(num_qubits=16, chi=64, layers=2, iters=15, trunc_thr=1e-8, dump=None):
    evol_time, delta = 0.6, 1.0
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas0 = trotop.init_ansatz_to_trotter(
        circ, np.zeros(circ.num_thetas), evol_time=evol_time, delta=delta
    )
    rng = np.random.default_rng(7)  # probe_mps_jit_loop's seed/perturbation
    x = np.float32(thetas0 + 0.1 * rng.standard_normal(circ.num_thetas))
    ini = trotop.neel_init_state(num_qubits)
    base_bits = tuple(1 if q % 2 == 0 else 0 for q in range(num_qubits))
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=evol_time, num_steps=3, delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    lvec = mps_basis_state(base_bits, chi, target.gammas.dtype)

    # target/lvec as traced args (jit-closure over device complex arrays is
    # the documented lazily-invalid hazard on this backend).
    @jax.jit
    def vg(th, tgt, lv):
        vh, zcache = v_dagger_mul_mps_layers(circ, th, tgt, trunc_thr=trunc_thr)
        grad, w_fin = fast_dot_gradient_with_state(
            circ, th, lv, vh, zcache, trunc_thr=trunc_thr, grow_w=True
        )
        hs0 = mps_dot(w_fin, tgt)
        fobj = (1.0 - jnp.abs(hs0) ** 2).real
        g = jnp.real(-2.0 * jnp.conj(hs0) * grad)
        # Bond health of the w state under the active impl: lambdas are
        # REAL — fetchable directly.
        return fobj, g, w_fin.lambdas

    @jax.jit
    def value_only(th, tgt):
        w = v_mul_mps_growing(
            circ, th, base_bits, chi, trunc_thr=trunc_thr,
            dtype=target.gammas.dtype,
        )
        return (1.0 - jnp.abs(mps_dot(w, tgt)) ** 2).real, w.lambdas

    def health(lams):
        lams = np.asarray(lams)
        nan = int(np.isnan(lams).sum())
        ranks = (lams > 0).sum(axis=-1)
        return (
            f"bond-rank[min/max]={int(ranks.min())}/{int(ranks.max())} "
            f"lam[max]={np.nanmax(lams):.2e} nan={nan} "
            f"dead-bonds={int((ranks == 0).sum())}"
        )

    m_hist, rho = 8, 1e-4
    ss, ys = [], []
    f, g, lams = (np.asarray(t) for t in vg(x, target, lvec))
    print(f"iter  0: fobj={float(f):.6e} |g|={np.linalg.norm(g):.4f} "
          f"{health(lams)}", flush=True)
    x_prev, g_prev = None, None
    for it in range(1, iters + 1):
        # two-loop recursion
        q = np.asarray(g, np.float64).copy()
        alphas = []
        for s, y in zip(reversed(ss), reversed(ys)):
            a = (s @ q) / (y @ s)
            alphas.append(a)
            q -= a * y
        if ys:
            s, y = ss[-1], ys[-1]
            q *= (s @ y) / (y @ y)
        for (s, y), a in zip(zip(ss, ys), reversed(alphas)):
            b = (y @ q) / (y @ s)
            q += (a - b) * s
        d = -q
        gd = g @ d
        if gd >= 0:
            d, gd = -np.asarray(g, np.float64), -float(g @ g)
        # Armijo backtrack with per-trial fetch.  On exhaustion the carry
        # keeps the LAST EVALUATED step so the printed objective/bond
        # health describe exactly the point the probe continues from.
        step, f_new = 1.0, None
        for trial in range(12):
            f_try, lam_try = value_only(np.float32(x + step * d), target)
            f_try = float(np.asarray(f_try))
            if np.isfinite(f_try) and f_try <= f + rho * step * gd:
                f_new, lams_v = f_try, lam_try
                break
            if trial < 11:
                step *= 0.5
        if f_new is None:
            print(f"iter {it:2d}: NO armijo step accepted (f={f:.6e}); "
                  f"last trial f={f_try:.6e} {health(lam_try)}", flush=True)
            f_new, lams_v = f_try, lam_try
        x_new = np.float32(x + step * d)
        f2, g_new, lams_g = (np.asarray(t) for t in vg(x_new, target, lvec))
        print(
            f"iter {it:2d}: step={step:.3f} f(value)={f_new:.6e} "
            f"f(vg)={float(f2):.6e} |g|={np.linalg.norm(g_new):.4f} "
            f"value-path[{health(lams_v)}] grad-path[{health(lams_g)}]",
            flush=True,
        )
        diverged = (not np.isfinite(f2)) or float(f2) > 0.99 or np.isnan(
            np.asarray(lams_g)
        ).any()
        if diverged and dump:
            os.makedirs(os.path.dirname(os.path.abspath(dump)), exist_ok=True)
            np.savez(dump, x=x_new, x_prev=x, f=float(f2))
            print(f"DIVERGED at iter {it} — thetas dumped to {dump}", flush=True)
            return
        s_vec = (x_new - x).astype(np.float64)
        y_vec = (np.asarray(g_new) - np.asarray(g)).astype(np.float64)
        if s_vec @ y_vec > 1e-12:
            ss.append(s_vec)
            ys.append(y_vec)
            if len(ss) > m_hist:
                ss.pop(0)
                ys.pop(0)
        x, f, g = x_new, float(f2), g_new
    print(f"final: fobj={f:.6e} (no divergence trigger)", flush=True)


if __name__ == "__main__":
    thr, dump = 1e-8, None
    for a in list(sys.argv[1:]):
        if a.startswith("--thr="):
            thr = float(a.split("=", 1)[1])
            sys.argv.remove(a)
        elif a.startswith("--dump="):
            dump = a.split("=", 1)[1]
            sys.argv.remove(a)
    args = [int(a) for a in sys.argv[1:5]]
    main(*args, trunc_thr=thr, dump=dump)
