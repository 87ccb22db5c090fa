"""Half-layer walk of the 16q Trotter target evolution under unfused rand
vs jacobi — captures the FIRST divergent half-layer and its pair batch.

Context: the unfused-rand route builds a wrong Trotter target at
(oversample=16 -> ell=80, thr=1e-8) on TPU (results/r4/x0_disc.log), yet
the raw rectangular kernel matches its interpreter reference at that
exact shape on generic spectra (probe_kernel_rect).  The trigger must be
the EVOLUTION's data.  This probe replicates trotter_evolve_mps's
half-layer structure host-driven (no scan), advancing TWO states in
lockstep — one updated by jacobi, one by the active rand config — from
the same Neel product state, printing after every half-layer:

    <w_rand | w_jacobi> overlap, both norms, bond-rank summaries.

At the first half-layer where the cross overlap leaves 1 - 1e-3 it dumps
the JACOBI state's pair-theta batch (the input both impls saw at the
divergence point, up to f32 history drift) to --dump for offline factor
diffing, then stops.

Usage: probe_rand_target_walk.py [n chi] [--thr=1e-8] [--dump=path.npz]
Env: AQC_TPU_RAND_OVERSAMPLE etc. select the rand variant;
AQC_TPU_ALLOW_UNFUSED_RAND=1 + AQC_TPU_FUSED_PAIR=0 for the failing one.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision, set_svd_impl

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast")

import jax
import jax.numpy as jnp

import aqc_research_tpu.targets.trotter as trotop
from aqc_research_tpu.ops import mps as mpsop
from aqc_research_tpu.targets.trotter import _block_4x4_lo_hi, trotter_alphas


def main(num_qubits=16, chi=64, trunc_thr=1e-8, dump=None):
    evol_time, delta, num_steps = 0.6, 1.0, 3
    dt = evol_time / num_steps
    ini = trotop.neel_init_state(num_qubits)
    base = mpsop.mps_from_program(ini, num_qubits, chi_max=chi, trunc_thr=trunc_thr)
    dtype = base.gammas.dtype
    # alphas/betas stay REAL on the host; the complex 4x4 blocks are built
    # INSIDE jit (eager _block_4x4_lo_hi would create lazily-invalid
    # complex buffers on this backend).
    alphas = jnp.asarray(np.asarray(trotter_alphas(dt, delta)))
    betas = jnp.asarray(np.asarray(trotter_alphas(dt * 0.5, delta)))

    # the second-order half-layer schedule of trotter_evolve_mps
    sched = [(betas, 0), (alphas, 1)]
    for _ in range(num_steps - 1):
        sched += [(alphas, 0), (alphas, 1)]
    sched += [(betas, 0)]

    def build_half_layer(impl):
        # The svd impl is read at TRACE time inside _pair_update; giving
        # each impl its OWN jitted function object keeps the compiled
        # caches separate (a shared function would silently reuse the
        # first impl's program for both).
        def hl(m, coeffs, start):
            set_svd_impl(impl)
            blk = _block_4x4_lo_hi(coeffs, dtype)
            los = tuple(range(start, num_qubits - 1, 2))
            gates = jnp.broadcast_to(blk, (len(los), 4, 4))
            return mpsop.apply_pairs_mps(m, gates, los, trunc_thr=trunc_thr)

        return jax.jit(hl, static_argnums=(2,))

    hl_j = build_half_layer("jacobi")
    hl_r = build_half_layer("rand")

    @jax.jit
    def overlap(a, b):
        hs = mpsop.mps_dot(a, b)
        return jnp.abs(hs), jnp.abs(mpsop.mps_dot(a, a)), jnp.abs(mpsop.mps_dot(b, b))

    w_j, w_r = base, base
    for step, (coeffs, start) in enumerate(sched):
        los = tuple(range(start, num_qubits - 1, 2))
        w_j_prev = w_j
        w_j = hl_j(w_j, coeffs, start)
        w_r = hl_r(w_r, coeffs, start)
        ov, na, nb = (float(np.asarray(x)) for x in overlap(w_r, w_j))
        lam_j = np.asarray(w_j.lambdas)
        lam_r = np.asarray(w_r.lambdas)
        print(
            f"hl {step:2d} (start={start}): |<r|j>|={ov:.6f} "
            f"|r|={na:.6f} |j|={nb:.6f} "
            f"rank j/r={int((lam_j > 0).sum())}/{int((lam_r > 0).sum())} "
            f"nan j/r={int(np.isnan(lam_j).sum())}/{int(np.isnan(lam_r).sum())}",
            flush=True,
        )
        if ov < 1.0 - 1e-3:
            print(f"DIVERGED at half-layer {step}", flush=True)
            if dump:
                # the INPUT batch of the divergent half-layer: thetas from
                # the pre-update jacobi state (what both impls decomposed,
                # up to f32 history drift)
                gates = jax.jit(
                    lambda c: jnp.broadcast_to(
                        _block_4x4_lo_hi(c, dtype), (len(los), 4, 4)
                    )
                )(coeffs)
                thetas = mpsop.pair_thetas(w_j_prev, gates, los)
                from aqc_research_tpu.utils import to_host

                os.makedirs(os.path.dirname(os.path.abspath(dump)), exist_ok=True)
                np.savez(
                    dump,
                    thetas=to_host(thetas),
                    los=np.asarray(los),
                    step=step,
                    trunc_thr=trunc_thr,
                )
                print(f"pair-theta batch dumped to {dump}", flush=True)
            return
    print("no divergence (final overlap above 1 - 1e-3)", flush=True)


if __name__ == "__main__":
    thr, dump = 1e-8, None
    for a in list(sys.argv[1:]):
        if a.startswith("--thr="):
            thr = float(a.split("=", 1)[1])
            sys.argv.remove(a)
        elif a.startswith("--dump="):
            dump = a.split("=", 1)[1]
            sys.argv.remove(a)
    args = [int(a) for a in sys.argv[1:3]]
    main(*args, trunc_thr=thr, dump=dump)
