"""Where does the MPS obj+grad sweep spend its time IN-JIT?

The round-4 stage-split probe (probe_rand_stages) timed the decomposition
batch as a SEPARATE dispatch, where every stage carries the ~2.4-3 ms
tunnel sync — it bounds the decomposition from above but cannot say what
fraction of the 30 ms jitted sweep the decompositions actually are.  This
probe answers that inside one jitted program by swapping the decomposition
for an O(n^2) FAKE (orthonormal identity factors + column-norm singular
values + the real keep-mask rule) and timing otherwise-identical sweeps:

    full-rand    production default (fused-rand megakernel route)
    full-jacobi  plain Pallas Jacobi kernel, fusion off (XLA theta build)
    fake         fusion off + _truncated_svd -> fake  (the contraction
                 floor: theta builds, scatters, environments, transfers)

    decomposition share (jacobi) = (full-jacobi - fake) / full-jacobi
    production decomposition     = (full-rand  - fake) / full-rand
                                   (approximate: the fused route also moves
                                   the theta build into Pallas, so the rand
                                   delta mixes the two — the jacobi delta is
                                   the clean one)

The fake keeps all shapes/dtypes and the REAL truncation-mask rule, so
keep/drop counts and downstream control flow match production; the state it
evolves is numerical garbage, which is irrelevant for timing (all shapes
are static).  Workload matches benchmarks/bench_mps.py (same ansatz,
target, perturbation seed).

Usage: python benchmarks/probe_sweep_composition.py [n] [chi] [layers]
       [--perturb=0.05] [--cpu]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fake_truncated_svd(mpsop, jnp):
    def fake(m, chi, trunc_thr):
        n = m.shape[-1]
        s = jnp.linalg.norm(m[..., :, :chi], axis=-2)
        u = jnp.broadcast_to(
            jnp.eye(n, chi, dtype=m.dtype), m.shape[:-2] + (n, chi)
        )
        vh = jnp.broadcast_to(
            jnp.eye(chi, n, dtype=m.dtype), m.shape[:-2] + (chi, n)
        )
        total = jnp.linalg.norm(m, axis=(-2, -1)).astype(s.dtype)
        mask = mpsop._truncation_mask_topk(s, total, chi, trunc_thr)
        return u, s, vh, mask, total

    return fake


def main(num_qubits=20, chi=64, layers=4, perturb=0.05):
    import jax
    import jax.numpy as jnp

    from aqc_research_tpu import config
    from aqc_research_tpu.config import is_tpu, set_precision

    set_precision("fast" if is_tpu() else "high")

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
        rng = np.random.default_rng(5)  # matches bench_mps / probe_sweep_counts
        thetas = thetas + perturb * rng.standard_normal(circ.num_thetas)
    thetas = jnp.asarray(thetas)

    ini = trotop.neel_init_state(num_qubits)
    trunc_thr = 1e-6
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=evol_time, num_steps=3, delta=delta,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    lvec = mpsop.mps_from_program(ini, num_qubits, chi_max=chi)

    @jax.jit
    def gnorm(g):
        return jnp.linalg.norm(jnp.real(g)).reshape(1).astype(jnp.float32)

    def make_sweep():
        # A FRESH function object per variant: jax.jit's global cache is
        # keyed on the wrapped callable, so re-jitting the same function
        # would silently reuse the previous variant's executable and never
        # see the monkeypatch/config change (observed: identical grad_norm,
        # compile_s=0.0 on variants 2-3).
        def one_sweep(th, tgt, lv):
            vh, zc = mpsop.v_dagger_mul_mps_layers(
                circ, th, tgt, trunc_thr=trunc_thr
            )
            return fast_dot_gradient(
                circ, th, lv, vh, trunc_thr=trunc_thr, z_layers=zc, grow_w=True
            )

        return one_sweep

    orig = mpsop._truncated_svd
    fake = _fake_truncated_svd(mpsop, jnp)

    def run_variant(name, impl, fused, patch_fake):
        config.set_svd_impl(impl)
        config.set_fused_pair(fused)
        mpsop._truncated_svd = fake if patch_fake else orig
        # Inner jitted helpers cache traces keyed on their own function
        # objects; without a full cache clear variants 2-3 reuse variant
        # 1's executables and never see the patch/config change.
        jax.clear_caches()
        try:
            sweep = jax.jit(make_sweep())
            tic = time.perf_counter()
            g = sweep(thetas, target, lvec)
            norm_val = float(np.asarray(gnorm(g))[0])
            assert np.isfinite(norm_val), norm_val
            compile_s = time.perf_counter() - tic
            repeats = 5
            tic = time.perf_counter()
            for _ in range(repeats):
                g = sweep(thetas, target, lvec)
            g.block_until_ready()
            per = (time.perf_counter() - tic) / repeats
            print(
                json.dumps(
                    {
                        "variant": name,
                        "ms_per_sweep": round(per * 1e3, 3),
                        "sweeps_per_s": round(1.0 / per, 2),
                        "compile_s": round(compile_s, 1),
                        "grad_norm": round(norm_val, 6),
                    }
                ),
                flush=True,
            )
            return per
        finally:
            mpsop._truncated_svd = orig
            config.set_svd_impl(None)
            config.set_fused_pair(None)

    t_rand = run_variant("full-rand (production)", "rand", None, False)
    t_jac = run_variant("full-jacobi (fusion off)", "jacobi", False, False)
    t_fake = run_variant("fake-svd contraction floor", "jacobi", False, True)

    print(
        json.dumps(
            {
                "config": f"{num_qubits}q chi={chi} layers={layers} perturb={perturb}",
                "decomp_share_jacobi": round((t_jac - t_fake) / t_jac, 3),
                "decomp_share_rand_approx": round((t_rand - t_fake) / t_rand, 3),
                "contraction_floor_sweeps_per_s": round(1.0 / t_fake, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    perturb = 0.05
    for a in list(argv):
        if a.startswith("--perturb="):
            perturb = float(a.split("=", 1)[1])
            argv.remove(a)
    main(*[int(a) for a in argv[:3]], perturb=perturb)
