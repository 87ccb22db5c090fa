"""Analyze the captured divergent pair-theta batch (probe_rand_target_walk
--dump) under the failing unfused-rand configuration ON CHIP.

Loads the (P, 2chi, 2chi) thetas, runs ops/mps._truncated_svd with
svd_impl=rand (env selects oversample etc.), and prints per element:
  * top/bottom kept singular values vs the f64 LAPACK reference,
  * the keep-mask population and the discarded weight,
  * factor reconstruction error and the per-bond norm of u diag(s) vh,
plus the same through the plain jacobi kernel for contrast.  The element
whose factors are garbage is the minimal kernel-level repro.

Usage: probe_walk_theta_analyze.py path.npz [chi] [--cpu]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import set_precision, set_svd_impl

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast")

import jax
import jax.numpy as jnp

from aqc_research_tpu.ops.mps import _truncated_svd
from aqc_research_tpu.utils import from_host, to_host


def main(path, chi=64):
    data = np.load(path)
    thetas = data["thetas"].astype(np.complex64)
    thr = float(data["trunc_thr"])
    print(f"loaded {thetas.shape} thetas, trunc_thr={thr:g}, chi={chi}", flush=True)

    ss_ref = np.linalg.svd(thetas.astype(np.complex128), compute_uv=False)

    m = from_host(thetas)
    for impl in ("rand", "jacobi"):
        set_svd_impl(impl)
        jax.clear_caches()

        @jax.jit
        def f(m):
            u, s, vh, mask, total = _truncated_svd(m, chi, thr)
            s_kept = jnp.where(mask, s, 0.0)
            kept_norm = jnp.sqrt(jnp.sum(s_kept * s_kept, axis=-1))
            rec = jnp.einsum("...ik,...k,...kj->...ij", u, s_kept, vh)
            rec_err = jnp.linalg.norm(rec - m, axis=(-2, -1))
            return s, mask, total, kept_norm, rec_err

        s, mask, total, kept_norm, rec_err = (np.asarray(x) for x in f(m))
        print(f"--- impl={impl} ---", flush=True)
        for i in range(thetas.shape[0]):
            live = int(mask[i].sum())
            ref_top, ref_cut = ss_ref[i, 0], ss_ref[i, min(chi - 1, len(ss_ref[i]) - 1)]
            print(
                f"  el {i}: total={total[i]:.6f} kept={live} "
                f"kept_norm={kept_norm[i]:.6f} s[0]={s[i,0]:.6f} "
                f"(ref {ref_top:.6f}) s[min]={s[i].min():.2e} "
                f"nan={int(np.isnan(s[i]).sum())} rec_err={rec_err[i]:.3e}",
                flush=True,
            )


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0], *[int(a) for a in args[1:2]])
