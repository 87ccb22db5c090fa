"""Minimal compile repro for the fused Pallas kernels on the CURRENT
tunnel toolchain.

After the Aug-19 terminal restart, Mosaic rejects the fused kernels with
    Invalid relayout: Non-singleton logical dimension is replicated in
    destination but not in source for 'vector<1x64xf32>'
while the plain pallas_jacobi kernel still compiles.  This probe compiles
each kernel in isolation at a given chi so the failing program (and any
future toolchain regression) is identified in seconds instead of inside a
full sweep.

Usage: python benchmarks/probe_fused_compile.py [chi] [which]
       which in {all, pair, rand, jacobi, rect}
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(chi=64, which="all"):
    import jax
    import jax.numpy as jnp

    from aqc_research_tpu.config import is_tpu, set_precision

    set_precision("fast" if is_tpu() else "high")
    b = 4
    n = 2 * chi
    rng = np.random.default_rng(0)

    def planes(*shape):
        return (
            jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32),
        )

    g1p, g2p = planes(b, 2, chi, chi), planes(b, 2, chi, chi)
    gp = planes(b, 4, 4)
    lam = jnp.asarray(np.abs(rng.standard_normal((3, b, chi))) + 0.1, jnp.float32)
    mp = planes(b, n, n)

    def run(name, fn, *args):
        tic = time.perf_counter()
        try:
            out = jax.jit(fn)(*args)
            val = float(np.asarray(out))
            print(
                f"{name}: OK value={val:.6g} "
                f"compile+run {time.perf_counter() - tic:.1f}s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).split("\n")
            key = next(
                (l for l in msg if "relayout" in l.lower() or "Mosaic" in l), msg[0]
            )
            print(f"{name}: FAIL ({type(e).__name__}) {key.strip()[:200]}", flush=True)
            for l in msg:
                if "at location" in l:
                    print(f"  {l.strip()[:700]}", flush=True)

    if which in ("all", "pair"):
        from aqc_research_tpu.ops.fused_pair import fused_pair_update

        def f_pair(lam, g1r, g1i, g2r, g2i, gr, gi):
            g1 = jax.lax.complex(g1r, g1i).astype(jnp.complex64)
            g2 = jax.lax.complex(g2r, g2i).astype(jnp.complex64)
            g4 = jax.lax.complex(gr, gi).astype(jnp.complex64)
            ng1, ng2, nl = fused_pair_update(
                lam[0], lam[1], lam[2], g1, g2, g4, chi, 1e-6,
                jnp.complex64, jnp.float32, 12,
            )
            return jnp.sum(nl)

        run("fused_pair", f_pair, lam, *g1p, *g2p, *gp)

    if which in ("all", "rand"):
        from aqc_research_tpu.ops.fused_rand import fused_rand_pair_update

        def f_rand(lam, g1r, g1i, g2r, g2i, gr, gi):
            g1 = jax.lax.complex(g1r, g1i).astype(jnp.complex64)
            g2 = jax.lax.complex(g2r, g2i).astype(jnp.complex64)
            g4 = jax.lax.complex(gr, gi).astype(jnp.complex64)
            ng1, ng2, nl = fused_rand_pair_update(
                lam[0], lam[1], lam[2], g1, g2, g4, chi, 1e-6,
                jnp.complex64, jnp.float32, 12,
            )
            return jnp.sum(nl)

        run("fused_rand", f_rand, lam, *g1p, *g2p, *gp)

    if which in ("all", "jacobi"):
        from aqc_research_tpu.ops.pallas_jacobi import jacobi_svd_pallas_top_k

        def f_jac(mr, mi):
            m = jax.lax.complex(mr, mi).astype(jnp.complex64)
            u, s, vh = jacobi_svd_pallas_top_k(m, chi, 12)
            return jnp.sum(s)

        run("pallas_jacobi", f_jac, *mp)

    if which in ("all", "rect"):
        from aqc_research_tpu.ops.rand_svd import rand_svd_top_k

        def f_rect(mr, mi):
            m = jax.lax.complex(mr, mi).astype(jnp.complex64)
            u, s, vh = rand_svd_top_k(m, chi, 12)
            return jnp.sum(s)

        run("rand_unfused(rect kernel)", f_rect, *mp)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    chi = int(argv[0]) if argv else 64
    which = argv[1] if len(argv) > 1 else "all"
    main(chi, which)
