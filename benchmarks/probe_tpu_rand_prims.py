"""On-chip primitive discriminators for the TPU-only 16q unfused-rand q=1
failure (benchmarks/run_r4_diag16.sh).  CPU f32 reproduces NOTHING (the
jitloop converges), so the fault is in an on-chip primitive.  Two suspects:

  A. batched complex64 Householder QR (``jnp.linalg.qr``) — if TPU lowers
     its internal matmuls at default (bf16-truncating) precision despite the
     global highest flag (the Mosaic in-kernel dot has exactly this bug,
     CLAUDE.md), Q is only ~1e-2 orthonormal and the projected problem loses
     the subspace;
  B. the real Mosaic Jacobi kernel on the REDUCED rectangular problem
     (l=80 rows x 128 lanes at chi=64) fed a rank-deficient projection —
     CPU runs Pallas in interpret mode, so only the chip exercises this.

Prints ONE line per check; everything is fetched (fetch is the only
reliable failure surface on this runtime).  Run on TPU; --cpu for the
interpret-mode reference.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import set_precision

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast")

import jax
import jax.numpy as jnp

from aqc_research_tpu.utils import from_host


def _make_rank_deficient(rng, b, n, rank, graded=True):
    """Theta-like (b, n, n) c64: rank-r with a graded spectrum, embedded in
    an n-sized problem (the chi-growth transition shape: actual bond rank
    about to double into a padded 2chi frame)."""
    u, _ = np.linalg.qr(
        rng.standard_normal((b, n, rank)) + 1j * rng.standard_normal((b, n, rank))
    )
    v, _ = np.linalg.qr(
        rng.standard_normal((b, n, rank)) + 1j * rng.standard_normal((b, n, rank))
    )
    s = np.geomspace(1.0, 1e-4, rank) if graded else np.ones(rank)
    a = np.einsum("bij,j,bkj->bik", u, s, np.conj(v))
    return a.astype(np.complex64), s


def main():
    rng = np.random.default_rng(11)
    b, n, chi = 7, 128, 64

    # ---- A. batched complex QR orthonormality on this backend ----
    a_host, _ = _make_rank_deficient(rng, b, n, rank=80)
    y_host = a_host[:, :, :80]  # (b, 128, 80) tall
    y = from_host(y_host)

    @jax.jit
    def qr_resid(y):
        q = jnp.linalg.qr(y, mode="reduced")[0]
        eye = jnp.eye(q.shape[-1], dtype=q.dtype)
        qhq = jnp.einsum("...ji,...jk->...ik", jnp.conj(q), q)
        return jnp.max(jnp.abs(qhq - eye))

    r = float(np.asarray(qr_resid(y)))
    print(f"QR check: max |Q^H Q - I| = {r:.3e} "
          f"({'OK' if r < 1e-5 else 'BROKEN — bf16-grade QR'})", flush=True)

    # ---- B. rand_svd_top_k on rank-deficient vs full-rank inputs ----
    from aqc_research_tpu.ops.rand_svd import rand_svd_top_k

    for rank, tag in ((chi // 2, "rank-32 (growth head)"),
                      (chi, "rank-64"), (n, "full-rank")):
        a_host, _ = _make_rank_deficient(rng, b, n, rank=min(rank, n))
        a = from_host(a_host)

        @jax.jit
        def recon_err(a):
            u, s, vh = rand_svd_top_k(a, chi)
            approx = jnp.einsum("...ik,...k,...kj->...ij", u, s, vh)
            err = jnp.linalg.norm(approx - a, axis=(-2, -1))
            # Guarded-out directions come back as exact-zero rows; the
            # orthonormality contract is vh vh^H == diag(kept mask).
            kept = (s > 0).astype(a.dtype)
            target = kept[..., :, None] * jnp.eye(chi, dtype=a.dtype)
            return jnp.max(err / jnp.linalg.norm(a, axis=(-2, -1))), jnp.max(
                jnp.abs(
                    jnp.einsum("...ik,...jk->...ij", vh, jnp.conj(vh)) - target
                )
            )

        e, orth = (float(np.asarray(x)) for x in recon_err(a))
        # rank <= chi: recon err is pure f32 noise; rank = n: err is the
        # discarded tail (~s_{chi+1}/s_1 ~ 1e-2 of the graded spectrum).
        bound = 1e-4 if rank <= chi else 3e-2
        print(f"rand_svd {tag}: rel recon err {e:.3e} (bound {bound:g}), "
              f"vh orth resid {orth:.3e} "
              f"({'OK' if e < bound and orth < 1e-4 else 'BROKEN'})",
              flush=True)


if __name__ == "__main__":
    main()
