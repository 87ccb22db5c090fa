"""Backend-diff replay for the unfused-rand TPU failure (round-4 hunt).

The 16q os=16 thr=1e-8 walk collapses (|state| -> 0) on TPU through the
UNFUSED rand route even under the cancellation-robust top-k mask
(results/r4/maskfix.log) — while the CPU-f32 walk and the fused route are
clean.  This probe takes the walk-captured divergent pair batch
(probe_rand_target_walk.py --dump=...) and recomputes the unfused rand
decomposition ON THE CURRENT BACKEND, dumping everything the keep/drop
decision consumes:

    s        (b, chi)   reduced-problem singular values
    total    (b,)       Frobenius norm of the full theta
    mask     (b, chi)   the production keep mask
    resid    (b,)       |u s vh - theta|_F / |theta|_F on kept directions
    vh_orth  (b,)       max |vh vh^H - I| over kept rows

Run once on TPU (AQC_TPU_ALLOW_UNFUSED_RAND=1) and once with --cpu, then
diff the two dumps with --compare A.npz B.npz: the first quantity that
differs beyond f32 spread localizes the wrong computation (factors vs
norms vs mask rule).

Usage:
  python benchmarks/probe_rand_tpu_replay.py thetas.npz --out=tpu.npz
  python benchmarks/probe_rand_tpu_replay.py thetas.npz --out=cpu.npz --cpu
  python benchmarks/probe_rand_tpu_replay.py --compare tpu.npz cpu.npz
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replay(npz_path: str, out_path: str, chi: int | None, trunc_thr: float):
    import jax
    import jax.numpy as jnp

    from aqc_research_tpu.config import is_tpu, set_precision, set_svd_impl

    set_precision("fast" if is_tpu() else "high")
    set_svd_impl("rand")
    os.environ.setdefault("AQC_TPU_ALLOW_UNFUSED_RAND", "1")

    from aqc_research_tpu.ops import mps as mpsop

    data = np.load(npz_path)
    # The walk dump stores complex thetas; ship real/imag planes and
    # combine INSIDE jit (complex buffers must be born inside jit here).
    th = np.asarray(data["thetas"])
    if chi is None:
        chi = th.shape[-1] // 2
    m_re = jnp.asarray(np.real(th), jnp.float32)
    m_im = jnp.asarray(np.imag(th), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def decomp(mr, mi, chi_):
        m = jax.lax.complex(mr, mi).astype(jnp.complex64)
        u, s, vh, mask, total = mpsop._truncated_svd(m, chi_, trunc_thr)
        um = u * jnp.where(mask, 1.0, 0.0)[..., None, :].astype(u.dtype)
        vm = vh * jnp.where(mask, 1.0, 0.0)[..., :, None].astype(vh.dtype)
        rec = jnp.einsum(
            "...ik,...k,...kj->...ij", um, s.astype(u.dtype), vm
        )
        resid = jnp.linalg.norm(rec - m, axis=(-2, -1)) / jnp.maximum(
            jnp.linalg.norm(m, axis=(-2, -1)), 1e-30
        )
        gram = jnp.einsum("...ik,...jk->...ij", vm, jnp.conj(vm))
        eye = jnp.eye(gram.shape[-1], dtype=gram.dtype)
        kept = jnp.sum(mask, axis=-1)
        orth = jnp.max(
            jnp.abs(gram - eye * jnp.where(mask, 1.0, 0.0)[..., None, :]),
            axis=(-2, -1),
        )
        return (
            s,
            total,
            mask.astype(jnp.int32),
            jnp.real(resid).astype(jnp.float32),
            jnp.real(orth).astype(jnp.float32),
            kept.astype(jnp.int32),
        )

    s, total, mask, resid, orth, kept = decomp(m_re, m_im, int(chi))
    out = {
        "s": np.asarray(s),
        "total": np.asarray(total),
        "mask": np.asarray(mask),
        "resid": np.asarray(resid),
        "orth": np.asarray(orth),
        "kept": np.asarray(kept),
    }
    np.savez(out_path, **out)
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "batch": int(th.shape[0]),
                "n": int(th.shape[-1]),
                "chi": int(chi),
                "kept_per_el": out["kept"].tolist(),
                "max_resid": float(out["resid"].max()),
                "max_orth": float(out["orth"].max()),
                "out": out_path,
            }
        ),
        flush=True,
    )


def compare(a_path: str, b_path: str):
    a, b = np.load(a_path), np.load(b_path)
    rep = {}
    rep["kept_a"] = a["kept"].tolist()
    rep["kept_b"] = b["kept"].tolist()
    rep["mask_flips_per_el"] = (a["mask"] != b["mask"]).sum(axis=-1).tolist()
    rel_s = np.abs(a["s"] - b["s"]) / np.maximum(np.abs(b["s"]), 1e-30)
    rep["max_rel_s"] = float(rel_s.max())
    rep["argmax_rel_s"] = [int(x) for x in np.unravel_index(rel_s.argmax(), rel_s.shape)]
    rel_t = np.abs(a["total"] - b["total"]) / np.maximum(np.abs(b["total"]), 1e-30)
    rep["max_rel_total"] = float(rel_t.max())
    rep["max_resid_a"] = float(a["resid"].max())
    rep["max_resid_b"] = float(b["resid"].max())
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--compare":
        compare(argv[1], argv[2])
        sys.exit(0)
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    out = "replay_out.npz"
    chi = None
    thr = 1e-8
    for a in list(argv):
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--chi="):
            chi = int(a.split("=", 1)[1])
            argv.remove(a)
        elif a.startswith("--thr="):
            thr = float(a.split("=", 1)[1])
            argv.remove(a)
    replay(argv[0], out, chi, thr)
