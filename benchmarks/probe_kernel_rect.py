"""Minimal repro hunt for the unfused-rand wrong-target bug: the REAL
Mosaic Jacobi kernel on rectangular (ell, n) working arrays, TPU vs the
interpret-mode reference on BITWISE-IDENTICAL inputs.

Context (results/r4/x0_disc.log): the unfused rand route builds a WRONG
Trotter target at (ell=80, thr=1e-8) on TPU — n-independent, correct on
CPU, correct at ell=72 (oversample 8) and through the fused route.  The
only TPU-compiled code unique to that configuration is `_jacobi_pallas_raw`
on (b, 80, 128) rectangles + `_sort_guard_top_k`.  This probe feeds the
kernel fixed host-generated f32 planes at both widths and several
spectrum classes (flat, graded, graded+junk tail, rank-deficient) and
prints the max row-norm and row-space deviation TPU-vs-interpret per
(shape, class).  A material deviation at ell=80 only = Mosaic wrong-code
at that shape; no deviation = the bug needs the evolution's data path
(mask/rescale interplay), not the kernel.

Run ON TPU (interpret reference is computed in-process via the kernel's
interpret flag).  Usage: probe_kernel_rect.py [b] (default 8).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import set_precision

set_precision("fast")

import jax
import jax.numpy as jnp

from aqc_research_tpu.ops import pallas_jacobi as pj


def _mats(rng, b, ell, n, kind):
    """Working-array planes (b, ell, n): row j = conj of column j of the
    reduced problem M = B^H — rows carry the singular structure."""
    if kind == "flat":
        re = rng.standard_normal((b, ell, n)).astype(np.float32)
        im = rng.standard_normal((b, ell, n)).astype(np.float32)
        return re, im
    # graded rows: row norms decay; junk/rank0 variants zero or poison tails
    u = np.linalg.qr(rng.standard_normal((b, n, n)))[0][:, :, :ell]
    if kind == "graded":
        s = np.exp(-0.15 * np.arange(ell))
    elif kind == "gradedjunk":
        s = np.exp(-0.15 * np.arange(ell))
        s[ell - 8 :] = 1e-7  # near-noise tail the guard should kill
    elif kind == "rankdef":
        s = np.exp(-0.1 * np.arange(ell))
        s[ell // 2 :] = 0.0
    else:
        raise ValueError(kind)
    phase = rng.standard_normal((b, ell)) + 1j * rng.standard_normal((b, ell))
    phase /= np.abs(phase)
    m = (u * s[None, None, :]).transpose(0, 2, 1) * phase[:, :, None]
    return (
        np.real(m).astype(np.float32),
        np.imag(m).astype(np.float32),
    )


def main(b=8):
    rng = np.random.default_rng(123)
    sweeps = 12
    for n in (128,):
        for ell in (80, 72, 144):
            for kind in ("flat", "graded", "gradedjunk", "rankdef"):
                re, im = _mats(rng, b, ell, n, kind)
                chunk = pj._pick_chunk(b, ell, rows=n)
                b_pad = -(-b // chunk) * chunk
                if b_pad != b:
                    pad = ((0, b_pad - b), (0, 0), (0, 0))
                    re, im = np.pad(re, pad), np.pad(im, pad)

                def run(interp):
                    f = jax.jit(
                        lambda a, c: pj._jacobi_pallas_raw(
                            a, c, sweeps, chunk, interpret=interp
                        )
                    )
                    w_re, w_im = f(jnp.asarray(re), jnp.asarray(im))
                    return (np.asarray(w_re) + 1j * np.asarray(w_im))[:b]

                w_tpu = run(False)
                w_ref = run(True)
                nrm_t = np.linalg.norm(w_tpu, axis=-1)
                nrm_r = np.linalg.norm(w_ref, axis=-1)
                dn = np.max(np.abs(nrm_t - nrm_r) / max(nrm_r.max(), 1e-9))
                # row-space deviation: project TPU rows onto ref row space
                dev = 0.0
                for i in range(b):
                    q, _ = np.linalg.qr(w_ref[i].conj().T)
                    resid = w_tpu[i] - (w_tpu[i] @ q.conj()) @ q.T
                    dev = max(
                        dev,
                        float(
                            np.linalg.norm(resid)
                            / max(np.linalg.norm(w_tpu[i]), 1e-9)
                        ),
                    )
                flag = "OK" if dn < 1e-3 and dev < 1e-3 else "** DEVIATES **"
                print(
                    f"ell={ell:4d} n={n} chunk={chunk} {kind:10s} "
                    f"row-norm dev {dn:.2e}  row-space resid {dev:.2e}  {flag}",
                    flush=True,
                )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:2]])
