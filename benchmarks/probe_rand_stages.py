"""Stage-split timing of the randomized-projection SVD route on TPU.

The rand-mode roofline (results/r4/rand_ab.log, `roofline 20q rand`) says
the reduced Jacobi kernel's VPU floor is ~9.5 ms of the measured 29.5 ms
obj+grad sweep at 20q chi=64 — i.e. ~2/3 of the sweep is NOT the kernel.
This probe times the route's stages as separate jitted programs on a
production-shaped batch so the next optimization target is measured, not
guessed:

  theta     — the pair-theta build (reference: what pass A fuses)
  sketch    — A @ Omega (one MXU matmul)
  qr1       — one batched Householder QR of the (n, l) sketch
  range     — the FULL _range_project (sketch + q=1 power + 3 QRs + project)
  kernel    — the reduced adaptive Jacobi on B^H (the VPU floor)
  recover   — sort/guard + u = A vh^H recovery
  full      — rand_svd_top_k end-to-end (sanity: ~= range+kernel+recover)
  plain     — jacobi_svd_pallas_top_k on the SAME matrices (the old route)

Timing discipline: first fetch before the timed region; looped dispatch
(repeats) with one final fetch per stage.  Synthetic graded(0.15) spectra
at the production shapes (realistic adaptive counts are re-measured per
stage by the kernel itself; for REAL-matrix counts see probe_sweep_counts).

Usage: probe_rand_stages.py [b n chi] [--cpu]   (defaults 10 128 64)
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

set_precision("fast")

import jax
import jax.numpy as jnp

from aqc_research_tpu.ops import rand_svd
from aqc_research_tpu.ops.pallas_jacobi import (
    _jacobi_pallas_raw,
    _pick_chunk,
    _sort_guard_top_k,
    jacobi_svd_pallas_top_k,
)
from aqc_research_tpu.ops.rand_svd import _orth, _range_project, rand_svd_top_k
from aqc_research_tpu.utils import from_host


def _graded(rng, b, n, rate=0.15):
    u, _ = np.linalg.qr(rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n)))
    s = np.exp(-rate * np.arange(n))
    a = np.einsum("bij,j,bkj->bik", u, s, np.conj(v))
    return a.astype(np.complex64)


def _flush(out):
    # Complex leaves cannot be fetched directly on this backend: reduce to a
    # real scalar (eager abs+sum on a valid device buffer) and fetch that.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jnp.sum(jnp.abs(leaf))))


def timeit(name, fn, *args, repeats=20):
    _flush(fn(*args))  # warm + first fetch
    tic = time.perf_counter()
    for _i in range(repeats):
        out = fn(*args)
    _flush(out)
    dt = (time.perf_counter() - tic) / repeats * 1e3
    print(f"{name:8s} {dt:8.2f} ms", flush=True)
    return dt


def main(b=10, n=128, chi=64):
    rng = np.random.default_rng(3)
    a = from_host(_graded(rng, b, n))
    ell = rand_svd.rand_ell(n, chi)
    # complex buffers must be BORN inside jit or arrive via from_host on
    # this backend (CLAUDE.md) — never eager astype(complex64).
    omega = from_host(
        np.random.default_rng(7).standard_normal((b, n, ell)).astype(np.complex64)
    )

    sketch = jax.jit(lambda a, o: jnp.einsum("...ij,...jk->...ik", a, o))
    qr1 = jax.jit(lambda y: _orth(y))
    rng_proj = jax.jit(lambda a: _range_project(a, ell, 1))
    full = jax.jit(lambda a: rand_svd_top_k(a, chi))
    plain = jax.jit(lambda a: jacobi_svd_pallas_top_k(a, chi))

    chunk = _pick_chunk(b, ell, rows=n)
    b_pad = -(-b // chunk) * chunk

    @jax.jit
    def kernel(bm):
        m_re = jnp.real(bm).astype(jnp.float32)
        m_im = -jnp.imag(bm).astype(jnp.float32)
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            m_re, m_im = jnp.pad(m_re, pad), jnp.pad(m_im, pad)
        w_re, w_im = _jacobi_pallas_raw(m_re, m_im, 12, chunk)
        return w_re[:b], w_im[:b]

    @jax.jit
    def recover(a, w_re, w_im):
        w, s, inv = _sort_guard_top_k(w_re, w_im, chi, jnp.complex64)
        vh = jnp.conj(w) * inv[..., :, None].astype(jnp.complex64)
        u = jnp.einsum("...ij,...kj->...ik", a, jnp.conj(vh))
        return u * inv[..., None, :].astype(jnp.complex64), s, vh

    print(f"rand stage split: b={b} n={n} chi={chi} ell={ell} chunk={chunk} "
          f"backend={jax.default_backend()}", flush=True)
    t_sketch = timeit("sketch", sketch, a, omega)
    y0 = sketch(a, omega)
    t_qr1 = timeit("qr1", qr1, y0)
    t_range = timeit("range", rng_proj, a)
    bm = rng_proj(a)
    t_kernel = timeit("kernel", kernel, bm)
    w_re, w_im = kernel(bm)
    t_rec = timeit("recover", recover, a, w_re, w_im)
    t_full = timeit("full", full, a)
    t_plain = timeit("plain", plain, a)
    print(
        f"sum(range+kernel+recover)={t_range + t_kernel + t_rec:.2f} ms vs "
        f"full={t_full:.2f} ms | plain={t_plain:.2f} ms | "
        f"range w/o sketch+1QR={t_range - t_sketch - t_qr1:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:4]]
    main(*args)
