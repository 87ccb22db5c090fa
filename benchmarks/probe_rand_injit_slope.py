"""IN-JIT slope timing of the rand-route stages (dispatch-sync-free).

probe_rand_stages times each stage as a separate dispatch, where the
~2.4-3 ms tunnel sync floor dominates small stages — it cannot rank
sub-millisecond stages.  This probe wraps each stage in a ``lax.scan``
loop INSIDE one jitted program and times the program at two iteration
counts: the per-iteration cost is the SLOPE (t_hi - t_lo) / (K_hi - K_lo),
so dispatch, fetch, and any fixed per-program overhead cancel exactly.

A scalar carry is folded into the stage input each iteration
(``a * (1 + 1e-6 c)``) so XLA cannot hoist the stage out of the loop; the
perturbation is microscopic, so adaptive sweep counts match the unlooped
stage on the same spectra.

Stages (production 20q chi=64 shapes by default: b=10, n=128, ell=72):

  theta    pass A — the fused theta-build Pallas kernel on real planes
  sketch   A @ Omega (one MXU matmul)
  qr1      one batched Householder QR of the (n, l) sketch
  middle   the full _range_project (sketch + q=1 power + QRs + project)
  tail     pass C — the reduced adaptive Jacobi + truncation Pallas kernel
  recover  u = A vh^H diag(1/s) (one MXU matmul + scalings)
  plain    the full-size adaptive Jacobi kernel on the same matrices
           (what the rand route replaced, for the same-session ratio)

Synthetic graded(0.15) spectra (the realistic decaying class used by the
round-3/4 probes); for REAL-matrix adaptive counts see probe_sweep_counts.

Usage: probe_rand_injit_slope.py [b n chi] [--cpu] [--klo=5] [--khi=55]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aqc_research_tpu.config import is_tpu, set_precision  # noqa: E402

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

set_precision("fast")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aqc_research_tpu.ops import rand_svd  # noqa: E402
from aqc_research_tpu.ops.fused_rand import _rand_tail_raw  # noqa: E402
from aqc_research_tpu.ops.pallas_jacobi import (  # noqa: E402
    _jacobi_pallas_raw,
    _pick_chunk,
)
from aqc_research_tpu.ops.rand_svd import _orth, _range_project  # noqa: E402
from aqc_research_tpu.utils import from_host  # noqa: E402


def _graded(rng, b, n, rate=0.15):
    u, _ = np.linalg.qr(
        rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
    )
    v, _ = np.linalg.qr(
        rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
    )
    s = np.exp(-rate * np.arange(n))
    a = np.einsum("bij,j,bkj->bik", u, s, np.conj(v))
    return a.astype(np.complex64)


def slope_time(name, stage, inputs, k_lo, k_hi, reduce_out):
    """Per-iteration ms of ``stage(inputs, c)`` via two-point slope timing.

    ``stage`` maps (inputs, scalar carry) -> output pytree; ``reduce_out``
    maps that output to an f32 scalar (the next carry), keeping a data
    dependence between iterations so nothing hoists.
    """

    def looped(k):
        @jax.jit
        def run(inputs):
            def body(c, _):
                out = stage(inputs, c)
                return reduce_out(out) * jnp.float32(1e-20), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return run

    run_lo, run_hi = looped(k_lo), looped(k_hi)
    # Warm both programs + first fetch (post-fetch sync regime, CLAUDE.md).
    float(np.asarray(run_lo(inputs)))
    float(np.asarray(run_hi(inputs)))
    reps = 3
    t_lo = t_hi = np.inf
    for _ in range(reps):
        tic = time.perf_counter()
        float(np.asarray(run_lo(inputs)))
        t_lo = min(t_lo, time.perf_counter() - tic)
        tic = time.perf_counter()
        float(np.asarray(run_hi(inputs)))
        t_hi = min(t_hi, time.perf_counter() - tic)
    per_ms = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    print(json.dumps({"stage": name, "ms_per_iter": round(per_ms, 4)}), flush=True)
    return per_ms


def main(b=10, n=128, chi=64, k_lo=5, k_hi=55):
    rng = np.random.default_rng(3)
    a_host = _graded(rng, b, n)
    a = from_host(a_host)
    ell = rand_svd.rand_ell(n, chi)
    omega = from_host(
        np.random.default_rng(7).standard_normal((b, n, ell)).astype(np.complex64)
    )

    def scaled(x, c):
        return x * (1.0 + 1e-6 * c).astype(x.dtype)

    abs_sum = lambda z: jnp.sum(jnp.abs(z)).astype(jnp.float32)  # noqa: E731

    print(
        f"rand in-jit slope split: b={b} n={n} chi={chi} ell={ell} "
        f"k=({k_lo},{k_hi}) backend={jax.default_backend()}",
        flush=True,
    )

    results = {}
    results["sketch"] = slope_time(
        "sketch",
        lambda inp, c: jnp.einsum("...ij,...jk->...ik", scaled(inp[0], c), inp[1]),
        (a, omega),
        k_lo,
        k_hi,
        abs_sum,
    )
    y0 = jax.jit(lambda a, o: jnp.einsum("...ij,...jk->...ik", a, o))(a, omega)
    results["qr1"] = slope_time(
        "qr1",
        lambda inp, c: _orth(scaled(inp, c)),
        y0,
        k_lo,
        k_hi,
        abs_sum,
    )
    results["middle"] = slope_time(
        "middle(_range_project)",
        lambda inp, c: _range_project(scaled(inp, c), ell, 1),
        a,
        k_lo,
        k_hi,
        abs_sum,
    )

    bm = jax.jit(lambda a: _range_project(a, ell, 1))(a)
    chunk = max(
        int(os.environ.get("AQC_TPU_RAND_TAIL_CHUNK", "2")),
        _pick_chunk(b, ell, rows=n),
    )
    b_pad = -(-b // chunk) * chunk
    thr2 = jnp.full((1, 1), 1e-12, jnp.float32)

    def tail_stage(inp, c):
        m_re = jnp.real(inp).astype(jnp.float32) * (1.0 + 1e-6 * c)
        m_im = -jnp.imag(inp).astype(jnp.float32)
        tot2 = jnp.sum(m_re * m_re + m_im * m_im, axis=(-2, -1))[:, None]
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            m_re, m_im = jnp.pad(m_re, pad), jnp.pad(m_im, pad)
            tot2 = jnp.pad(tot2, ((0, b_pad - b), (0, 0)), constant_values=1.0)
        return _rand_tail_raw(thr2, tot2, m_re, m_im, chi, ell, 12, chunk)

    results["tail"] = slope_time(
        "tail(passC kernel)",
        tail_stage,
        bm,
        k_lo,
        k_hi,
        lambda out: jnp.sum(jnp.abs(out[0])) + jnp.sum(out[2]),
    )

    vh_re, vh_im, _lam, inv = jax.jit(
        lambda bm: tail_stage(bm, jnp.float32(0.0))
    )(bm)

    def recover_stage(inp, c):
        a_, vh_re_, vh_im_, inv_ = inp
        vh = jax.lax.complex(vh_re_, vh_im_).astype(jnp.complex64)
        u = jnp.einsum("...ij,...kj->...ik", scaled(a_, c), jnp.conj(vh))
        return u * inv_[:, 0][..., None, :].astype(jnp.complex64)

    results["recover"] = slope_time(
        "recover(u matmul)",
        recover_stage,
        (a, vh_re[:b], vh_im[:b], inv[:b]),
        k_lo,
        k_hi,
        abs_sum,
    )

    chunk_p = _pick_chunk(b, n)
    bp_pad = -(-b // chunk_p) * chunk_p

    def plain_stage(inp, c):
        m_re = jnp.real(inp).astype(jnp.float32) * (1.0 + 1e-6 * c)
        m_im = jnp.imag(inp).astype(jnp.float32)
        if bp_pad != b:
            pad = ((0, bp_pad - b), (0, 0), (0, 0))
            m_re, m_im = jnp.pad(m_re, pad), jnp.pad(m_im, pad)
        return _jacobi_pallas_raw(m_re, m_im, 12, chunk_p)

    results["plain"] = slope_time(
        "plain(full-size kernel)",
        plain_stage,
        a,
        k_lo,
        k_hi,
        lambda out: jnp.sum(jnp.abs(out[0])),
    )

    rand_total = results["middle"] + results["tail"] + results["recover"]
    print(
        json.dumps(
            {
                "summary": f"b={b} n={n} chi={chi}",
                "rand_total_ms": round(rand_total, 4),
                "plain_ms": round(results["plain"], 4),
                "middle_share": round(results["middle"] / rand_total, 3),
                "tail_share": round(results["tail"] / rand_total, 3),
                "recover_share": round(results["recover"] / rand_total, 3),
                "qr1_ms": round(results["qr1"], 4),
                "sketch_ms": round(results["sketch"], 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    kw = {}
    for a in list(argv):
        if a.startswith("--klo="):
            kw["k_lo"] = int(a.split("=")[1])
            argv.remove(a)
        elif a.startswith("--khi="):
            kw["k_hi"] = int(a.split("=")[1])
            argv.remove(a)
    main(*[int(x) for x in argv[:3]], **kw)
