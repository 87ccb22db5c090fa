"""Global precision / platform policy for the TPU-native AQC framework.

Two precision modes:

* ``"high"``  — float64 / complex128.  Used by parity and gradient tests
  (reference parity target is <= 1e-10, see BASELINE.md).  On TPU f64 is
  emulated and slow; tests therefore force the CPU backend (tests/conftest.py).
* ``"fast"``  — float32 / complex64.  The production / benchmark mode on TPU:
  all hot kernels (statevector applies, MPS contractions + truncated SVD,
  co-sweep gradients) run in c64 so matmuls tile onto the MXU.

The mode is process-global (it decides the dtype of newly created arrays);
functions also accept explicit dtypes where that matters.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_PRECISION = os.environ.get("AQC_TPU_PRECISION", "high")

# In "high" mode x64 must be on (complex128 parity tests); in "fast" mode it
# must be OFF so Python scalar literals cannot promote intermediates to c128.
jax.config.update("jax_enable_x64", _PRECISION == "high")

# On TPU the default matmul precision truncates f32 operands to bf16 on the
# MXU; per-gate bf16 error compounds over deep circuits into O(0.1)
# infidelity errors.  Quantum simulation needs true-f32 contractions.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles (especially through a
# remote-compile tunnel) can take minutes per program; the cache amortizes
# them across processes/sessions.  Override with JAX_COMPILATION_CACHE_DIR.
_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass


def set_precision(mode: str) -> None:
    """Sets the global precision mode: ``"high"`` (f64/c128) or ``"fast"`` (f32/c64).

    "fast" also disables jax x64 so Python scalar literals (e.g. ``0.5j``)
    cannot promote intermediates to c128 — required on TPU generations
    without c128 support.  Call before tracing any jitted function.
    """
    global _PRECISION
    if mode not in ("high", "fast"):
        raise ValueError(f"unknown precision mode: {mode!r}")
    _PRECISION = mode
    jax.config.update("jax_enable_x64", mode == "high")


def precision() -> str:
    """Returns the current global precision mode."""
    return _PRECISION


def real_dtype():
    """Returns the real dtype of the current precision mode."""
    return jnp.float64 if _PRECISION == "high" else jnp.float32


def complex_dtype():
    """Returns the complex dtype of the current precision mode."""
    return jnp.complex128 if _PRECISION == "high" else jnp.complex64


def is_tpu() -> bool:
    """True when the default JAX backend is a TPU-like accelerator."""
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return False
    return platform not in ("cpu", "gpu")


_SVD_IMPLS = ("native", "gram", "embed", "jacobi", "blocked", "rand", "nullsvd")
_SVD_IMPL: str | None = os.environ.get("AQC_TPU_SVD_IMPL") or None


def set_svd_impl(impl: str | None) -> None:
    """Selects the MPS truncated-SVD implementation.

    * ``"native"`` — ``jnp.linalg.svd`` (LAPACK on CPU, QDWH-SVD on TPU).
      Most accurate; QDWH is slow on TPU (QR-iteration bound).
    * ``"gram"``   — native complex eigh of the Gram matrix + matmul factor
      recovery (ops/svd_tpu.svd_gram_top_k).  MXU-friendly; squared condition
      number only affects about-to-be-truncated directions.
    * ``"embed"``  — real-embedding eigh + masked complex MGS
      (ops/svd_tpu.svd_top_k).  Fallback for runtimes where complex
      decompositions genuinely fail; the sequential MGS makes it slow.
    * ``"jacobi"`` — batched one-sided Jacobi SVD as a Pallas TPU kernel
      (ops/pallas_jacobi.py; interpreter mode off-TPU).  f32 arithmetic
      regardless of precision mode; the only impl whose cost does NOT scale
      linearly with the batch, so half-layer pair updates and vmapped fleets
      amortize.
    * ``"blocked"`` — blocked one-sided Jacobi (ops/blocked_jacobi.py): the
      MXU-friendly prototype — panel Grams/updates are batched matmuls, the
      small subproblems ride the VPU lanes.  Falls back to "jacobi" for
      matrices below the blocking size (chi-growth heads).
    * ``"rand"``   — randomized-projection truncated SVD (ops/rand_svd.py):
      HMT range-finder on the MXU (matmuls + batched Householder QR —
      CholeskyQR measured NaN-prone on the graded spectra) + the SAME
      Pallas Jacobi kernel on the projected (k+16, 2chi) problem — 0.39x
      the VPU flops at the chi=64 pair shape, junk tail projected out
      before the kernel.  f32/c64 production path; matrices below
      rand_svd.RAND_MIN_N fall back to "jacobi".
    * ``None``     — auto: "rand" on TPU-like backends ("jacobi" engages
      automatically below rand_svd.RAND_MIN_N, i.e. 2chi < 128; the round-4
      on-chip A/B measured rand at 1.45x jacobi on the 20q chi=64 perturbed
      sweep and 1.45x/2.5x at 28q chi=128 init/perturbed, with the fused
      route convergence-validated in the 16q jitted L-BFGS), "native"
      elsewhere.  On TPU the rand route runs through the fused-rand
      megakernel at every eligible chi (see fused_rand_enabled) — the
      UNFUSED rand route has a known TPU-only mid-optimization failure at
      16q chi=64 (RESULTS.md round-4; CPU is unaffected).

    * ``"nullsvd"`` — MEASUREMENT-ONLY pass-through (no decomposition at
      all): times everything AROUND the SVD in a sweep
      (benchmarks/probe_sweep_budget.py).  States produced under it are
      NOT valid; never use outside timing probes.

    The choice is read at TRACE time — call ``jax.clear_caches()`` after
    switching if programs were already compiled.
    """
    if impl is not None and impl not in _SVD_IMPLS:
        raise ValueError(f"unknown svd impl: {impl!r} (use one of {_SVD_IMPLS})")
    global _SVD_IMPL
    _SVD_IMPL = impl


def svd_impl() -> str:
    """The MPS truncated-SVD implementation in effect (see set_svd_impl)."""
    if _SVD_IMPL is not None:
        return _SVD_IMPL
    return "rand" if is_tpu() else "native"


from contextlib import contextmanager as _contextmanager


@_contextmanager
def svd_impl_override(impl: str):
    """Scoped ``set_svd_impl``: forces ``impl`` inside the block, restores
    the previous policy on exit.  The policy is read at TRACE time, so a
    program that must be pinned to one implementation regardless of the
    ambient policy wraps its trace in this (and keys its program cache on
    the impl — see jit_asp._mps_horizon_program)."""
    global _SVD_IMPL
    if impl not in _SVD_IMPLS:
        raise ValueError(f"unknown svd impl: {impl!r} (use one of {_SVD_IMPLS})")
    previous = _SVD_IMPL
    _SVD_IMPL = impl
    try:
        yield
    finally:
        _SVD_IMPL = previous


def mps_watchdog_enabled() -> bool:
    """The MPS optimization watchdog (jit_asp): after an on-device horizon
    optimization under a fast SVD route, the returned iterate's objective is
    RE-EVALUATED under the reference decomposition and the run is flagged
    and re-optimized when the two disagree grossly — the runtime fence for
    the fobj=1.0 collapse class (margin-thinned SVD variants can corrupt
    the objective mid-optimization in ways point probes cannot see;
    RESULTS.md round-4 qrlite findings).  Costs one extra objective
    evaluation per horizon.  Disable with AQC_TPU_MPS_WATCHDOG=0."""
    return os.environ.get("AQC_TPU_MPS_WATCHDOG", "1") != "0"


_JACOBI_SWEEPS = int(os.environ.get("AQC_TPU_JACOBI_SWEEPS", "0")) or None


def set_jacobi_sweeps(sweeps: int | None) -> None:
    """Sweep count for the "jacobi" SVD impl (None = DEFAULT_SWEEPS).

    The kernel cost is LINEAR in sweeps; convergence is quadratic once
    columns are nearly orthogonal.  The MPS pair-update matrices have
    decaying spectra, which converge faster than the random-matrix worst
    case the default is validated on — lower values are legitimate there
    when gradient parity is re-validated (tests/test_jacobi_svd.py).
    Read at TRACE time; jax.clear_caches() after switching."""
    global _JACOBI_SWEEPS
    assert sweeps is None or sweeps >= 1
    _JACOBI_SWEEPS = sweeps


def jacobi_sweeps() -> int | None:
    return _JACOBI_SWEEPS


_SVD_CHUNK = int(os.environ.get("AQC_TPU_SVD_CHUNK", "0")) or None


def set_svd_chunk(chunk: int | None) -> None:
    """Cap the Pallas SVD kernels' VMEM batch chunk (None = VMEM-derived).

    The adaptive sweep while_loop is SHARED per chunk, so every matrix in a
    chunk pays the chunk's MAX sweep count.  Smaller chunks pay closer to
    the per-matrix counts (probe_chunk_schedule: unsorted chunk-2 recovers
    1.08x/1.17x of paid decomposition work at the 20q init/perturbed
    points) at the cost of per-grid-step overhead
    (probe_chunk_efficiency).  Read at TRACE time; jax.clear_caches()
    after switching mid-process."""
    global _SVD_CHUNK
    assert chunk is None or chunk >= 1
    _SVD_CHUNK = chunk


def svd_chunk() -> int | None:
    return _SVD_CHUNK


_JACOBI_CRITERION = os.environ.get("AQC_TPU_JACOBI_CRITERION", "entry")


def set_jacobi_criterion(criterion: str | None) -> None:
    """f32 adaptive-sweep convergence criterion for the Jacobi kernels:
    "entry" (round-3 default; fast, but a cut inside a high-condition
    degenerate cluster can keep contaminated small columns — see
    ops/jacobi_svd._phase_update) or "hybrid" (relative-grade orthogonality
    above the 32*eps kill floor; fixes the contamination caveat at the cost
    of extra sweeps where small KEPT columns converge slowly).  Read at
    TRACE time; jax.clear_caches() after switching."""
    global _JACOBI_CRITERION
    assert criterion in (None, "entry", "hybrid")
    _JACOBI_CRITERION = criterion or "entry"


def jacobi_criterion() -> str:
    return _JACOBI_CRITERION


_FUSED_PAIR: bool | None = {"1": True, "0": False}.get(
    os.environ.get("AQC_TPU_FUSED_PAIR", "")
)

# Measured on-chip A/B (bench_mps, entry criterion, 5-repeat averages):
# 20q chi=64 fused 30.90 vs plain 31.43 sweeps/s (a wash — the absorbed
# surrounding ops were already overlapped by XLA), 28q chi=128 fused 6.93
# vs plain 6.33 (+9.5% — the absorbed per-phase traffic scales with chi^2).
# Auto therefore routes by bond dimension.
_FUSED_PAIR_MIN_CHI = 96


def set_fused_pair(enabled: bool | None) -> None:
    """Enables the fused half-layer pair-update Pallas kernel
    (ops/fused_pair.py): theta build + adaptive Jacobi + truncation + factor
    recovery in ONE VMEM-resident program per half-layer phase, replacing the
    ~30 small XLA ops around each plain-kernel call.

    * ``True``  — use it whenever eligible (svd_impl "jacobi", c64 tensors,
      static trunc_thr, chi >= 8),
    * ``False`` — never,
    * ``None``  — auto: on TPU, use it for chi >= 96 where the on-chip A/B
      measured a win (+9.5% at chi=128; a wash at 64 — see above); off on
      CPU (env override AQC_TPU_FUSED_PAIR=1/0).

    The same override also gates the fused-rand route (see
    :func:`fused_rand_enabled`, whose AUTO policy differs: all chi >= 8).

    Read at TRACE time; jax.clear_caches() after switching."""
    global _FUSED_PAIR
    _FUSED_PAIR = enabled


def fused_pair_enabled(chi: int | None = None) -> bool:
    """Whether the fused pair kernel should run at this bond dimension."""
    if _FUSED_PAIR is not None:
        return _FUSED_PAIR
    return is_tpu() and chi is not None and chi >= _FUSED_PAIR_MIN_CHI


def fused_rand_enabled(chi: int | None = None) -> bool:
    """Whether the fused-rand megakernel should run at this bond dimension
    when ``svd_impl() == "rand"``.

    Unlike :func:`fused_pair_enabled` (jacobi impl: fused only pays at
    chi >= 96), the rand route uses the fused kernel at EVERY eligible chi
    on TPU: the round-4 on-chip A/B measured fused-rand >= unfused rand at
    both production shapes (20q chi=64: 33.1/33.2 vs 32.2/32.1 sweeps/s;
    28q chi=128: 10.2/10.1 vs 10.0/10.0), and — decisively — the unfused
    rand route has a known TPU-only mid-optimization failure (16q chi=64
    jitted L-BFGS lands fobj=1.0; the fused route lands in the jacobi band,
    RESULTS.md round-4).  The explicit set_fused_pair(True/False) override
    still wins; with fusion off on TPU the engine dispatcher falls back to
    the plain JACOBI kernel, not unfused rand — probes that study the
    broken route must also set AQC_TPU_ALLOW_UNFUSED_RAND=1."""
    if _FUSED_PAIR is not None:
        return _FUSED_PAIR
    return is_tpu() and chi is not None and chi >= 8


def set_eigh_svd(enabled: bool | None) -> None:
    """Back-compat alias: True -> "embed", False -> "native", None -> auto."""
    set_svd_impl(None if enabled is None else ("embed" if enabled else "native"))


def use_eigh_svd() -> bool:
    """Back-compat alias for svd_impl() == "embed"."""
    return svd_impl() == "embed"
