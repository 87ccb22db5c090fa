"""Roofline / MFU accounting for the MPS engine (VERDICT r2 item 1).

BASELINE config 3/5 frames the MPS sweep target as "speed-of-light"; this
module makes that claim checkable by accounting for the work the engine
actually executes and anchoring %-of-peak against MEASURED attainable rates
of this chip/toolchain (not datasheet numbers):

* :func:`decomposition_census` — the static plan of batched truncated-SVD
  phases one production objective+gradient sweep executes (V† layer-cache
  sweep + z-free layered gradient + forward value sweep), derived from the
  same group structure the engines compile (ops/mps.py, ops/mps_gradient.py).
* :func:`sweep_flops` — the FLOP model: the Pallas one-sided Jacobi kernel
  executes ~18·n² VPU flops per Brent-Luk phase per matrix (counted from the
  kernel body: 4 pair-Gram reductions ~16·p·n plus 4 rotated planes ~20·p·n,
  p = n/2), times (n-1) phases per sweep, times the ADAPTIVE sweep count;
  plus ~64·chi³ MXU flops per decomposition for the theta build and the
  ``vh = diag(1/s)·u^H·m`` recovery (8·chi³ complex MACs).
* :func:`measure_attainable` — microbenchmarks of the attainable VPU f32
  rate, MXU complex-matmul rate (at the global highest-precision policy),
  and HBM stream bandwidth on the CURRENT backend — the roofline
  denominators.
* ``python -m aqc_research_tpu.ops.roofline [n] [chi] [layers]`` — measures
  a real sweep, captures the adaptive sweep counts on its REAL pair
  matrices (io_callback), and prints the roofline table (RESULTS.md).

The reference has no performance accounting at all (SURVEY.md §6: "The
reference publishes no benchmark numbers"); the workload modeled here is
the one its Aer C++ engine serves (mps_operations.py:251-257).
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np


# ------------------------------------------------------------------ census


def _chessboard_groups(circ) -> List[List[int]]:
    """Per-layer disjoint pair groups (lists of lo sites), mirroring
    ops/mps_gradient._layered_plan."""
    from .mps_gradient import _layered_plan

    return [[lo for _, lo in g] for g in _layered_plan(circ)]


def decomposition_census(circ, chi: int, grow: bool = True):
    """Every truncated-SVD phase of ONE production obj+grad sweep plus one
    forward value sweep, keyed by stage: lists of ``(batch, matrix_n)``.

    Stages (layered Trotter CX path — the production configuration):
      vdag  — ``v_dagger_mul_mps_layers``: trailing half-layer group, then
              per layer the two chessboard groups in reverse order; the z
              side is always at full chi (matrix_n = 2 chi).
      grad  — z-free layered gradient: per layer both groups applied to the
              w side only, plus the trailing half-layer w update.  With
              ``grow`` (χ-growth scheduling) the head phases run at
              matrix_n = 2·χ_p, χ_p = min(chi, 2^p).
      value — forward ``v_mul_mps_growing``: per layer both groups +
              trailing half, same χ-growth head.
    """
    groups = _chessboard_groups(circ)
    sizes = [len(g) for g in groups]
    layers = circ.num_blocks // circ.bpl
    half = [sizes[0]] if circ.half_layer_num_blocks else []

    vdag = [(b, 2 * chi) for b in half + list(reversed(sizes)) * layers]

    def growing(batches):
        out, chi_w = [], 1
        for b in batches:
            chi_w = min(chi, 2 * chi_w) if grow else chi
            out.append((b, 2 * chi_w))
        return out

    fwd = sizes * layers + half
    return {"vdag": vdag, "grad": growing(fwd), "value": growing(fwd)}


# ------------------------------------------------------------------ flops


def jacobi_kernel_flops(n: int, sweeps: float, batch: int) -> float:
    """VPU flops the Pallas kernel executes: ~18 n^2 per phase per matrix
    (see module docstring), (n-1) phases per sweep."""
    return 18.0 * n * n * (n - 1) * float(sweeps) * batch


def pair_update_matmul_flops(chi: int, batch: int) -> float:
    """MXU flops per batched pair update outside the kernel: theta build
    (~4 chi^3 complex MACs) + vh recovery (~4 chi^3 complex MACs), at
    8 flops per complex MAC."""
    return 64.0 * chi**3 * batch


def _rand_active(n: int, impl: str) -> bool:
    if impl != "rand":
        return False
    from .rand_svd import RAND_MIN_N

    return n >= RAND_MIN_N


def kernel_flops_for(n: int, sweeps: float, batch: int, impl: str) -> float:
    """VPU kernel flops per batched decomposition under ``impl``: the plain
    kernel orthogonalizes n columns of length n ((n-1) phases); the rand
    impl runs the SAME kernel on the projected (l, n) problem — l columns
    of length n, (l-1) phases (ops/rand_svd.py)."""
    if not _rand_active(n, impl):
        return jacobi_kernel_flops(n, sweeps, batch)
    from .rand_svd import rand_ell

    ell = rand_ell(n, n // 2)
    return 18.0 * ell * n * (ell - 1) * float(sweeps) * batch


def matmul_flops_for(n: int, batch: int, impl: str) -> float:
    """MXU flops per batched pair update under ``impl``.  The rand impl
    swaps the vh recovery for a u recovery of the same cost and ADDS the
    range-finder: sketch + 1 power iteration (3 matmuls ~ 8 n^2 l each) and
    3 Householder QRs (~16 n l^2 each, complex)."""
    chi = n // 2
    if not _rand_active(n, impl):
        return pair_update_matmul_flops(chi, batch)
    from .rand_svd import rand_ell

    ell = rand_ell(n, chi)
    return (64.0 * chi**3 + 24.0 * n * n * ell + 48.0 * n * ell * ell) * batch


def sweep_flops(census, sweeps_by_stage, impl: str = "jacobi"):
    """(vpu_flops, mxu_flops) of one obj+grad sweep + one value sweep given
    per-stage mean adaptive sweep counts ``sweeps_by_stage[stage]``."""
    vpu = mxu = 0.0
    for stage, phases in census.items():
        s = float(sweeps_by_stage[stage])
        for b, n in phases:
            vpu += kernel_flops_for(n, s, b, impl)
            mxu += matmul_flops_for(n, b, impl)
    return vpu, mxu


def state_bytes(num_qubits: int, chi: int, itemsize: int = 8) -> float:
    """Resident MPS state bytes (gammas + lambdas, c64/f32)."""
    return num_qubits * 2 * chi * chi * itemsize + (num_qubits - 1) * chi * (
        itemsize // 2
    )


def sweep_hbm_bytes(census, itemsize: int = 8):
    """Bytes moved through HBM per sweep, assuming each phase reads and
    writes its pair slices + the theta matrix once (generous)."""
    return sum(
        b * 4 * n * n * itemsize
        for phases in census.values()
        for b, n in phases
    )


# ------------------------------------------------------- attainable rates


def measure_attainable(repeats: int = 20) -> Dict[str, float]:
    """Measured attainable rates of the CURRENT backend — the roofline
    denominators.  Returns {vpu_gflops, mxu_gflops, hbm_gbps}."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # Work per call is cranked up so on-chip time dwarfs the per-dispatch
    # tunnel cost (remote backends pay ~2-30 ms per dispatch; without this
    # the microbench measures the TUNNEL, not the chip — the round-2
    # measurement trap).  Timing loops dispatch `repeats` calls and block
    # ONCE (the bench_mps discipline).
    def timed(fn, arg, work):
        out = fn(arg)
        _ = float(np.asarray(out).ravel()[0])  # fetch (execution proof)
        tic = time.perf_counter()
        for _ in range(repeats):
            out = fn(arg)
        out.block_until_ready()
        dt = (time.perf_counter() - tic) / repeats
        return work / dt

    # VPU: fused multiply-add chain over a 4 MB f32 block, 4000 iterations
    # (~3 ms on-chip at a few TFLOP/s).
    x0 = jnp.asarray(rng.random((1024, 8, 128)), jnp.float32)
    iters = 4000

    @jax.jit
    def vpu(x):
        def body(_, x):
            return 0.999 * x + 0.001

        return jax.lax.fori_loop(0, iters, body, x)

    vpu_rate = timed(vpu, x0, 2.0 * x0.size * iters)

    # MXU: chained complex matmuls at the global matmul-precision policy.
    nm = 1024
    m = rng.standard_normal((nm, nm)) + 1j * rng.standard_normal((nm, nm))
    from ..utils import from_host

    mj = from_host((m / np.sqrt(nm)).astype(np.complex64))
    mm_iters = 200

    @jax.jit
    def mxu(x):
        def body(_, x):
            return jnp.matmul(x, x)

        return jnp.abs(jax.lax.fori_loop(0, mm_iters, body, x)[0, 0])

    mxu_rate = timed(mxu, mj, 8.0 * nm**3 * mm_iters)

    # HBM: stream triad over 256 MB (read + write), 20 passes per call.
    big = jnp.asarray(rng.random(64 * 1024 * 1024), jnp.float32)

    @jax.jit
    def hbm(x):
        def body(_, x):
            return x * 1.0001 + 1.0

        return jax.lax.fori_loop(0, 20, body, x)

    hbm_rate = timed(hbm, big, 20 * 2.0 * big.size * 4)

    return {
        "vpu_gflops": vpu_rate / 1e9,
        "mxu_gflops": mxu_rate / 1e9,
        "hbm_gbps": hbm_rate / 1e9,
    }


# ------------------------------------------------------------------ report


def roofline_report(
    num_qubits: int,
    chi: int,
    layers: int,
    measured_sweep_s: float,
    sweeps_by_stage: Dict[str, float],
    attainable: Dict[str, float],
    census,
    impl: str = "jacobi",
) -> str:
    """Markdown roofline table for one (obj+grad [+ value]) sweep."""
    vpu_f = mxu_f = 0.0
    lines = [
        f"### Roofline: {num_qubits}q chi={chi}, {layers}-layer Trotter "
        f"ansatz (svd impl: {impl})",
        "",
        "Decomposition phases per obj+grad sweep, as (batch, matrix_n) — "
        "the grad/value heads run at growing χ (χ-growth scheduling):",
        "",
    ]
    for stage, phases in census.items():
        lines.append(f"* {stage}: {phases}")
    lines += [
        "",
        "| stage | phases | matrices | mean adaptive sweeps | kernel VPU GFLOP | matmul MXU GFLOP |",
        "|---|---|---|---|---|---|",
    ]
    for stage, phases in census.items():
        s = float(sweeps_by_stage[stage])
        v = sum(kernel_flops_for(n, s, b, impl) for b, n in phases)
        x = sum(matmul_flops_for(n, b, impl) for b, n in phases)
        vpu_f += v
        mxu_f += x
        lines.append(
            f"| {stage} | {len(phases)} | {sum(b for b, _ in phases)} "
            f"| {s:.1f} | {v / 1e9:.2f} | {x / 1e9:.2f} |"
        )

    # The measured sweep covers the obj+grad stages (vdag + grad); the
    # value stage (linesearch trials) is accounted separately.
    og = {k: v for k, v in census.items() if k in ("vdag", "grad")}
    vpu_og, mxu_og = sweep_flops(og, sweeps_by_stage, impl)
    t_vpu = vpu_og / (attainable["vpu_gflops"] * 1e9)
    t_mxu = mxu_og / (attainable["mxu_gflops"] * 1e9)
    hbm_bytes = sweep_hbm_bytes(og)
    t_hbm = hbm_bytes / (attainable["hbm_gbps"] * 1e9)
    bound = t_vpu + t_mxu  # kernel and matmuls do not overlap in this design
    ach_vpu = vpu_og / measured_sweep_s / 1e9
    lines += [
        "",
        f"Measured sweep: {measured_sweep_s * 1e3:.2f} ms "
        f"({1.0 / measured_sweep_s:.2f} sweeps/s).",
        f"Attainable (measured on this chip/toolchain): VPU "
        f"{attainable['vpu_gflops']:.0f} GFLOP/s f32, MXU "
        f"{attainable['mxu_gflops']:.0f} GFLOP/s c64 (highest precision), "
        f"HBM {attainable['hbm_gbps']:.0f} GB/s.",
        f"Executed work per obj+grad sweep: kernel {vpu_og / 1e9:.2f} GFLOP "
        f"(VPU), matmuls {mxu_og / 1e9:.2f} GFLOP (MXU), "
        f"~{hbm_bytes / 1e6:.1f} MB HBM traffic "
        f"(state {state_bytes(num_qubits, chi) / 1e6:.2f} MB).",
        f"Roofline floors: VPU-bound {t_vpu * 1e3:.2f} ms + MXU-bound "
        f"{t_mxu * 1e3:.2f} ms = {bound * 1e3:.2f} ms "
        f"({1.0 / bound:.1f} sweeps/s ceiling); HBM floor {t_hbm * 1e3:.3f} ms "
        f"(NOT bandwidth-bound).",
        f"Achieved kernel throughput: {ach_vpu:.0f} GFLOP/s = "
        f"{100 * ach_vpu / attainable['vpu_gflops']:.0f}% of attainable VPU "
        f"({100 * bound / measured_sweep_s:.0f}% of the composite roofline).",
        "",
        "The decomposition is a ONE-SIDED JACOBI — an iterative "
        "orthogonalization whose per-phase work is elementwise/reduction "
        "(VPU), not matmul (MXU).  The honest speed-of-light for this "
        "algorithm on this chip is the VPU line above; an MXU-native "
        "decomposition would need a different algorithm (see "
        "benchmarks/probe_decomp_primitives.py for the measured per-"
        "primitive landscape).",
    ]
    return "\n".join(lines)


# ------------------------------------------------------------------ CLI


def _capture_sweep_counts(circ, thetas, target, bits, trunc_thr):
    """Mean/max adaptive Jacobi sweep counts per stage, measured on the REAL
    pair matrices of one production obj+grad sweep (io_callback capture; a
    hair's-width trunc_thr shift forces fresh traces so the patch applies)."""
    import jax
    import jax.numpy as jnp

    from . import mps as mpsmod
    from .jacobi_svd import jacobi_sweeps_used
    from .mps_gradient import fast_dot_gradient_with_state

    captured = []
    orig = mpsmod._truncated_svd

    def capturing(m, chi_, thr_):
        jax.experimental.io_callback(
            lambda x: captured.append(np.asarray(x)), None, m, ordered=True
        )
        return orig(m, chi_, thr_)

    thr = trunc_thr * (1 + 1e-9)
    chi = target.chi
    lvec = mpsmod.mps_basis_state(bits, chi, target.gammas.dtype)
    stages = {}
    mpsmod._truncated_svd = capturing
    try:
        vh, zc = mpsmod.v_dagger_mul_mps_layers(circ, thetas, target, trunc_thr=thr)
        jax.block_until_ready(vh)
        stages["vdag"] = list(captured)
        captured.clear()
        grad, _ = fast_dot_gradient_with_state(
            circ, thetas, lvec, vh, zc, trunc_thr=thr, grow_w=True
        )
        jax.block_until_ready(grad)
        stages["grad"] = list(captured)
        captured.clear()
        val = mpsmod.v_mul_mps_growing(
            circ, thetas, bits, chi, trunc_thr=thr, dtype=target.gammas.dtype
        )
        jax.block_until_ready(val.gammas)
        stages["value"] = list(captured)
        captured.clear()
    finally:
        mpsmod._truncated_svd = orig

    out = {}
    for stage, mats in stages.items():
        counts = []
        for m in mats:
            mb = m.reshape((-1,) + m.shape[-2:])
            ks = np.asarray(jax.vmap(jacobi_sweeps_used)(jnp.asarray(mb)))
            counts.extend(ks.tolist())
        out[stage] = {
            "mean": float(np.mean(counts)),
            "max": int(np.max(counts)),
            "phases": [tuple(m.reshape((-1,) + m.shape[-2:]).shape[:1]) + (m.shape[-1],) for m in mats],
        }
    return out


def main(num_qubits=20, chi=64, layers=4):
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..circuit.ansatz import TrotterAnsatz
    from ..circuit.structures import make_trotter_like_circuit
    from ..config import is_tpu, set_precision
    from ..targets import trotter as trotop
    from . import mps as mpsop
    from .mps_gradient import fast_dot_gradient_with_state

    set_precision("fast" if is_tpu() else "high")
    trunc_thr = 1e-6
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    thetas = jnp.asarray(
        trotop.init_ansatz_to_trotter(
            circ, np.zeros(circ.num_thetas), evol_time=1.2, delta=1.0
        )
    )
    rng = np.random.default_rng(5)
    thetas = thetas + 0.05 * jnp.asarray(
        rng.standard_normal(circ.num_thetas), thetas.dtype
    )
    ini = trotop.neel_init_state(num_qubits)
    target = trotop.Trotter(
        num_qubits=num_qubits, evol_time=1.2, num_steps=3, delta=1.0,
        second_order=True,
    ).as_mps(ini, trunc_thr=trunc_thr, chi_max=chi)
    bits = tuple(1 if q % 2 == 0 else 0 for q in range(num_qubits))
    lvec = mpsop.mps_basis_state(bits, chi, target.gammas.dtype)

    @jax.jit
    def sweep(th, tgt, lv):
        vh, zc = mpsop.v_dagger_mul_mps_layers(circ, th, tgt, trunc_thr=trunc_thr)
        g, _ = fast_dot_gradient_with_state(
            circ, th, lv, vh, zc, trunc_thr=trunc_thr, grow_w=True
        )
        return jnp.linalg.norm(jnp.real(g)).reshape(1)

    out = sweep(thetas, target, lvec)
    val = float(np.asarray(out)[0])
    assert np.isfinite(val) and val > 0, val
    repeats = 10
    tic = _time.perf_counter()
    for _ in range(repeats):
        out = sweep(thetas, target, lvec)
    out.block_until_ready()
    measured = (_time.perf_counter() - tic) / repeats
    print(f"measured obj+grad sweep: {measured * 1e3:.2f} ms "
          f"({1 / measured:.2f} sweeps/s), grad_norm {val:.6f}", flush=True)

    if is_tpu():
        # io_callback compiles ABORT the axon tunnel backend (and a failed
        # attempt poisons the process) — use env-provided or CPU-measured
        # defaults instead (capture on the CPU backend; see RESULTS.md
        # roofline table).  Defaults are the entry-criterion means at the
        # 0.05-perturbed point this CLI measures (vdag ~6.5, grad/value
        # ~4.5; perfect init pays ~3.7/2.9, hard points ~7.4/5.6).  The
        # shared kernel while_loop pays each chunk's MAX, so mean-count
        # floors understate executed (not required) work.
        import os

        stats = {
            "vdag": {"mean": float(os.environ.get("AQC_SWEEPS_VDAG", 6.5))},
            "grad": {"mean": float(os.environ.get("AQC_SWEEPS_GRAD", 4.5))},
            "value": {"mean": float(os.environ.get("AQC_SWEEPS_VALUE", 4.5))},
        }
        print(f"  (TPU backend: using measured-on-CPU sweep counts {stats})",
              flush=True)
    else:
        print("capturing adaptive sweep counts on real matrices ...", flush=True)
        stats = _capture_sweep_counts(circ, thetas, target, bits, trunc_thr)
        for stage, st in stats.items():
            print(f"  {stage}: mean {st['mean']:.2f}, max {st['max']}, "
                  f"phases {st['phases']}", flush=True)

    print("measuring attainable rates ...", flush=True)
    att = measure_attainable()
    print(f"  {att}", flush=True)

    census = decomposition_census(circ, chi, grow=True)
    sweeps_by_stage = {k: stats[k]["mean"] for k in census}
    print()
    from ..config import svd_impl

    print(
        roofline_report(
            num_qubits, chi, layers, measured, sweeps_by_stage, att, census,
            impl=svd_impl(),
        )
    )


# Attainable rates measured on the production chip (RESULTS.md round 3,
# on-chip microbenchmarks amortizing the tunnel dispatch).  Used by
# :func:`predict` when no live chip is available.
PINNED_ATTAINABLE = {"vpu_gflops": 1163.0, "mxu_gflops": 39500.0, "hbm_gbps": 562.0}


def predict(
    num_qubits: int,
    chi: int,
    layers: int = 4,
    *,
    impl: str = "jacobi",
    sweeps_by_stage: Dict[str, float] | None = None,
    attainable: Dict[str, float] | None = None,
    ndev: int = 1,
) -> str:
    """Model-only roofline PREDICTION at a shape (no chip required): the
    scale-wall extension of the measured report (VERDICT r3 item 9).

    Uses the same census/FLOP model as the measured report with pinned
    attainable rates and stage sweep counts defaulting to the round-3
    perturbed-point captures (vdag 10, grad 6.5, value 2.5 — real-matrix
    means; pass ``sweeps_by_stage`` to override).  ``ndev`` reports the
    chain-sharded per-device state memory (parallel/mps_chain.py) next to
    the single-chip footprint — the memory wall the sharding removes."""
    from ..circuit.ansatz import TrotterAnsatz
    from ..circuit.structures import make_trotter_like_circuit

    att = dict(PINNED_ATTAINABLE, **(attainable or {}))
    sbs = sweeps_by_stage or {"vdag": 10.0, "grad": 6.5, "value": 2.5}
    circ = TrotterAnsatz.make(
        num_qubits, make_trotter_like_circuit(num_qubits, layers), True
    )
    census = decomposition_census(circ, chi)
    og = {k: v for k, v in census.items() if k in ("vdag", "grad")}
    vpu_og, mxu_og = sweep_flops(og, sbs, impl)
    t_vpu = vpu_og / (att["vpu_gflops"] * 1e9)
    t_mxu = mxu_og / (att["mxu_gflops"] * 1e9)
    bound = t_vpu + t_mxu
    hbm_bytes = sweep_hbm_bytes(og)
    t_hbm = hbm_bytes / (att["hbm_gbps"] * 1e9)
    st = state_bytes(num_qubits, chi)
    # Working set of one decomposition phase: theta batch + factors + the
    # kernel's seat planes (~6x theta in f32 planes).
    worst_phase = max(
        (b * (2 * (n**2)) * 8 * 4 for b, n in sum(og.values(), [])),
        default=0.0,
    )
    lines = [
        f"### Roofline PREDICTION: {num_qubits}q chi={chi}, {layers}-layer "
        f"Trotter (impl {impl}; pinned attainable rates, assumed sweeps "
        f"{sbs})",
        f"Executed work per obj+grad sweep (model): kernel "
        f"{vpu_og / 1e9:.1f} GFLOP (VPU) + matmuls {mxu_og / 1e9:.1f} GFLOP "
        f"(MXU); HBM traffic ~{hbm_bytes / 1e6:.0f} MB.",
        f"Ceilings: VPU {t_vpu * 1e3:.1f} ms + MXU {t_mxu * 1e3:.1f} ms = "
        f"{bound * 1e3:.1f} ms -> {1.0 / bound:.2f} sweeps/s; HBM floor "
        f"{t_hbm * 1e3:.2f} ms.",
        f"Memory: state (2 copies w/z + grads ~4x) "
        f"{4 * st / 1e6:.0f} MB single chip; worst phase working set "
        f"~{worst_phase / 1e6:.0f} MB; chain-sharded per-device state "
        f"(~1/{ndev}) {4 * st / ndev / 1e6:.0f} MB."
        if ndev > 1
        else f"Memory: state (w/z + grad copies ~4x) {4 * st / 1e6:.0f} MB "
        f"single chip; worst phase working set ~{worst_phase / 1e6:.0f} MB.",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    if "--predict" in sys.argv:
        args = [int(a) for a in sys.argv[1:] if a.isdigit()]
        print(predict(*args[:3]))
    else:
        main(*[int(a) for a in sys.argv[1:4]])
