"""Compile-cache priming for production ASP horizon programs.

The chi=256 compile wall (RESULTS.md phase-3: 546 s for ONE horizon program
through the remote-compile tunnel) makes large configs operationally painful
when the persistent cache (``.jax_cache/``) is cold — e.g. after a VM reset.
This tool compiles the production programs ONCE, ahead of time and
backgroundable, so the actual run (driver, bench, experiment) starts from a
warm cache:

    python tools/warm_cache.py --num-qubits 28 --chi 256 --layers 8 9 10 \
        --maxiter 500 --fidelity-thr 0.998 &

Every program is compiled from ``jax.ShapeDtypeStruct`` specs only — no
device arrays are materialized, nothing executes, and the complex-buffer
birth rules (CLAUDE.md) are never in play.  The compiled binaries land in
the persistent JAX compilation cache keyed by program hash, exactly where
the production entry points (``jit_asp._mps_horizon_program`` /
``_mps_chunk_cache``) will look for them.

What gets primed per ``--layers`` entry (one distinct circuit each):

* the one-program MPS horizon runner (``use_jit_lbfgs`` path, no
  ``time_limit``), pinned to the ambient SVD impl;
* with ``--chunked``: the (init, chunk) pair of the time-limited runner;
* the watchdog's reference-route value program and recovery runner when the
  ambient impl is not the reference decomposition (they compile lazily at
  the first watchdog trip otherwise — mid-run, at the worst time).

The reference framework has no compile-cache concern (eager CUDA kernels);
this is TPU/XLA-specific operational tooling.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

# Runnable as `python tools/warm_cache.py` without installation.
_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _neel_bits(n: int) -> tuple:
    return tuple(int(k % 2 == 0) for k in range(n))


def warm_horizon_programs(
    num_qubits: int,
    chi: int,
    layers,
    *,
    trunc_thr: float = 1e-6,
    fidelity_thr: float | None = None,
    maxiter: int = 500,
    chunked: bool = False,
    no_improve_iters: int | None = None,
    log=print,
) -> dict:
    """Compiles every production horizon program for the given layer
    schedule from shape specs; returns {program_name: compile_seconds}."""
    import jax
    import jax.numpy as jnp

    from aqc_research_tpu import config
    from aqc_research_tpu.circuit.ansatz import TrotterAnsatz
    from aqc_research_tpu.circuit.structures import make_trotter_like_circuit
    from aqc_research_tpu.models.sp_lhs import jit_asp
    from aqc_research_tpu.ops.mps import MPS

    if config.is_tpu():
        config.set_precision("fast")
    cdtype = jnp.dtype(config.complex_dtype())
    rdtype = jnp.float32 if cdtype == jnp.complex64 else jnp.float64

    base_bits = _neel_bits(num_qubits)
    fobj_thr = None if fidelity_thr is None else 1.0 - float(fidelity_thr)
    impl = config.svd_impl()
    ref_impl = jit_asp._watchdog_reference_impl()
    tgt_spec = MPS(
        jax.ShapeDtypeStruct((num_qubits, 2, chi, chi), cdtype),
        jax.ShapeDtypeStruct((num_qubits - 1, chi), rdtype),
    )

    timings: dict = {}

    def _compile(name, program, *specs):
        tic = time.perf_counter()
        program.lower(*specs).compile()
        dt = time.perf_counter() - tic
        timings[name] = dt
        log(f"  {name}: compiled in {dt:.1f} s")
        return dt

    for num_layers in layers:
        circ = TrotterAnsatz.make(
            num_qubits, make_trotter_like_circuit(num_qubits, num_layers), True
        )
        x0_spec = jax.ShapeDtypeStruct((circ.num_thetas,), rdtype)
        tag = f"n{num_qubits}_chi{chi}_L{num_layers}"
        log(f"priming {tag} (impl={impl})")

        impls = [impl] if impl == ref_impl else [impl, ref_impl]
        for im in impls:
            suffix = "" if im == impl else f"_recovery[{im}]"
            program = jit_asp._mps_horizon_program(
                circ, base_bits, float(trunc_thr), fobj_thr, int(maxiter),
                no_improve_iters, im,
            )
            _compile(f"{tag}_horizon{suffix}", program, x0_spec, tgt_spec)
        if impl != ref_impl:
            check = jit_asp._mps_value_program(
                circ, base_bits, float(trunc_thr), ref_impl
            )
            _compile(f"{tag}_watchdog_value", check, x0_spec, tgt_spec)

        if chunked:
            init, chunk, _ = jit_asp._mps_chunk_cache(
                circ, base_bits, float(trunc_thr), fobj_thr, int(maxiter),
                no_improve_iters, impl,
            )
            st_spec = ()
            _compile(f"{tag}_chunk_init", init, x0_spec, st_spec, tgt_spec)
            carry_spec = jax.eval_shape(init, x0_spec, st_spec, tgt_spec)
            lim_spec = jax.ShapeDtypeStruct((), jnp.int32)
            _compile(
                f"{tag}_chunk_loop", chunk, carry_spec, lim_spec, tgt_spec
            )

    total = sum(timings.values())
    log(f"primed {len(timings)} programs in {total:.1f} s total")
    return timings


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--num-qubits", type=int, required=True)
    ap.add_argument("--chi", type=int, required=True)
    ap.add_argument(
        "--layers", type=int, nargs="+", required=True,
        help="layer counts of the horizon schedule (one program each)",
    )
    ap.add_argument("--trunc-thr", type=float, default=1e-6)
    ap.add_argument("--fidelity-thr", type=float, default=None)
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--no-improve-iters", type=int, default=None)
    ap.add_argument(
        "--chunked", action="store_true",
        help="also prime the time-limited (chunk-dispatched) runner pair",
    )
    ap.add_argument(
        "--cpu", action="store_true", help="prime the CPU backend instead"
    )
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    warm_horizon_programs(
        args.num_qubits,
        args.chi,
        args.layers,
        trunc_thr=args.trunc_thr,
        fidelity_thr=args.fidelity_thr,
        maxiter=args.maxiter,
        chunked=args.chunked,
        no_improve_iters=args.no_improve_iters,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
