"""Collective-cost model of the sharded MPS engines — the checkable formula
behind the multi-chip scaling claims.

The chain-sharded engine (parallel/mps_chain.py) moves only O(χ²) halos and
ring-pipeline environments; everything else is device-local SVD/contraction
work.  Its compiled collective census is therefore AFFINE in the device
count P for a fixed circuit:

    ppermutes(P)  = a + b·P          bytes(P) = A + B·P

* the ``b·P`` term: each ring pipeline (``chain_dot`` and the L/R environment
  pipelines of the gradient co-sweep) hands a (χ_w, χ_z) boundary environment
  around the full ring — P ``ppermute`` rounds per pipeline;
* the ``a`` term: per-half-layer halo exchanges of ``chain_apply_pairs`` /
  ``_pair_n4_local`` (1 ppermute for even parity, 4 for odd: the left
  neighbour's λ plus the straddling (Γ₀, λ₀) round-trip) — a count fixed by
  the circuit's layer structure, independent of P.

:func:`fit_chain_model` measures (a, b, A, B) from the ACTUAL compiled HLO of
the production sharded objective+gradient program at two device counts and
:func:`validate_chain_model` checks the affine prediction against a held-out
third count — turning the scaling story into a falsifiable census, not a
hand count.  The driver dry run (``__graft_entry__.dryrun_multichip``)
runs exactly this fit+holdout on the virtual CPU mesh.

:func:`predicted_sweep_time` then states the wall-clock model

    T(P) = T₁ · s(P) / P  +  ppermutes(P) · t_hop  +  bytes(P) / bw_ici

where T₁ is the measured single-chip sweep time, s(P) ≥ 1 is the SVD batch
efficiency loss (each device decomposes ~1/P of each half-layer's pairs, but
the batched Jacobi kernel's while_loop runs to the slowest matrix in the
local batch — s(P) → 1 when per-matrix sweep counts are homogeneous), and
(t_hop, bw_ici) are per-hop ICI latency and per-link bandwidth.  Defaults
are v4-class ICI numbers (~1 µs hop, ~45 GB/s per link direction); both are
explicit parameters, not buried constants.  On this one-chip tunnel the
formula is a stated prediction pinned by the census — real-ICI calibration
of (t_hop, bw_ici) replaces the defaults when hardware is available.

Reference has no distributed engine to compare against (its MPS is the
single-process Aer C++ simulator, mps_operations.py:251-257); the model
covers the NEW scaling axis this framework adds.
"""

from __future__ import annotations

import collections
import dataclasses
import re
from typing import Dict, Sequence

import numpy as np

_DTYPE_BYTES = {
    "pred": 1,
    "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_OP_RE = re.compile(r"^\s*(?:ROOT )?%?[\w.-]+ = (\S+?) ([\w-]+)\(", re.M)
_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO result shape string like ``c64[16,16]{1,0}``."""
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    elems = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
    return elems * _DTYPE_BYTES.get(dt, 4)


def census_hlo(hlo_text: str) -> Dict[str, int]:
    """Counts every HLO op in a compiled module text (op name -> count)."""
    return collections.Counter(m.group(2) for m in _OP_RE.finditer(hlo_text))


def collective_census(hlo_text: str) -> Dict[str, int]:
    """Collective op counts plus total moved payload bytes.

    Returns ``{op: count, ..., "bytes": total}`` over the cross-device
    collectives (collective-permute / all-gather / all-reduce / all-to-all,
    including async *-start forms; *-done completions are not double-counted).
    """
    out: Dict[str, int] = collections.Counter()
    total_bytes = 0
    for m in _OP_RE.finditer(hlo_text):
        shape, op = m.group(1), m.group(2)
        base = op[:-6] if op.endswith("-start") else op
        if base in (
            "collective-permute", "all-gather", "all-reduce", "all-to-all",
            "reduce-scatter",
        ):
            out[base] += 1
            total_bytes += _shape_bytes(shape)
    out["bytes"] = total_bytes
    return dict(out)


@dataclasses.dataclass(frozen=True)
class ChainCollectiveModel:
    """Affine census model of the chain-sharded obj+grad program.

    ``ppermutes(P) = a + b*P``; ``bytes(P) = A + B*P`` (payload bytes).
    ``psums`` is the P-independent scalar-reduction count.
    """

    a: float
    b: float
    bytes_a: float
    bytes_b: float
    psums: int

    def ppermutes(self, ndev: int) -> float:
        return self.a + self.b * ndev

    def bytes_moved(self, ndev: int) -> float:
        return self.bytes_a + self.bytes_b * ndev


def _compile_chain_objgrad_hlo(circ, thetas, lvec, phi, ndev: int, devices) -> str:
    """Compiled HLO text of the FULL sharded obj+grad sweep on an
    ``ndev``-device sub-mesh (states sharded on entry)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from .mps_chain import chain_asp_objective_and_gradient, chain_from_mps

    mesh = Mesh(np.asarray(devices[:ndev]), ("sp",))
    lvec_c = chain_from_mps(lvec, mesh)
    phi_c = chain_from_mps(phi, mesh)

    def objgrad(th):
        return chain_asp_objective_and_gradient(
            circ, th, lvec_c, phi_c, mesh
        )

    return jax.jit(objgrad).lower(jnp.asarray(thetas)).compile().as_text()


def fit_chain_model(
    circ, thetas, lvec, phi, device_counts: Sequence[int] = (2, 4),
    *, devices=None,
) -> ChainCollectiveModel:
    """Fits the affine census model from the compiled HLO at two device
    counts (exact 2-point solve; the affine form is the claim
    :func:`validate_chain_model` checks at a third count)."""
    import jax

    devices = list(jax.devices()) if devices is None else list(devices)
    p1, p2 = sorted(int(p) for p in device_counts)
    assert p1 < p2, device_counts
    c1 = collective_census(
        _compile_chain_objgrad_hlo(circ, thetas, lvec, phi, p1, devices)
    )
    c2 = collective_census(
        _compile_chain_objgrad_hlo(circ, thetas, lvec, phi, p2, devices)
    )
    n1, n2 = c1.get("collective-permute", 0), c2.get("collective-permute", 0)
    b = (n2 - n1) / (p2 - p1)
    a = n1 - b * p1
    bb = (c2["bytes"] - c1["bytes"]) / (p2 - p1)
    ba = c1["bytes"] - bb * p1
    return ChainCollectiveModel(
        a=a, b=b, bytes_a=ba, bytes_b=bb,
        psums=c1.get("all-reduce", 0),
    )


def validate_chain_model(
    model: ChainCollectiveModel, circ, thetas, lvec, phi, ndev: int,
    *, devices=None, rel_tol: float = 0.05,
) -> Dict[str, float]:
    """Checks the fitted model against the ACTUAL census at a held-out
    device count.  Returns the comparison; raises on miss."""
    import jax

    devices = list(jax.devices()) if devices is None else list(devices)
    actual = collective_census(
        _compile_chain_objgrad_hlo(circ, thetas, lvec, phi, ndev, devices)
    )
    pred = model.ppermutes(ndev)
    got = actual.get("collective-permute", 0)
    pred_bytes = model.bytes_moved(ndev)
    got_bytes = actual["bytes"]
    ok_n = abs(pred - got) <= max(2, rel_tol * got)
    ok_b = abs(pred_bytes - got_bytes) <= max(1024, rel_tol * got_bytes)
    result = {
        "ndev": ndev,
        "ppermute_pred": pred, "ppermute_actual": got,
        "bytes_pred": pred_bytes, "bytes_actual": got_bytes,
        "all_reduce_actual": actual.get("all-reduce", 0),
    }
    if not (ok_n and ok_b):
        raise AssertionError(f"collective model miss: {result}")
    return result


def predicted_sweep_time(
    model: ChainCollectiveModel,
    ndev: int,
    single_chip_sweep_s: float,
    *,
    hop_latency_s: float = 1e-6,
    ici_bytes_per_s: float = 45e9,
    svd_batch_efficiency: float = 1.0,
) -> float:
    """The stated wall-clock formula:

    ``T(P) = T₁·s(P)/P + ppermutes(P)·t_hop + bytes(P)/bw``.

    ``svd_batch_efficiency`` = s(P) ≥ 1 models the batched-Jacobi straggler
    loss (local while_loop runs to the slowest matrix in the local batch).
    """
    compute = single_chip_sweep_s * svd_batch_efficiency / ndev
    comm = (
        model.ppermutes(ndev) * hop_latency_s
        + model.bytes_moved(ndev) / ici_bytes_per_s
    )
    return compute + comm


def predicted_speedup(
    model: ChainCollectiveModel,
    ndev: int,
    single_chip_sweep_s: float,
    **kw,
) -> float:
    """``T₁ / T(P)`` under :func:`predicted_sweep_time`."""
    return single_chip_sweep_s / predicted_sweep_time(
        model, ndev, single_chip_sweep_s, **kw
    )
