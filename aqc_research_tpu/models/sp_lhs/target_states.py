"""Computation, caching and loading of ASP target states.

TPU-native counterpart of the reference target-state pipeline
(``/root/reference/aqc_research/model_sp_lhs/trotter/target_states.py:30-546``):
for every time horizon two Trotter targets are produced — the ground-truth
``t1_gt`` (10x more steps, ``precise_multiplier``) and the reference ``t1``.
MPS targets are generated **incrementally**, reusing the previous horizon's
MPS (the reference's key trick for large n, target_states.py:175-205);
classic (dense) targets are evolved with the fused-block Trotter engine.
Caches are pickled per (n, options) with structural validation and automatic
recomputation on mismatch.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional, Union

import numpy as np

from ... import checking as chk
from ...ops import mps as mpsop
from ...targets import trotter as trotop
from ...utils import MyTimer, create_logger, to_host

_logger = create_logger(__file__)


def precise_multiplier() -> int:
    """Steps multiplier for the ground-truth Trotter circuit (reference
    target_states.py:30-36)."""
    return 10


class TargetMpsState:
    """Target |t1> in MPS form plus metadata (cf. target_states.py:44-132)."""

    def __init__(
        self,
        *,
        opts: Any,
        num_qubits: int,
        num_trot_steps: int,
        evol_time: float,
        my_id: int,
        t1_gt: mpsop.MPS,
        t1: mpsop.MPS,
        second_order: bool,
    ):
        assert chk.is_int(num_qubits, num_qubits >= 2)
        assert num_trot_steps in list(opts.trotter_steps)
        assert evol_time in list(opts.evol_times)
        assert isinstance(t1_gt, mpsop.MPS) and isinstance(t1, mpsop.MPS)

        self.num_qubits = int(num_qubits)
        self.num_trot_steps = int(num_trot_steps)
        self.precise_multiplier = precise_multiplier()
        self.trunc_thr = float(opts.trunc_thr_target)
        self.chi_max = int(opts.chi_max)
        self.delta = float(opts.delta)
        self.evol_time = float(evol_time)
        self.my_id = int(my_id)
        self.t1_gt = t1_gt
        self.t1 = t1
        self.second_order = bool(second_order)

    def __getstate__(self):
        state = self.__dict__.copy()
        # Pickle MPS as numpy (device arrays do pickle, but host arrays are
        # portable across backends).
        for key in ("t1_gt", "t1"):
            m = state[key]
            # to_host: complex device->host transfers fail on some TPU
            # runtimes (CLAUDE.md) — split into real/imag on device.
            state[key] = (to_host(m.gammas), np.asarray(m.lambdas))
        return state

    def __setstate__(self, state):
        import jax.numpy as jnp

        from ...utils import from_host

        for key in ("t1_gt", "t1"):
            g, l = state[key]
            # from_host, NOT jnp.asarray: an eager complex host->device
            # transfer produces a lazily-INVALID buffer on this TPU runtime
            # — it survives block_until_ready and only fails at the first
            # fetch (found when a cache HIT crashed check_mps on TPU; every
            # earlier on-chip run happened to be a cache miss).
            state[key] = mpsop.MPS(from_host(np.asarray(g)), jnp.asarray(l))
        self.__dict__.update(state)

    @staticmethod
    def check_cached_data(opts: Any, num_qubits: int, data: List[Any]) -> bool:
        """Structural validation of a cached list (target_states.py:91-132)."""
        if not chk.is_list(data):
            return False
        for i in range(min(len(data), len(opts.evol_times), len(opts.trotter_steps))):
            dat, t, s = data[i], opts.evol_times[i], opts.trotter_steps[i]
            if not (
                isinstance(dat, TargetMpsState)
                and dat.num_qubits == num_qubits
                and dat.num_trot_steps == s
                and dat.precise_multiplier == precise_multiplier()
                and np.isclose(dat.trunc_thr / opts.trunc_thr_target, 1)
                and getattr(dat, "chi_max", -1) == opts.chi_max
                and np.isclose(dat.delta / opts.delta, 1)
                and np.isclose(dat.evol_time / t, 1)
                and dat.my_id == i
                and mpsop.check_mps(dat.t1_gt)
                and mpsop.check_mps(dat.t1)
                and isinstance(dat.second_order, bool)
            ):
                return False
        return True


def generate_all_mps_targets(
    *, opts: Any, num_qubits: int, second_order: bool
) -> List[TargetMpsState]:
    """Incremental MPS target generation: each horizon's circuit is applied to
    the PREVIOUS horizon's MPS (cf. target_states.py:135-231)."""
    _logger.info("%s: generating targets ...", generate_all_mps_targets.__name__)

    def _ini_program():
        return opts.ini_state_func[0](num_qubits)

    trotter_steps = np.asarray(opts.trotter_steps)
    evol_times = np.asarray(opts.evol_times)
    assert evol_times.size == trotter_steps.size
    assert np.unique(np.diff(trotter_steps)).size <= 1, "trotter_steps must grow by a constant increment"
    assert np.allclose(np.diff(evol_times), evol_times[0]), "evol_times must form a uniform grid"

    thr = opts.trunc_thr_target
    chi = int(opts.chi_max)
    t1_gt = mpsop.mps_from_program(_ini_program(), num_qubits, chi_max=chi, trunc_thr=thr)
    t1 = mpsop.mps_from_program(_ini_program(), num_qubits, chi_max=chi, trunc_thr=thr)
    interval = float(evol_times[0])
    nsteps = int(trotter_steps[0])
    targets: List[TargetMpsState] = []

    for i in range(evol_times.size):
        timer = MyTimer()
        if i > 0:
            interval = float(evol_times[i] - evol_times[i - 1])
            nsteps = int(trotter_steps[i] - trotter_steps[i - 1])

        with timer("|t1_gt>"):
            trot = trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=interval,
                num_steps=nsteps * precise_multiplier(),
                delta=opts.delta,
                second_order=second_order,
            )
            t1_gt = trot.as_mps(t1_gt, trunc_thr=thr)  # fused blocks + scan

        with timer("|t1>"):
            trot = trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=interval,
                num_steps=nsteps,
                delta=opts.delta,
                second_order=second_order,
            )
            t1 = trot.as_mps(t1, trunc_thr=thr)

        targets.append(
            TargetMpsState(
                opts=opts,
                num_qubits=num_qubits,
                num_trot_steps=int(trotter_steps[i]),
                evol_time=float(evol_times[i]),
                my_id=i,
                t1_gt=t1_gt,
                t1=t1,
                second_order=second_order,
            )
        )
        fid = trotop.fidelity(targets[-1].t1_gt, targets[-1].t1)
        _logger.info(
            "t=%0.3f: fid(|t1>, |t1_gt>) = %0.6f  |  timings: %s",
            fid,
            evol_times[i],
            timer.rounded_metrics(3),
        )
    return targets


def get_target_mps_states(
    opts: Any, num_qubits: int, second_order: bool, input_file: Optional[str] = None
) -> List[TargetMpsState]:
    """Load-or-compute MPS targets with cache validation
    (cf. target_states.py:234-277)."""
    filename = os.path.join(opts.result_dir, f"target_mps_states_n{num_qubits}.pkl")
    if not (isinstance(input_file, str) and os.path.isfile(input_file)):
        input_file = filename
    if os.path.isfile(input_file):
        _logger.info("loading precomputed target MPS states from %s", input_file)
        with open(input_file, "rb") as fld:
            data = pickle.load(fld)
        if TargetMpsState.check_cached_data(opts, num_qubits, data):
            return data
        _logger.info("target cache is stale for these options — regenerating")

    data = generate_all_mps_targets(
        opts=opts, num_qubits=num_qubits, second_order=second_order
    )
    assert TargetMpsState.check_cached_data(opts, num_qubits, data)
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    with open(filename, "wb") as fld:
        pickle.dump(data, fld)
    return data


class TargetClassicState:
    """Target |t1> as a dense vector plus metadata (target_states.py:285-370)."""

    def __init__(
        self,
        *,
        opts: Any,
        num_qubits: int,
        num_trot_steps: int,
        evol_time: float,
        my_id: int,
        t1_gt: np.ndarray,
        t1: np.ndarray,
        second_order: bool,
    ):
        assert chk.is_int(num_qubits, num_qubits >= 2)
        assert num_trot_steps in list(opts.trotter_steps)
        assert evol_time in list(opts.evol_times)
        self.num_qubits = int(num_qubits)
        self.num_trot_steps = int(num_trot_steps)
        self.precise_multiplier = precise_multiplier()
        self.delta = float(opts.delta)
        self.evol_time = float(evol_time)
        self.my_id = int(my_id)
        self.t1_gt = to_host(t1_gt)
        self.t1 = to_host(t1)
        self.second_order = bool(second_order)

    @staticmethod
    def check_cached_data(opts: Any, num_qubits: int, data: List[Any]) -> bool:
        if not chk.is_list(data):
            return False
        for i in range(min(len(data), len(opts.evol_times), len(opts.trotter_steps))):
            dat, t, s = data[i], opts.evol_times[i], opts.trotter_steps[i]
            if not (
                isinstance(dat, TargetClassicState)
                and dat.num_qubits == num_qubits
                and dat.num_trot_steps == s
                and dat.precise_multiplier == precise_multiplier()
                and np.isclose(dat.delta / opts.delta, 1)
                and np.isclose(dat.evol_time / t, 1)
                and dat.my_id == i
                and isinstance(dat.t1_gt, np.ndarray)
                and isinstance(dat.t1, np.ndarray)
            ):
                return False
        return True


def generate_classic_target(
    *,
    opts: Any,
    num_qubits: int,
    num_trot_steps: int,
    evol_time: float,
    my_id: int,
    second_order: bool,
) -> TargetClassicState:
    """Dense targets from scratch per horizon (target_states.py:373-455) —
    using the fused-block on-device Trotter evolution."""
    def _ini_program():
        return opts.ini_state_func[0](num_qubits)

    timer = MyTimer()
    with timer("|t1_gt>"):
        t1_gt = to_host(
            trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=evol_time,
                num_steps=num_trot_steps * precise_multiplier(),
                delta=opts.delta,
                second_order=second_order,
            ).as_vector(_ini_program())
        )
    with timer("|t1>"):
        t1 = to_host(
            trotop.Trotter(
                num_qubits=num_qubits,
                evol_time=evol_time,
                num_steps=num_trot_steps,
                delta=opts.delta,
                second_order=second_order,
            ).as_vector(_ini_program())
        )
    fid = trotop.fidelity(t1_gt, t1)
    _logger.info(
        "t=%0.3f: fid(|t1>, |t1_gt>) = %0.6f  |  timings: %s",
        fid,
        evol_time,
        timer.rounded_metrics(3),
    )
    return TargetClassicState(
        opts=opts,
        num_qubits=num_qubits,
        num_trot_steps=num_trot_steps,
        evol_time=evol_time,
        my_id=my_id,
        t1_gt=t1_gt,
        t1=t1,
        second_order=second_order,
    )


def get_target_classic_states(
    opts: Any, num_qubits: int, second_order: bool, input_file: Optional[str] = None
) -> List[TargetClassicState]:
    """Load-or-compute dense targets with cache validation
    (target_states.py:458-512)."""
    filename = os.path.join(opts.result_dir, f"target_classic_states_n{num_qubits}.pkl")
    if not (isinstance(input_file, str) and os.path.isfile(input_file)):
        input_file = filename
    if os.path.isfile(input_file):
        _logger.info("loading precomputed target classic states from %s", input_file)
        with open(input_file, "rb") as fld:
            data = pickle.load(fld)
        if TargetClassicState.check_cached_data(opts, num_qubits, data):
            return data
        _logger.info("target cache is stale for these options — regenerating")

    data = [
        generate_classic_target(
            opts=opts,
            num_qubits=num_qubits,
            num_trot_steps=int(nts),
            evol_time=float(etm),
            my_id=my_id,
            second_order=second_order,
        )
        for my_id, (nts, etm) in enumerate(zip(opts.trotter_steps, opts.evol_times))
    ]
    assert TargetClassicState.check_cached_data(opts, num_qubits, data)
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    with open(filename, "wb") as fld:
        pickle.dump(data, fld)
    return data


def get_target_states(
    opts: Any,
) -> Union[List[TargetClassicState], List[TargetMpsState]]:
    """Dispatch on ``opts.use_mps`` (cf. target_states.py:520-545)."""
    if opts.use_mps:
        return get_target_mps_states(
            opts=opts,
            num_qubits=opts.num_qubits,
            second_order=opts.second_order_trotter,
            input_file=opts.targets_file,
        )
    return get_target_classic_states(
        opts=opts,
        num_qubits=opts.num_qubits,
        second_order=opts.second_order_trotter,
        input_file=opts.targets_file,
    )
