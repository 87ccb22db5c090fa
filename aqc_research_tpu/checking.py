"""Lightweight argument-validation predicates.

TPU-native counterpart of the reference's validation layer
(``/root/reference/aqc_research/checking.py:25-236``).  Differences by design:

* JAX arrays are immutable, so the reference's aliasing / contiguity guards
  (``no_overlap``, ``np.may_share_memory``) are meaningless here and dropped.
* Predicates accept both ``numpy`` and ``jax.numpy`` arrays.
* These run OUTSIDE jit (on static python values / array shapes+dtypes);
  nothing here traces.
"""

from __future__ import annotations

from typing import Any

import numpy as np

_INT_TYPES = (int, np.int8, np.int16, np.int32, np.int64)
_FLOAT_TYPES = (float, np.float16, np.float32, np.float64)


def _is_array(obj: Any) -> bool:
    return hasattr(obj, "shape") and hasattr(obj, "dtype")


def _kind(obj: Any) -> str:
    return np.dtype(obj.dtype).kind  # 'i', 'f', 'c', ...


def is_int(val: Any, extra_cond: bool = True) -> bool:
    """True if ``val`` is an integer (and optionally an extra condition holds)."""
    return isinstance(val, _INT_TYPES) and bool(extra_cond)


def is_float(val: Any, extra_cond: bool = True) -> bool:
    """True if ``val`` is a float (and optionally an extra condition holds)."""
    return isinstance(val, _FLOAT_TYPES) and bool(extra_cond)


def is_bool(val: Any, extra_cond: bool = True) -> bool:
    return isinstance(val, (bool, np.bool_)) and bool(extra_cond)


def is_str(val: Any, extra_cond: bool = True) -> bool:
    return isinstance(val, str) and bool(extra_cond)


def is_dict(val: Any, extra_cond: bool = True) -> bool:
    return isinstance(val, dict) and bool(extra_cond)


def is_list(val: Any, extra_cond: bool = True) -> bool:
    return isinstance(val, list) and bool(extra_cond)


def is_tuple(val: Any, extra_cond: bool = True) -> bool:
    return isinstance(val, tuple) and bool(extra_cond)


def none_or_type(val: Any, cls: type) -> bool:
    return val is None or isinstance(val, cls)


def float_1d(arr: Any, extra_cond: bool = True) -> bool:
    """True for a 1D real floating array."""
    return (
        _is_array(arr) and arr.ndim == 1 and _kind(arr) == "f" and bool(extra_cond)
    )


def int_2d(arr: Any, extra_cond: bool = True) -> bool:
    return _is_array(arr) and arr.ndim == 2 and _kind(arr) == "i" and bool(extra_cond)


def complex_1d(arr: Any, extra_cond: bool = True) -> bool:
    return _is_array(arr) and arr.ndim == 1 and _kind(arr) == "c" and bool(extra_cond)


def complex_2d(arr: Any, extra_cond: bool = True) -> bool:
    return _is_array(arr) and arr.ndim == 2 and _kind(arr) == "c" and bool(extra_cond)


def complex_2d_square(arr: Any, extra_cond: bool = True) -> bool:
    return complex_2d(arr, extra_cond) and arr.shape[0] == arr.shape[1]


def complex_3d(arr: Any, extra_cond: bool = True) -> bool:
    return _is_array(arr) and arr.ndim == 3 and _kind(arr) == "c" and bool(extra_cond)


def complex_array(arr: Any, extra_cond: bool = True) -> bool:
    return _is_array(arr) and _kind(arr) == "c" and bool(extra_cond)


def complex_or_float_1d(arr: Any, extra_cond: bool = True) -> bool:
    return (
        _is_array(arr)
        and arr.ndim == 1
        and _kind(arr) in ("f", "c")
        and bool(extra_cond)
    )


def complex_or_float_2d(arr: Any, extra_cond: bool = True) -> bool:
    return (
        _is_array(arr)
        and arr.ndim == 2
        and _kind(arr) in ("f", "c")
        and bool(extra_cond)
    )


def block_structure(num_qubits: int, blocks: Any) -> bool:
    """True for a valid ``(2, depth)`` unit-block placement array.

    Mirrors the validity rule of the reference
    (``parametric_circuit.py:245-253``): integer dtype, control != target,
    all indices within ``[0, num_qubits)``.
    """
    return (
        _is_array(blocks)
        and _kind(blocks) == "i"
        and blocks.ndim == 2
        and blocks.shape[0] == 2
        and bool(np.all((0 <= np.asarray(blocks)) & (np.asarray(blocks) < num_qubits)))
        and bool(np.all(np.asarray(blocks)[0, :] != np.asarray(blocks)[1, :]))
    )


def is_complex(val: Any, extra_cond: bool = True) -> bool:
    """True for a complex scalar (checking.py:35)."""
    return isinstance(val, (complex, np.complex64, np.complex128)) and bool(extra_cond)


def float_2d(arr: Any, extra_cond: bool = True) -> bool:
    """True for a 2D real-float array (checking.py:70)."""
    return _is_array(arr) and arr.ndim == 2 and _kind(arr) == "f" and bool(extra_cond)


def int_1d(arr: Any, extra_cond: bool = True) -> bool:
    """True for a 1D integer array (checking.py:151)."""
    return _is_array(arr) and arr.ndim == 1 and _kind(arr) == "i" and bool(extra_cond)


def bool_1d(arr: Any, extra_cond: bool = True) -> bool:
    """True for a 1D boolean array (checking.py:171)."""
    return _is_array(arr) and arr.ndim == 1 and _kind(arr) == "b" and bool(extra_cond)


def check_sim_complex_vecs4(a, b, c, d) -> bool:
    """True when four complex vectors have identical size and dtype kind
    (checking.py:176-210; the reference also demanded memory contiguity,
    which is meaningless for immutable device arrays)."""
    vecs = (a, b, c, d)
    return all(complex_1d(v) for v in vecs) and all(
        v.shape == a.shape for v in vecs
    )


def check_permutation(arr: Any) -> bool:
    """True when the array is an index permutation of 0..n-1 (checking.py:213)."""
    if not (_is_array(arr) and arr.ndim == 1 and _kind(arr) == "i"):
        return False
    x = np.asarray(arr)
    return bool(np.array_equal(np.sort(x), np.arange(x.size)))


def no_overlap(a, b) -> bool:
    """True when two arrays do not share memory (checking.py:225).  Device
    arrays are immutable, so aliasing is harmless there — only NumPy pairs
    are actually checked."""
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        return not np.shares_memory(a, b)
    return True
