"""ctypes bindings of the native C++ MPS kernels (native/mps_kernels.cpp).

Builds the shared library on first use (g++, no external dependencies) and
exposes:

* :func:`svd_c128` — complex SVD via one-sided Jacobi,
* :func:`mps_pair_update` — the Vidal two-qubit pair update (contraction +
  gate + truncated SVD + re-split), mirroring ``ops/mps.py::apply_2q_mps``.

These are the native twins of the accelerator MPS path — used as an
independent parity oracle and as a host-side fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_library() -> str:
    src = os.path.join(_repo_root(), "native", "mps_kernels.cpp")
    out_dir = os.path.join(_repo_root(), "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, "libaqcmps.so")
    if (
        os.path.isfile(so_path)
        and os.path.getmtime(so_path) >= os.path.getmtime(src)
    ):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", so_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_library())
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.aqc_svd_c128.restype = ctypes.c_int
        lib.aqc_svd_c128.argtypes = [ctypes.c_int, ctypes.c_int, dptr, dptr, dptr, dptr]
        lib.aqc_mps_pair_update.restype = ctypes.c_int
        lib.aqc_mps_pair_update.argtypes = [ctypes.c_int, ctypes.c_double] + [dptr] * 9
        _LIB = lib
    return _LIB


def _as_c128(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.complex128))


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def svd_c128(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``a = U @ diag(s) @ Vh`` for an (m, n) complex matrix, m >= n."""
    a = _as_c128(a)
    m, n = a.shape
    u = np.zeros((m, n), np.complex128)
    s = np.zeros(n, np.float64)
    vh = np.zeros((n, n), np.complex128)
    ret = _lib().aqc_svd_c128(m, n, _ptr(a), _ptr(u), _ptr(s), _ptr(vh))
    if ret < 0:
        raise RuntimeError("native SVD failed")
    return u, s, vh


def mps_pair_update(
    lam_l: np.ndarray,
    lam_c: np.ndarray,
    lam_r: np.ndarray,
    g1: np.ndarray,
    g2: np.ndarray,
    gate4: np.ndarray,
    trunc_thr: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native Vidal pair update; returns (new_g1, new_g2, new_lam)."""
    chi = int(g1.shape[-1])
    lam_l = np.ascontiguousarray(np.asarray(lam_l, np.float64))
    lam_c = np.ascontiguousarray(np.asarray(lam_c, np.float64))
    lam_r = np.ascontiguousarray(np.asarray(lam_r, np.float64))
    g1 = _as_c128(g1)
    g2 = _as_c128(g2)
    gate4 = _as_c128(gate4)
    out_g1 = np.zeros_like(g1)
    out_g2 = np.zeros_like(g2)
    out_lam = np.zeros(chi, np.float64)
    ret = _lib().aqc_mps_pair_update(
        chi,
        float(trunc_thr),
        _ptr(lam_l),
        _ptr(lam_c),
        _ptr(lam_r),
        _ptr(g1),
        _ptr(g2),
        _ptr(gate4),
        _ptr(out_g1),
        _ptr(out_g2),
        _ptr(out_lam),
    )
    if ret < 0:
        raise RuntimeError("native MPS pair update failed")
    return out_g1, out_g2, out_lam
