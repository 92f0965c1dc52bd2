"""ctypes bindings for the native CPU reference library.

Builds ``native/cornell_moe_native.cpp`` on demand with g++ (no pybind11 in
this image — plain extern-"C" + ctypes) and exposes numpy-friendly
wrappers.  Used by the test suite as an independent oracle for the JAX
path, and available as a host fallback for tiny problems.

``available()`` is False when no toolchain exists; callers must gate on it.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "cornell_moe_native.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libcornell_moe_native.so")

KERNEL_IDS = {"square_exponential": 0, "matern_2.5": 1}

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int)
    lib.cm_build_block_covariance.argtypes = [
        ctypes.c_int, dptr, ctypes.c_int, dptr, ctypes.c_int, iptr,
        ctypes.c_int, dptr, ctypes.c_int, iptr, ctypes.c_int, dptr]
    lib.cm_cholesky.restype = ctypes.c_int
    lib.cm_cholesky.argtypes = [dptr, ctypes.c_int]
    lib.cm_tri_solve.argtypes = [dptr, ctypes.c_int, dptr, ctypes.c_int,
                                 ctypes.c_int]
    lib.cm_chol_solve.argtypes = [dptr, ctypes.c_int, dptr, ctypes.c_int]
    lib.cm_gp_posterior.restype = ctypes.c_int
    lib.cm_gp_posterior.argtypes = [
        ctypes.c_int, dptr, ctypes.c_int, dptr, ctypes.c_int, iptr,
        ctypes.c_int, dptr, dptr, dptr, ctypes.c_int, dptr, dptr]
    lib.cm_log_marginal_likelihood.restype = ctypes.c_double
    lib.cm_log_marginal_likelihood.argtypes = [
        ctypes.c_int, dptr, ctypes.c_int, dptr, ctypes.c_int, iptr,
        ctypes.c_int, dptr, dptr]
    lib.cm_analytic_expected_improvement.restype = ctypes.c_double
    lib.cm_analytic_expected_improvement.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.cm_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    if a is None or a.size == 0:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _prep_derivs(derivs: Sequence[int]):
    return np.ascontiguousarray(np.asarray(derivs, dtype=np.int32)) \
        if len(derivs) else np.zeros(0, np.int32)


def build_block_covariance(kernel: str, hypers, x1, derivs1, x2, derivs2):
    lib = _load()
    h = np.ascontiguousarray(hypers, dtype=np.float64)
    x1 = np.ascontiguousarray(np.atleast_2d(x1), dtype=np.float64)
    x2 = np.ascontiguousarray(np.atleast_2d(x2), dtype=np.float64)
    d1, d2 = _prep_derivs(derivs1), _prep_derivs(derivs2)
    n1, dim = x1.shape
    n2 = x2.shape[0]
    out = np.zeros((n1 * (1 + d1.size), n2 * (1 + d2.size)))
    lib.cm_build_block_covariance(
        KERNEL_IDS[kernel], _dp(h), dim, _dp(x1), n1, _ip(d1), d1.size,
        _dp(x2), n2, _ip(d2), d2.size, _dp(out))
    return out


def cholesky(a):
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.float64).copy()
    status = lib.cm_cholesky(_dp(a), a.shape[0])
    if status != 0:
        from cornell_moe_tpu.exceptions import SingularMatrixError
        raise SingularMatrixError(
            "native cholesky failed", leading_minor_index=status)
    return a


def gp_posterior(kernel: str, hypers, x, derivs, noise, y, xs):
    lib = _load()
    h = np.ascontiguousarray(hypers, dtype=np.float64)
    x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
    xs = np.ascontiguousarray(np.atleast_2d(xs), dtype=np.float64)
    d = _prep_derivs(derivs)
    noise = np.ascontiguousarray(noise, dtype=np.float64)
    y = np.ascontiguousarray(np.atleast_2d(y), dtype=np.float64)
    n, dim = x.shape
    q = xs.shape[0]
    mean_out = np.zeros(q)
    var_out = np.zeros((q, q))
    status = lib.cm_gp_posterior(
        KERNEL_IDS[kernel], _dp(h), dim, _dp(x), n, _ip(d), d.size,
        _dp(noise), _dp(y), _dp(xs), q, _dp(mean_out), _dp(var_out))
    if status != 0:
        from cornell_moe_tpu.exceptions import SingularMatrixError
        raise SingularMatrixError(
            "native gp_posterior: singular K",
            leading_minor_index=status)
    return mean_out, var_out


def log_marginal_likelihood(kernel: str, hypers, x, derivs, noise, y):
    lib = _load()
    h = np.ascontiguousarray(hypers, dtype=np.float64)
    x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
    d = _prep_derivs(derivs)
    noise = np.ascontiguousarray(noise, dtype=np.float64)
    y = np.ascontiguousarray(np.atleast_2d(y), dtype=np.float64)
    return float(lib.cm_log_marginal_likelihood(
        KERNEL_IDS[kernel], _dp(h), x.shape[1], _dp(x), x.shape[0],
        _ip(d), d.size, _dp(noise), _dp(y)))


def analytic_expected_improvement(mu, var, best_so_far):
    lib = _load()
    return float(lib.cm_analytic_expected_improvement(
        float(mu), float(var), float(best_so_far)))


def run_cpp_tests(verbose: bool = False) -> int:
    """Self-check of the native library; returns the number of errors.

    Counterpart of the GPP.run_cpp_tests binding
    (gpp_python_test.cpp:307): quick internal consistency checks —
    Cholesky round-trip, solve residuals, kernel symmetry/diagonal, EI
    closed form — without needing the JAX stack.
    """
    if not available():
        return 1
    errors = 0
    rng = np.random.default_rng(0)

    a = rng.standard_normal((8, 8))
    spd = a @ a.T + 8 * np.eye(8)
    chol = cholesky(spd)
    if not np.allclose(chol @ chol.T, spd, atol=1e-9):
        errors += 1
    lib = _load()
    b = rng.standard_normal((8, 1)).copy()
    x = b.copy()
    lib.cm_chol_solve(_dp(chol), 8, _dp(x), 1)
    if not np.allclose(spd @ x, b, atol=1e-8):
        errors += 1

    for kernel in KERNEL_IDS:
        h = np.array([1.3, 0.8, 1.1])
        pts = rng.standard_normal((6, 2))
        k = build_block_covariance(kernel, h, pts, (), pts, ())
        if not np.allclose(k, k.T, atol=1e-12):
            errors += 1
        if not np.allclose(np.diag(k), h[0], atol=1e-12):
            errors += 1

    ei0 = analytic_expected_improvement(0.0, 1.0, 0.0)
    if abs(ei0 - 1.0 / math.sqrt(2 * math.pi)) > 1e-12:
        errors += 1
    if verbose:
        print(f"native self-tests: {errors} errors")
    return errors
