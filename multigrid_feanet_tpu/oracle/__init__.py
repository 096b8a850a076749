"""ctypes binding for the C++ FEM oracle (fem_oracle.cc).

Builds the shared library on demand with g++ (cached next to the source);
no pybind11 / external deps.  See fem_oracle.cc for the ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fem_oracle.cc")
_LIB = os.path.join(_DIR, "libfem_oracle.so")

_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.fem_solve.restype = ctypes.c_int
    lib.fem_solve.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),  # phase (may be NULL)
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),  # f
        ctypes.POINTER(ctypes.c_double),  # bc (may be NULL)
        ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),  # u_out
        ctypes.POINTER(ctypes.c_double),  # final_res
    ]
    _lib = lib
    return lib


def solve(n: int, f: np.ndarray, phase: np.ndarray | None = None,
          coefficients=(1.0, 20.0), bc: np.ndarray | None = None,
          tol: float = 1e-12, max_iter: int = 100_000):
    """Solve the bi-material Poisson problem with the native CG oracle.

    ``f``: (n+1, n+1) nodal source; ``phase``: optional (n, n) element
    phases; ``bc``: optional (n+1, n+1) Dirichlet values (boundary ring).
    Returns (u, cg_iterations, final_residual_norm).
    """
    H = n + 1
    lib = get_lib()
    f64 = np.ascontiguousarray(np.asarray(f, dtype=np.float64).reshape(H * H))
    u = np.zeros(H * H, dtype=np.float64)
    res = ctypes.c_double(0.0)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    phase_ptr = None
    if phase is not None:
        phase64 = np.ascontiguousarray(np.asarray(phase, dtype=np.float64).reshape(n * n))
        phase_ptr = dptr(phase64)
    bc_ptr = None
    if bc is not None:
        bc64 = np.ascontiguousarray(np.asarray(bc, dtype=np.float64).reshape(H * H))
        bc_ptr = dptr(bc64)
    iters = lib.fem_solve(
        n, phase_ptr, float(coefficients[0]), float(coefficients[1]),
        dptr(f64), bc_ptr, float(tol), int(max_iter), dptr(u),
        ctypes.byref(res),
    )
    return u.reshape(H, H), int(iters), float(res.value)
