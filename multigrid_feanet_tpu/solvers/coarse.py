"""Coarse-grid direct solve as a precomputed dense-inverse matmul.

The reference's V-cycle never solves the coarsest level exactly — it only
relaxes there (reference: MM_Model_convergence.ipynb cell 3 ``rec_V_cycle``,
FEANet/multigrid.py:108-113 build levels down to n=2).  That is fine at n=2
(one interior node), but it forces the hierarchy to full log2(n) depth: stop
any earlier and the un-solved coarse level wrecks the convergence factor.

This module adds the standard remedy, in TPU-idiomatic form: the coarsest
interior operator is assembled densely ONCE (host-side numpy, from the same
(16,3,3) stencil table + pattern-id field that defines A everywhere else),
inverted, and the coarse solve becomes a single (m^2, m^2) matmul — MXU work,
no iteration, exact.  This enables *truncated hierarchies* (e.g. stop at
n=16 or n=32), which drop the deepest, latency-bound levels of the V-cycle.

Assumption: the solve is for the homogeneous-Dirichlet problem (interior
unknowns only, boundary = 0) — always true for coarse-grid *error* equations.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Level


def dense_interior_matrix(level: Level) -> np.ndarray:
    """Assemble A restricted to interior nodes as a dense (m^2, m^2) f64
    matrix, m = n - 1, row-major over interior (i, j) in [1, n-1]^2.

    Entry convention follows ops/stencil.py: ``table[pid[i,j], 1+dr, 1+dc]``
    couples node (i, j) to (i+dr, j+dc).  Columns touching the boundary ring
    are dropped (zero Dirichlet).
    """
    n = level.n
    m = n - 1
    table = np.asarray(jax.device_get(level.table), dtype=np.float64)
    pid = None if level.pid is None else np.asarray(jax.device_get(level.pid))
    A = np.zeros((m * m, m * m), dtype=np.float64)
    for i in range(1, n):
        for j in range(1, n):
            st = table if pid is None else table[pid[i, j]]
            row = (i - 1) * m + (j - 1)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ii, jj = i + dr, j + dc
                    if 1 <= ii < n and 1 <= jj < n:
                        A[row, (ii - 1) * m + (jj - 1)] += st[1 + dr, 1 + dc]
    return A


def coarse_inverse(level: Level, dtype=None) -> jax.Array:
    """Precompute inv(A_interior) for ``level`` as a device array.

    Intended for truncation points n <= 65 (interior m = n-1 <= 64, i.e. a
    <=4096^2 dense inverse); larger levels work but the memory/assembly cost
    grows as n^4 and, cast to f32, exactness degrades with conditioning — a
    warning fires in both cases (1-norm condition estimate, free since the
    inverse is in hand).
    """
    import warnings

    m = level.n - 1
    if m > 64:
        warnings.warn(
            f"coarse_inverse on an n={level.n} level ({m}^2 interior nodes): "
            "dense inverse is O(n^4) memory; intended for n <= 65 truncation "
            "points", stacklevel=2)
    A = dense_interior_matrix(level)
    inv = np.linalg.inv(A)
    cond1 = np.abs(A).sum(0).max() * np.abs(inv).sum(0).max()
    if dtype is None:
        dtype = level.geo.dtype
    if np.dtype(dtype) == np.float32 and cond1 > 1e6:
        warnings.warn(
            f"coarse_inverse: cond_1(A) ~ {cond1:.2e}; f32 coarse solves may "
            "lose exactness (use a smaller truncation point or f64)",
            stacklevel=2)
    return jnp.asarray(inv, dtype=dtype)


def coarse_solve(inv: jax.Array, f: jax.Array) -> jax.Array:
    """Exact interior solve ``u = inv @ f_interior`` (zero boundary ring).

    ``f``: (..., n+1, n+1) level-shaped RHS; returns u of the same shape.
    One dense matvec — lowered onto the MXU.
    """
    mm = inv.shape[0]
    m = int(round(np.sqrt(mm)))
    if f.shape[-1] != m + 2:
        raise ValueError(
            f"coarse_inv is for an n={m + 1} level ({m}^2 interior nodes) but "
            f"the RHS has shape {f.shape}; pass coarse_inverse(hier.levels[-1])"
        )
    fi = f[..., 1:-1, 1:-1].reshape(*f.shape[:-2], mm)
    ui = fi @ inv.T
    u = ui.reshape(*f.shape[:-2], m, m)
    pad = [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(u, pad)


# ---- elastic (2-DOF/node) coarse direct solve (round 4, VERDICT r3 #3) ----


def dense_interior_matrix_elastic(level) -> np.ndarray:
    """Assemble the elastic operator restricted to interior nodes as a dense
    (2 m^2, 2 m^2) f64 matrix, m = n - 1, row-major over interior (i, j)
    with the 2 displacement components interleaved (node-major).

    Block convention follows ops/elasticity.py::apply_elastic_stencil:
    ``table[pid[i,j], 1+dr, 1+dc]`` is the 2x2 (out_c, in_c) block coupling
    node (i, j) to (i+dr, j+dc); boundary columns dropped (zero Dirichlet).
    """
    n = level.n
    m = n - 1
    table = np.asarray(jax.device_get(level.table), dtype=np.float64)
    pid = None if level.pid is None else np.asarray(jax.device_get(level.pid))
    A = np.zeros((2 * m * m, 2 * m * m), dtype=np.float64)
    for i in range(1, n):
        for j in range(1, n):
            st = table[0] if pid is None else table[pid[i, j]]
            row = (i - 1) * m + (j - 1)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ii, jj = i + dr, j + dc
                    if 1 <= ii < n and 1 <= jj < n:
                        col = (ii - 1) * m + (jj - 1)
                        A[2 * row : 2 * row + 2, 2 * col : 2 * col + 2] += (
                            st[1 + dr, 1 + dc])
    return A


def coarse_inverse_elastic(level, dtype=jnp.float32) -> jax.Array:
    """Precompute inv(A_interior) for an ElasticLevel (same contract and
    conditioning warning as the scalar ``coarse_inverse``)."""
    import warnings

    m = level.n - 1
    if m > 45:  # 2 m^2 > 4096 dofs
        warnings.warn(
            f"coarse_inverse_elastic on an n={level.n} level "
            f"({2 * m * m} interior dofs): intended for small truncation "
            "points", stacklevel=2)
    A = dense_interior_matrix_elastic(level)
    inv = np.linalg.inv(A)
    cond1 = np.abs(A).sum(0).max() * np.abs(inv).sum(0).max()
    if np.dtype(dtype) == np.float32 and cond1 > 1e6:
        warnings.warn(
            f"coarse_inverse_elastic: cond_1(A) ~ {cond1:.2e}; f32 coarse "
            "solves may lose exactness", stacklevel=2)
    return jnp.asarray(inv, dtype=dtype)


def coarse_solve_elastic(inv: jax.Array, f: jax.Array) -> jax.Array:
    """Exact interior elastic solve; ``f``: (..., 2, n+1, n+1) -> u of the
    same shape.  One dense matvec on the MXU (node-major interleaved)."""
    mm2 = inv.shape[0]
    m = int(round(np.sqrt(mm2 // 2)))
    if f.shape[-1] != m + 2:
        raise ValueError(
            f"coarse_inverse_elastic is for an n={m + 1} level but the RHS "
            f"has shape {f.shape}")
    fi = f[..., :, 1:-1, 1:-1]  # (..., 2, m, m)
    fi = jnp.moveaxis(fi, -3, -1).reshape(*f.shape[:-3], mm2)
    ui = fi @ inv.T
    u = jnp.moveaxis(ui.reshape(*f.shape[:-3], m, m, 2), -1, -3)
    pad = [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(u, pad)
