"""Problem specification and the multigrid level pyramid.

A :class:`Problem` describes the PDE discretization (domain size, finest grid,
two-phase coefficients, inclusion geometry, boundary conditions); a
:class:`GridHierarchy` precomputes, once, everything the solvers need per
level: stencil table, pattern-id field, Jacobi diagonal, interior mask.

This replaces the reference's per-level ``SingleGrid`` objects (reference:
FEANet/multigrid.py:12-47) which re-assembled meshes/convnets eagerly per
construction, and fixes its rebuild-per-ResetBoundary diagonal cost
(reference: FEANet/jacobi.py:17-25 — d_mat reassembled every JacobiBlock
construction).  Levels are flax.struct pytrees, so a whole hierarchy passes
through ``jax.jit`` with static shapes.

Coarse-level operators are re-rasterized from the inclusion geometry at each
resolution (geometric coarsening), exactly as the reference rebuilds
``MeshCenterInterface`` per level n (reference: FEANet/multigrid.py:23-25,
102-113).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil


@struct.dataclass
class Level:
    """One multigrid level: static sizes + precomputed operator fields."""

    n: int = struct.field(pytree_node=False)  # elements per edge
    h: float = struct.field(pytree_node=False)  # element size
    # two-phase coefficients as static floats enable the gather-free bitplane
    # apply (ops/stencil.py apply_stencil_bitplane); None for general tables
    a0: Optional[float] = struct.field(pytree_node=False, default=None)
    a1: Optional[float] = struct.field(pytree_node=False, default=None)
    table: jax.Array = None  # (16,3,3) stencil table, or (3,3) if homogeneous
    pid: Optional[jax.Array] = None  # (n+1, n+1) int8 pattern ids; None if homogeneous
    geo: jax.Array = None  # (n+1, n+1) interior mask
    diag: jax.Array = None  # (n+1, n+1) diag(A)
    # affine-bitplane operator A = base (3,3 stencil) + bit_scale * phase
    # bitplanes — the gather-free form for phase-affine systems that are not
    # pure stiffness (theta-scheme heat: M + theta dt K); see
    # stencil.apply_stencil_bitplane_affine
    base: Optional[jax.Array] = None
    bit_scale: Optional[float] = struct.field(pytree_node=False, default=None)

    @property
    def n_nodes(self) -> int:
        return self.n + 1

    @property
    def homogeneous(self) -> bool:
        return self.pid is None

    def apply(self, u: jax.Array) -> jax.Array:
        """A @ u on this level (bitplane form when two-phase or phase-affine,
        gather only as the general-table fallback)."""
        if self.pid is not None and self.base is not None:
            return stencil.apply_stencil_bitplane_affine(
                self.pid, u, self.base, self.bit_scale)
        if self.pid is not None and self.a0 is not None:
            return stencil.apply_stencil_bitplane(self.pid, u, self.a0, self.a1)
        return stencil.apply_stencil(self.table, self.pid, u)


@dataclasses.dataclass(frozen=True)
class Problem:
    """Discretization spec. ``inclusion`` is None (homogeneous), a
    ('circle', (cx, cy), radius) / ('rect', (cx, cy), half_width) tuple, or a
    callable ``n -> (n, n) phase array``."""

    n: int  # finest-grid elements per edge (power of 2)
    size: float = 2.0
    coefficients: tuple = (1.0, 20.0)
    inclusion: object = None
    dtype: object = jnp.float32

    def phase(self, n: int) -> Optional[np.ndarray]:
        if self.inclusion is None:
            return None
        if callable(self.inclusion):
            return np.asarray(self.inclusion(n))
        kind, center, radius = self.inclusion
        if kind == "circle":
            return geometry.circle_phase(self.size, n, center, radius)
        if kind == "rect":
            return geometry.rect_phase(self.size, n, center, radius)
        raise ValueError(f"unknown inclusion kind {kind!r}")


def build_level(problem: Problem, n: int) -> Level:
    # Level fields are assembled in numpy and shipped to the device once:
    # eagerly-executed device ops pay an XLA compile per (op, level shape),
    # which dominates construction on a remote TPU (~130 s at n=4096 for a
    # 12-level hierarchy vs ~2 s host-side).
    h = problem.size / n
    phase = problem.phase(n)
    if phase is None:
        table_np = stencil.make_stencil_table_np((1.0, 1.0))[0]
        pid = None
        diag_np = np.full((n + 1, n + 1), table_np[1, 1])
    else:
        table_np = stencil.make_stencil_table_np(problem.coefficients)
        pid_np = stencil.pattern_ids_np(phase)
        pid = jnp.asarray(pid_np)
        diag_np = table_np[:, 1, 1][pid_np]
    table = jnp.asarray(table_np, dtype=problem.dtype)
    diag = jnp.asarray(diag_np, dtype=problem.dtype)
    geo = geometry.interior_mask(n + 1, dtype=problem.dtype)
    a0 = a1 = None
    if phase is not None and len(problem.coefficients) == 2:
        a0, a1 = (float(c) for c in problem.coefficients)
    return Level(n=n, h=h, a0=a0, a1=a1, table=table, pid=pid, geo=geo, diag=diag)


@struct.dataclass
class GridHierarchy:
    """Finest-to-coarsest tuple of Levels.  Coarsest has n=2 (one interior
    node), matching the reference's L = log2(n) levels with relax-only
    coarsest solve (reference: FEANet/multigrid.py:87, MM_Model_convergence
    cell 3)."""

    levels: tuple = ()

    @classmethod
    def create(cls, problem: Problem, num_levels: Optional[int] = None) -> "GridHierarchy":
        n = problem.n
        L = int(np.log2(n)) if num_levels is None else num_levels
        levels = []
        for l in range(L):
            levels.append(build_level(problem, n >> l))
        return cls(levels=tuple(levels))

    @property
    def finest(self) -> Level:
        return self.levels[0]

    @property
    def num_levels(self) -> int:
        return len(self.levels)
