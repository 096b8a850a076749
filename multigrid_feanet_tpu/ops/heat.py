"""Time-dependent heat equation: implicit time stepping with multigrid.

The reference's heat-equation capability lives in its native oracles
(Archive/FEM/dealii_heat/heat.cc, Archive/FEM/matlab_heat/Heat.m) and the
FEA-Net origins (Archive/FEA-Net/pytorch_heat notebooks).  Semi-discrete
form  M du/dt + K u = M f;  theta-scheme step:

    (M + theta dt K) u^{n+1} = (M - (1-theta) dt K) u^n
                               + dt M (theta f^{n+1} + (1-theta) f^n)

Both operators are 3x3 stencil tables (mass table + dt-scaled stiffness
table), so the whole framework — stencil application, Jacobi, V-cycle —
applies unchanged via the general gather path; only the system table and
its diagonal differ per dt.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import GridHierarchy, Level, Problem, build_level
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import multigrid


def mass_table(h: float, num_patterns: int = 16, dtype=jnp.float64) -> jax.Array:
    """(P, 3, 3) consistent-mass stencil table (phase-independent: the mass
    matrix does not see the diffusion coefficient)."""
    m = (h * h) * np.asarray(stencil.MASS_KERNEL)
    return jnp.asarray(np.broadcast_to(m, (num_patterns, 3, 3)), dtype=dtype)


def heat_system_hierarchy(problem: Problem, dt: float, theta: float = 1.0,
                          num_levels: Optional[int] = None) -> GridHierarchy:
    """Hierarchy whose per-level operator is  B = M + theta dt K.

    B is AFFINE in the 4 element-phase bits (the consistent mass matrix is
    phase-independent), so bi-material levels carry the gather-free
    affine-bitplane form:  base = h^2 MASS + theta dt a0 S9,
    bit_scale = theta dt (a1 - a0)  (stencil.apply_stencil_bitplane_affine).
    The (16,3,3) system table is still assembled for general consumers
    (diagonal, dense oracles).
    """
    base = GridHierarchy.create(problem, num_levels)
    s9 = stencil.make_homogeneous_stencil(dtype=problem.dtype)
    levels = []
    for lv in base.levels:
        if lv.pid is None:
            k_tab = lv.table[None]  # (1, 3, 3)
            mt = mass_table(lv.h, 1, dtype=lv.table.dtype)
            sys_tab = (mt + theta * dt * k_tab)[0]
            diag = stencil.stencil_diagonal(sys_tab, None, shape=lv.geo.shape)
            levels.append(lv.replace(table=sys_tab, diag=diag))
        else:
            mt = mass_table(lv.h, lv.table.shape[0], dtype=lv.table.dtype)
            sys_tab = mt + theta * dt * lv.table
            diag = stencil.stencil_diagonal(sys_tab, lv.pid)
            sys_base = ((lv.h * lv.h) * jnp.asarray(stencil.MASS_KERNEL)
                        + (theta * dt * lv.a0) * s9).astype(lv.table.dtype)
            levels.append(lv.replace(
                table=sys_tab, diag=diag, a0=None, a1=None,
                base=sys_base, bit_scale=float(theta * dt * (lv.a1 - lv.a0))))
    return GridHierarchy(levels=tuple(levels))


@dataclasses.dataclass
class HeatSolver:
    """Implicit (theta-scheme) heat stepper with V-cycle inner solves."""

    problem: Problem
    dt: float
    theta: float = 1.0  # 1 = backward Euler, 0.5 = Crank-Nicolson

    def __post_init__(self):
        self.sys = heat_system_hierarchy(self.problem, self.dt, self.theta)
        self.stiff = GridHierarchy.create(self.problem)
        self.h = self.problem.size / self.problem.n

    def rhs(self, u_n: jax.Array, f_n: jax.Array, f_np1: jax.Array) -> jax.Array:
        """(M - (1-theta) dt K) u^n + dt M (theta f^{n+1} + (1-theta) f^n)."""
        lv = self.stiff.finest
        mu = stencil.apply_mass(u_n, self.h)
        ku = lv.apply(u_n)
        f_mix = self.theta * f_np1 + (1.0 - self.theta) * f_n
        return mu - (1.0 - self.theta) * self.dt * ku + self.dt * stencil.apply_mass(f_mix, self.h)

    def step(self, u_n: jax.Array, f_n: jax.Array, f_np1: jax.Array, bc_value=0.0,
             eps: float = 1e-10, max_cycles: int = 100):
        b = self.rhs(u_n, f_n, f_np1)
        u, hist = multigrid.solve(
            self.sys, b, u0=u_n, nu1=1, nu2=1, bc_value=bc_value, eps=eps,
            max_cycles=max_cycles,
        )
        return u, hist

    def run(self, u0: jax.Array, f_fn, t0: float, num_steps: int, bc_value=0.0,
            eps: float = 1e-10):
        """March ``num_steps``; ``f_fn(t) -> (H, W)`` source field."""
        u = u0
        t = t0
        for _ in range(num_steps):
            u, _ = self.step(u, f_fn(t), f_fn(t + self.dt), bc_value, eps)
            t += self.dt
        return u
