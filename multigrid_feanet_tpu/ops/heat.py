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
    # assembled host-side (numpy) — see core/problem.py::build_level
    s9_np = stencil.make_stencil_table_np((1.0, 1.0))[0]
    m_np = np.asarray(stencil.MASS_KERNEL)
    levels = []
    for lv in base.levels:
        hh = lv.h * lv.h
        if lv.pid is None:
            sys_np = hh * m_np + theta * dt * s9_np
            diag = jnp.full(lv.geo.shape, sys_np[1, 1], dtype=lv.table.dtype)
            levels.append(lv.replace(
                table=jnp.asarray(sys_np, lv.table.dtype), diag=diag))
        else:
            k_np = stencil.make_stencil_table_np(problem.coefficients)
            sys_np = hh * m_np + theta * dt * k_np
            pid_np = stencil.pattern_ids_np(problem.phase(lv.n))
            diag = jnp.asarray(sys_np[:, 1, 1][pid_np], lv.table.dtype)
            sys_base = jnp.asarray(hh * m_np + (theta * dt * lv.a0) * s9_np,
                                   lv.table.dtype)
            levels.append(lv.replace(
                table=jnp.asarray(sys_np, lv.table.dtype), diag=diag,
                a0=None, a1=None, base=sys_base,
                bit_scale=float(theta * dt * (lv.a1 - lv.a0))))
    return GridHierarchy(levels=tuple(levels))


def pallas_heat_hierarchy(problem: Problem, dt: float, theta: float = 1.0,
                          num_levels: Optional[int] = None, sys=None, **kw):
    """PallasHierarchyV2 for the theta-system  B = M + theta dt K.

    The fused element-factored kernels run B directly: the stiffness part is
    the standard element factorization with coefficients scaled by theta*dt,
    and the consistent mass matrix is the pattern-independent per-element
    triple  (mp, ms, mo) = h^2/36 * (2, 2, -1)  (see ops/pallas_sweep.py
    ``_apply_bim``).  The XLA subtree below the Pallas threshold and the
    dense coarse inverse run the same system via ``heat_system_hierarchy``'s
    per-level tables, so a solve is cycle-math-identical to
    ``multigrid.solve`` on that hierarchy."""
    from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

    if sys is None:
        sys = heat_system_hierarchy(problem, dt, theta, num_levels)
    td = float(theta) * float(dt)
    a0, a1 = problem.coefficients
    return PallasHierarchyV2(
        problem, num_levels=num_levels, hier=sys,
        coefficients=(td * a0, td * a1),
        mass_fn=lambda lv: (lv.h * lv.h / 18.0, lv.h * lv.h / 18.0,
                            -lv.h * lv.h / 36.0),
        **kw)


@dataclasses.dataclass
class HeatSolver:
    """Implicit (theta-scheme) heat stepper with V-cycle inner solves."""

    problem: Problem
    dt: float
    theta: float = 1.0  # 1 = backward Euler, 0.5 = Crank-Nicolson
    backend: str = "xla"  # "pallas": fused-kernel inner solves (large grids)
    pallas_kw: Optional[dict] = None  # extra PallasHierarchyV2 kwargs

    def __post_init__(self):
        self.sys = heat_system_hierarchy(self.problem, self.dt, self.theta)
        self.stiff = GridHierarchy.create(self.problem)
        self.h = self.problem.size / self.problem.n
        kw = dict(self.pallas_kw or {})
        # share self.sys unless the caller truncates the pallas hierarchy
        share = "num_levels" not in kw
        self.ph = (pallas_heat_hierarchy(
                       self.problem, self.dt, self.theta,
                       sys=self.sys if share else None, **kw)
                   if self.backend == "pallas" else None)

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
        if self.ph is not None:
            return self.ph.solve(b, u0=u_n, bc_value=bc_value, nu1=1, nu2=1,
                                 eps=eps, max_cycles=max_cycles)
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

    def march(self, u0: jax.Array, f: jax.Array, num_steps: int,
              cycles_per_step: int = 2, bc_value=0.0):
        """``num_steps`` implicit steps with a FIXED number of V(1,1) cycles
        per step, compiled as ONE ``lax.scan`` — zero per-step dispatch (the
        per-step ``step()`` path costs ~2 host round-trips each through the
        TPU tunnel).  ``f``: time-independent (H, W) source, or per-time-knot
        sources of shape (num_steps + 1, H, W) (knot j = t0 + j dt).

        The fixed cycle count replaces ``step()``'s eps test; the theta
        system is mass-regularized so 1-2 cycles/step reach the f32 residual
        floor for production dt (probe: results/heat_march_tpu.json).
        Returns the final u."""
        from multigrid_feanet_tpu.core.geometry import reset_boundary

        lv0 = self.sys.finest
        timedep = f.ndim == 3
        key = ("march", int(num_steps), int(cycles_per_step), timedep)
        cache = getattr(self, "_march_cache", None)
        if cache is None:
            cache = self._march_cache = {}
        if key not in cache:
            ph = self.ph

            if ph is not None:
                p0 = ph.pl[0]

                @jax.jit
                def run_march(u0_, f_, bc):
                    def step_fn(carry, fs):
                        u_pad, sp = carry
                        f_n, f_np1 = fs if timedep else (f_, f_)
                        b = self.rhs(p0.unpad(u_pad), f_n, f_np1)
                        fb = p0.pad(b)
                        for _ in range(cycles_per_step):
                            u_pad, sp, _ = ph._cycle0(u_pad, sp, fb, 1, 1)
                        return (u_pad, sp), None

                    u_pad = p0.pad(reset_boundary(u0_, lv0.geo, bc))
                    xs = (f_[:-1], f_[1:]) if timedep else None
                    carry, _ = jax.lax.scan(step_fn, (u_pad, p0.zeros()), xs,
                                            length=num_steps)
                    return p0.unpad(carry[0])

            else:

                @jax.jit
                def run_march(u0_, f_, bc):
                    def step_fn(u, fs):
                        f_n, f_np1 = fs if timedep else (f_, f_)
                        b = self.rhs(u, f_n, f_np1)
                        for _ in range(cycles_per_step):
                            u = multigrid.v_cycle(self.sys, u, b, 1, 1, bc)
                        return u, None

                    u = reset_boundary(u0_, lv0.geo, bc)
                    xs = (f_[:-1], f_[1:]) if timedep else None
                    u, _ = jax.lax.scan(step_fn, u, xs, length=num_steps)
                    return u

            cache[key] = run_march
        return cache[key](u0, f, jnp.asarray(bc_value, u0.dtype))
