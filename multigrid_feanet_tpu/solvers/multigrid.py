"""Geometric multigrid V-cycle with classical transfer operators.

Cycle structure matches the reference's recursive V-cycle exactly
(reference: MM_Model_convergence.ipynb cell 3 ``rec_V_cycle`` /
``Multigrid.Solve``):

  relax nu1  ->  r = f - A v  ->  f_c = 4 * FW-restrict(r)  ->  recurse
  -> v += BC-reset(bilinear-prolong(v_c))  ->  relax nu2

with the coarsest level (n=2, one interior node) getting relax-only treatment
(nu1 then nu2 sweeps, no direct solve).  The recursion is unrolled in Python
(static level count) so the whole cycle jits to one XLA program; the solve
driver runs cycles in ``lax.scan`` chunks with a single host sync per chunk.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import GridHierarchy
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import coarse
from multigrid_feanet_tpu.solvers.jacobi import (
    DEFAULT_OMEGA,
    interior_norm,
    relax,
)


def v_cycle(hier: GridHierarchy, u: jax.Array, f: jax.Array, nu1: int = 1, nu2: int = 1,
            bc_value=0.0, omega: float = DEFAULT_OMEGA, level: int = 0,
            coarse_inv: jax.Array | None = None) -> jax.Array:
    """One recursive V(nu1, nu2) cycle starting at ``level``; returns updated u.

    ``bc_value`` applies only on the finest level; coarse error equations use
    homogeneous Dirichlet data, as in the reference (coarse Geometry boundary
    values are all zero, reference: FEANet/geo.py:22-30).

    ``coarse_inv`` (solvers/coarse.py) replaces the coarsest level's
    relax-only treatment with an exact dense-inverse matmul solve, enabling
    truncated hierarchies.  The reference has no coarse direct solve.
    """
    levels = hier.levels
    lv = levels[level]
    if coarse_inv is not None and level == len(levels) - 1 and level > 0:
        return coarse.coarse_solve(coarse_inv, f).astype(u.dtype)
    bc = bc_value if level == 0 else 0.0
    u = relax(lv, u, f, nu1, bc, omega)
    if level < len(levels) - 1:
        r = f - lv.apply(u)
        # h^2 scaling of the coarse-grid right-hand side (factor 4), matching
        # the reference's `4 * self.Restrict(residual)`.
        f_c = 4.0 * restrict_full_weighting(r)
        u_c = jnp.zeros(f_c.shape, dtype=u.dtype)
        u_c = v_cycle(hier, u_c, f_c, nu1, nu2, 0.0, omega, level + 1, coarse_inv)
        u = u + prolong_bilinear(u_c, levels[level].geo)
    return relax(lv, u, f, nu2, bc, omega)


@partial(jax.jit, static_argnames=("nu1", "nu2", "chunk", "omega"))
def _vcycle_chunk(hier: GridHierarchy, u, f, bc_value, nu1: int, nu2: int, chunk: int,
                  omega: float, coarse_inv=None):
    """``chunk`` V-cycles; returns final u and post-cycle interior residual norms."""

    def body(u, _):
        u = v_cycle(hier, u, f, nu1, nu2, bc_value, omega, 0, coarse_inv)
        res = interior_norm(f - hier.finest.apply(u))
        return u, res

    return jax.lax.scan(body, u, None, length=chunk)


def solve(hier: GridHierarchy, f: jax.Array, u0: jax.Array | None = None, nu1: int = 1,
          nu2: int = 1, bc_value=0.0, eps: float | None = 1e-6, max_cycles: int = 400,
          chunk: int = 8, omega: float = DEFAULT_OMEGA,
          coarse_inv: jax.Array | None = None):
    """V-cycle to ``eps`` (absolute interior L2 residual) or ``max_cycles``.

    Returns ``(u, res_history)``; ``res_history[k]`` is the residual after
    cycle k+1, the reference's ``res_arr_Vcycle`` convention.
    """
    H = hier.finest.n_nodes
    if u0 is None:
        u0 = jnp.zeros((H, H), dtype=f.dtype)
    u = u0
    bc_value = jnp.asarray(bc_value, dtype=f.dtype)
    history = []
    done = 0
    while done < max_cycles:
        k = min(chunk, max_cycles - done)
        u, norms = _vcycle_chunk(hier, u, f, bc_value, nu1, nu2, k, omega, coarse_inv)
        norms = jax.device_get(norms)
        history.append(norms)
        done += k
        if eps is not None:
            hit = norms <= eps
            if hit.any():
                history[-1] = norms[: int(hit.argmax()) + 1]
                break
        if not np.isfinite(norms[-1]):
            break
    return u, np.concatenate(history)


def fmg(hier: GridHierarchy, f: jax.Array, nu1: int = 1, nu2: int = 1,
        cycles_per_level: int = 1, bc_value=0.0, omega: float = DEFAULT_OMEGA,
        coarse_inv: jax.Array | None = None, coarse_sweeps: int = 64) -> jax.Array:
    """Full multigrid (F-cycle): nested iteration from the coarsest level up.

    The RHS is restricted down the whole pyramid (with the same x4 h^2
    scaling the V-cycle uses), the coarsest true equation is solved (exactly
    via ``coarse_inv`` if given, else by ``coarse_sweeps`` Jacobi sweeps),
    and each prolonged iterate seeds ``cycles_per_level`` V(nu1, nu2) cycles
    on the next finer level.  One FMG pass lands at or near discretization
    accuracy — typically worth several fine-level V-cycles from a zero init.

    The reference has no FMG (its drivers always start V-cycles from zero or
    random fields); this is a standard capability added for the TPU build.
    Measured on TPU at 1025^2: homogeneous Poisson reaches ~100x below the
    zero-init residual in one pass; on the bi-material interface problem the
    post-FMG *residual* looks high (bilinear prolongation kinks across the
    20x coefficient jump and A amplifies them) but the *error* is smaller —
    it still saves ~3 of 10 V-cycles to tolerance.
    A scalar ``bc_value`` is imposed at every level (the coarse stages solve
    the true equation); array-valued BCs are imposed on the finest level
    only, which costs a little FMG efficiency but not correctness.
    """
    levels = hier.levels
    L = len(levels)
    fs = [f]
    for _ in range(L - 1):
        fs.append(4.0 * restrict_full_weighting(fs[-1]))
    scalar_bc = jnp.ndim(bc_value) == 0

    def bc_at(l):
        if l == 0:
            return bc_value
        return bc_value if scalar_bc else 0.0

    lvc = levels[-1]
    u = jnp.zeros(fs[-1].shape, dtype=f.dtype)
    if coarse_inv is not None and L > 1:
        # Fold a (scalar) Dirichlet value into the interior RHS before the
        # zero-BC direct solve: with u = u_i + u_bc (u_bc = bc on the ring,
        # zero inside), A u_i = f - A u_bc on the interior — the partition
        # solve.  For bc == 0 this is exact and costs one tiny coarse apply.
        bc_c = jnp.asarray(bc_at(L - 1), f.dtype)
        u_bc = (1.0 - lvc.geo) * bc_c
        u_i = coarse.coarse_solve(coarse_inv, fs[-1] - lvc.apply(u_bc))
        u = (u_i + u_bc).astype(f.dtype)
    else:
        u = relax(lvc, u, fs[-1], coarse_sweeps, bc_at(L - 1), omega)
    for l in range(L - 2, -1, -1):
        u = prolong_bilinear(u, levels[l].geo)
        u = reset_boundary(u, levels[l].geo, bc_at(l))
        sub = GridHierarchy(levels=levels[l:])
        for _ in range(cycles_per_level):
            u = v_cycle(sub, u, fs[l], nu1, nu2, bc_at(l), omega, 0, coarse_inv)
    return u


def convergence_factor(res_history, m: int | None = None) -> float:
    """q = r[m] / r[m-1] (last ratio by default), the reference's
    ``compute_q`` (reference: MM_Model_convergence.ipynb cell 4)."""
    r = np.asarray(res_history)
    if m is None:
        return float(r[-1] / r[-2])
    return float(r[m] / r[m - 1])
