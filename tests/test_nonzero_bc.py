"""Nonzero *scalar* Dirichlet data must be imposed on the boundary ring only.

Regression tests for a round-1 bug: ``reset_boundary`` added a scalar
``bc_value`` to every node (the reference adds a boundary-masked field,
reference: FEANet/geo.py:22-30 + jacobi.py:27-29), which silently broke all
solvers for any nonzero scalar bc.  Since A annihilates constants on interior
rows (FEM Laplace rows sum to zero), the truth for bc=c is c + (zero-bc
solution) for the same interior RHS — for both Poisson and elasticity (a
constant displacement has zero strain).
"""

import numpy as np
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import coarse, jacobi, multigrid
from multigrid_feanet_tpu.solvers.jacobi import interior_norm

BC = 0.7


def _problem(n, dtype=jnp.float64):
    problem = Problem(n=n, inclusion=None, dtype=dtype)
    hier = GridHierarchy.create(problem)
    F = jnp.ones((n + 1, n + 1), dtype)
    f = stencil.apply_mass(F, hier.finest.h)
    return hier, f


def test_jacobi_nonzero_scalar_bc():
    n = 16
    hier, f = _problem(n)
    u, hist = jacobi.solve_jacobi(hier.finest, f, bc_value=BC, eps=1e-11)
    assert hist[-1] <= 1e-11
    u_truth = BC + fem.solve_dirichlet(n, np.ones((n + 1, n + 1)), coefficients=(1.0,))
    np.testing.assert_allclose(np.asarray(u), u_truth, atol=1e-9)


def test_vcycle_nonzero_scalar_bc():
    n = 64
    hier, f = _problem(n)
    u, hist = multigrid.solve(hier, f, bc_value=BC, eps=1e-10, max_cycles=60)
    assert hist[-1] <= 1e-10, hist[-5:]
    u_truth = BC + fem.solve_dirichlet(n, np.ones((n + 1, n + 1)), coefficients=(1.0,))
    np.testing.assert_allclose(np.asarray(u), u_truth, atol=1e-8)


def test_fmg_direct_coarse_nonzero_scalar_bc():
    # the direct coarse solve must fold bc into the interior RHS (partition
    # solve), not just stamp the ring afterwards
    n = 64
    problem = Problem(n=n, inclusion=None, dtype=jnp.float64)
    hier = GridHierarchy.create(problem, num_levels=3)
    inv = coarse.coarse_inverse(hier.levels[-1], dtype=jnp.float64)
    F = jnp.ones((n + 1, n + 1), jnp.float64)
    f = stencil.apply_mass(F, hier.finest.h)
    u_fmg = multigrid.fmg(hier, f, bc_value=BC, coarse_inv=inv)
    res = float(interior_norm(f - hier.finest.apply(u_fmg)))
    # one FMG pass lands near discretization accuracy (~2e-3 here); without
    # the RHS fold the coarse stage is wrong by O(bc) and res is O(1)
    assert res < 5e-3, res
    u, hist = multigrid.solve(hier, f, u0=u_fmg, bc_value=BC, eps=1e-10,
                              max_cycles=40, coarse_inv=inv)
    assert hist[-1] <= 1e-10


def test_elastic_relax_nonzero_scalar_bc():
    import jax
    from multigrid_feanet_tpu.solvers import elastic

    n = 16
    levels = elastic.build_elastic_hierarchy(n, num_levels=1, dtype=jnp.float64)
    lv = levels[0]
    F = np.zeros((2, n + 1, n + 1))
    F[0] = 1.0
    f = stencil.apply_mass(jnp.asarray(F), lv.h)  # per-component mass

    @jax.jit
    def run(u):
        def body(u, _):
            return elastic.relax(lv, u, f, 2, bc_value=0.3), None

        u, _ = jax.lax.scan(body, u, None, length=2000)
        return u

    u = run(jnp.zeros_like(f))
    # boundary carries bc on both components; residual small
    assert abs(float(u[0, 0, 5]) - 0.3) < 1e-12
    assert abs(float(u[1, 0, 5]) - 0.3) < 1e-12
    from multigrid_feanet_tpu.ops.elasticity import elastic_interior_norm

    res = float(elastic_interior_norm(f - lv.apply(u)))
    assert res < 1e-8, res
