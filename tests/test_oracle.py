"""C++ CG oracle vs the numpy dense FEM oracle vs the JAX multigrid solver —
three independent implementations of the same PDE must agree."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu import oracle
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import multigrid


def test_cpp_oracle_matches_numpy_dense_homogeneous():
    n = 24
    rng = np.random.default_rng(0)
    f = rng.standard_normal((n + 1, n + 1))
    u_cpp, iters, res = oracle.solve(n, f, phase=None, coefficients=(1.0, 1.0))
    assert iters > 0 and res <= 1e-12
    u_np = fem.solve_dirichlet(n, f, coefficients=(1.0,))
    np.testing.assert_allclose(u_cpp, u_np, atol=1e-10)


def test_cpp_oracle_matches_numpy_dense_bimaterial_with_bc():
    n = 32
    rng = np.random.default_rng(1)
    f = rng.standard_normal((n + 1, n + 1))
    phase = geometry.circle_phase(2.0, n)
    bc = np.zeros((n + 1, n + 1))
    bc[0, :] = rng.standard_normal(n + 1)
    bc[:, -1] = rng.standard_normal(n + 1)
    u_cpp, iters, res = oracle.solve(n, f, phase=phase, bc=bc)
    assert res <= 1e-12
    u_np = fem.solve_dirichlet(n, f, bc_value=bc, phase=phase)
    np.testing.assert_allclose(u_cpp, u_np, atol=1e-9)


def test_multigrid_matches_cpp_oracle():
    """The deal.II-style scenario (linear_laplace.cc:105-112,273): coefficient
    20 in the r<0.5 circle, f=1, zero BC, n=64 — our V-cycle solution must
    match the independent native CG solve."""
    n = 64
    phase = geometry.circle_phase(2.0, n)
    f_raw = np.ones((n + 1, n + 1))
    u_cpp, iters, res = oracle.solve(n, f_raw, phase=phase)
    hier = GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float64)
    )
    f = stencil.apply_mass(jnp.asarray(f_raw, dtype=jnp.float64), hier.finest.h)
    u_mg, hist = multigrid.solve(hier, f, nu1=2, nu2=2, eps=1e-11, max_cycles=300)
    np.testing.assert_allclose(np.asarray(u_mg), u_cpp, atol=1e-9)
