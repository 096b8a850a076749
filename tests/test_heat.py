"""Heat equation: system-stencil correctness vs dense (M + dt K), one
implicit step vs a dense direct solve, and decay of the analytic eigenmode."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import heat, stencil


def test_system_table_matches_dense():
    n, dt = 12, 0.01
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float64)
    sys = heat.heat_system_hierarchy(problem, dt)
    from multigrid_feanet_tpu.core import geometry

    phase = geometry.circle_phase(2.0, n)
    K, M = fem.assemble(n, phase=phase)
    A = M + dt * K
    lv = sys.finest
    rng = np.random.default_rng(0)
    u = rng.standard_normal((n + 1, n + 1))
    out = np.asarray(lv.apply(jnp.asarray(u)))
    expected = (A @ u.reshape(-1)).reshape(n + 1, n + 1)
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-10)


def test_backward_euler_step_matches_dense_solve():
    n, dt = 16, 0.05
    problem = Problem(n=n, dtype=jnp.float64)
    solver = heat.HeatSolver(problem, dt, theta=1.0)
    rng = np.random.default_rng(1)
    u_n = np.zeros((n + 1, n + 1))
    u_n[1:-1, 1:-1] = rng.standard_normal((n - 1, n - 1))
    f = rng.standard_normal((n + 1, n + 1))
    u1, hist = solver.step(jnp.asarray(u_n), jnp.asarray(f), jnp.asarray(f), eps=1e-12)

    K, M = fem.assemble(n, coefficients=(1.0,))
    A = M + dt * K
    b = M @ u_n.reshape(-1) + dt * (M @ f.reshape(-1))
    bids, iids = fem.boundary_interior_ids(n)
    u_ref = np.zeros((n + 1) * (n + 1))
    u_ref[iids] = np.linalg.solve(A[np.ix_(iids, iids)], b[iids])
    np.testing.assert_allclose(
        np.asarray(u1).reshape(-1)[iids], u_ref[iids], atol=1e-9
    )


def test_heat_mode_decay_rate():
    """First Dirichlet Laplace eigenmode on [-1,1]^2 decays like
    exp(-lambda t), lambda = pi^2/2 (two half-waves of pi/2 each)."""
    n = 32
    dt = 0.002
    problem = Problem(n=n, dtype=jnp.float64)
    solver = heat.HeatSolver(problem, dt, theta=0.5)  # Crank-Nicolson
    x = np.linspace(-1, 1, n + 1)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    mode = np.cos(np.pi * xx / 2.0) * np.cos(np.pi * yy / 2.0)
    lam = (np.pi / 2.0) ** 2 * 2.0
    steps = 25
    u = solver.run(jnp.asarray(mode), lambda t: jnp.zeros((n + 1, n + 1)), 0.0, steps)
    decay = float(np.asarray(u)[n // 2, n // 2] / mode[n // 2, n // 2])
    expected = np.exp(-lam * dt * steps)
    assert abs(decay - expected) < 0.01 * expected + 5e-3, (decay, expected)


def test_affine_bitplane_matches_gather_table():
    """The heat system's gather-free affine-bitplane apply (base stencil +
    phase bitplanes) equals the general (16,3,3)-table gather apply."""
    import jax
    from multigrid_feanet_tpu.core.problem import Problem
    from multigrid_feanet_tpu.ops import heat, stencil

    prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float64)
    hier = heat.heat_system_hierarchy(prob, dt=0.01, theta=0.5)
    for lv in hier.levels[:2]:
        assert lv.base is not None and lv.a0 is None  # affine path active
        u = jax.random.normal(jax.random.PRNGKey(0),
                              (lv.n + 1, lv.n + 1), jnp.float64)
        got = lv.apply(u)
        want = stencil.apply_stencil(lv.table, lv.pid, u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)
