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


def test_pallas_heat_solve_matches_xla():
    """pallas_heat_hierarchy (fused kernels + mass triple) solves the
    theta-system to the same cycle count / solution as multigrid.solve on
    heat_system_hierarchy (interpret mode)."""
    import jax
    from multigrid_feanet_tpu.solvers import multigrid

    n, dt, theta = 64, 0.05, 1.0
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float32)
    sys = heat.heat_system_hierarchy(prob, dt, theta)
    ph = heat.pallas_heat_hierarchy(prob, dt, theta, pallas_threshold=16,
                                    rows=32, interpret=True)
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    u1, h1 = multigrid.solve(sys, f, eps=1e-4, max_cycles=30)
    u2, h2 = ph.solve(f, eps=1e-4, max_cycles=30)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert abs(len(h1) - len(h2)) <= 1
    assert len(h2) < 30
    m = min(len(h1), len(h2))
    # element-factored vs affine-bitplane f32 reassociation: per-cycle
    # residuals agree to ~1e-3 early and stay within a bounded ratio
    assert abs(h1[0] - h2[0]) / h1[0] < 5e-3
    assert np.all(h2[:m] / h1[:m] > 0.6) and np.all(h2[:m] / h1[:m] < 1.6)
    scale = max(float(np.max(np.abs(np.asarray(u1)))), 1e-9)
    assert float(np.max(np.abs(np.asarray(u1) - np.asarray(u2)))) / scale < 5e-3


def test_heatsolver_pallas_backend_step():
    """HeatSolver(backend='pallas') takes the same implicit step as the XLA
    backend (interpret mode via a small pallas_threshold hierarchy)."""
    n, dt = 64, 0.05
    prob = Problem(n=n, dtype=jnp.float32)
    sx = heat.HeatSolver(prob, dt, theta=1.0)
    sp_ = heat.HeatSolver(prob, dt, theta=1.0, backend="pallas",
                          pallas_kw=dict(pallas_threshold=16, rows=32,
                                         interpret=True))
    rng = np.random.default_rng(7)
    u_n = np.zeros((n + 1, n + 1), np.float32)
    u_n[1:-1, 1:-1] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    u_x, _ = sx.step(jnp.asarray(u_n), f, f, eps=1e-8)
    u_p, _ = sp_.step(jnp.asarray(u_n), f, f, eps=1e-8)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x),
                               atol=2e-5)


def test_march_matches_step_loop():
    """march (one-jit lax.scan, fixed cycles/step) matches the per-step
    adaptive-eps loop, for constant and per-knot time-dependent sources."""
    n, dt, steps = 32, 0.002, 6
    prob = Problem(n=n, dtype=jnp.float32)
    s = heat.HeatSolver(prob, dt, theta=0.5)
    x = np.linspace(-1, 1, n + 1)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    mode = jnp.asarray(np.cos(np.pi * xx / 2) * np.cos(np.pi * yy / 2),
                       jnp.float32)
    f = jnp.asarray(np.cos(np.pi * xx) * np.cos(np.pi * yy), jnp.float32)
    u_loop = s.run(mode, lambda t: f, 0.0, steps, eps=1e-9)
    u_march = s.march(mode, f, steps, cycles_per_step=4)
    np.testing.assert_allclose(np.asarray(u_march), np.asarray(u_loop),
                               atol=2e-5)
    fs = jnp.broadcast_to(f, (steps + 1,) + f.shape)
    u_td = s.march(mode, fs, steps, cycles_per_step=4)
    np.testing.assert_allclose(np.asarray(u_td), np.asarray(u_march),
                               atol=1e-6)


def test_march_pallas_matches_xla():
    """Pallas-backend march equals the XLA-backend march (same fixed
    cycle schedule; f32 kernel reassociation tolerance)."""
    n, dt, steps = 64, 0.01, 4
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float32)
    sx = heat.HeatSolver(prob, dt, theta=1.0)
    # direct_coarse=False: the XLA march runs relax-only at the coarsest
    # level, so the Pallas hierarchy must too for iterate-for-iterate parity
    sp_ = heat.HeatSolver(prob, dt, theta=1.0, backend="pallas",
                          pallas_kw=dict(pallas_threshold=16, rows=32,
                                         interpret=True, direct_coarse=False))
    rng = np.random.default_rng(11)
    u0 = np.zeros((n + 1, n + 1), np.float32)
    u0[1:-1, 1:-1] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    ux = sx.march(jnp.asarray(u0), f, steps, cycles_per_step=2)
    up = sp_.march(jnp.asarray(u0), f, steps, cycles_per_step=2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ux), atol=5e-5)
