"""Solver correctness and convergence-factor parity with the reference.

Parity anchors (BASELINE.md):
- V(1,1) convergence factor q ~ 0.2590 at n=2^6 (h-independent ~0.26),
  reference MM_Model_convergence.ipynb cell 5.
- Schedule sweep at n=2^6: V(1,2) q~0.160, V(2,2) q~0.113 (cells 9-17).
- Weighted-Jacobi q at small n: 0.3333 (n=2), 0.7357 (n=4) (cell 6).
- Solutions must converge to the dense-FEM oracle solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi, multigrid


def _hier(n, inclusion=None, dtype=jnp.float32):
    return GridHierarchy.create(Problem(n=n, inclusion=inclusion, dtype=dtype))


def _random_init(n, key=0, dtype=jnp.float32):
    """Reference-style random initial guess: coef0 * U(0,1) + coef1 with
    coef ~ 1e5 (MM_Model_convergence.ipynb cell 3 random_data)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    coef = 100000.0 + 50000.0 * jax.random.uniform(k1, (2,))
    return (coef[0] * jax.random.uniform(k2, (n + 1, n + 1)) + coef[1]).astype(dtype)


def test_jacobi_converges_to_fem_oracle():
    n = 16
    hier = _hier(n, dtype=jnp.float64)
    lv = hier.finest
    rng = np.random.default_rng(0)
    f_raw = rng.standard_normal((n + 1, n + 1))
    f = stencil.apply_mass(jnp.asarray(f_raw), lv.h)
    u, hist = jacobi.solve_jacobi(lv, f, eps=1e-12, max_iters=100_000, chunk=2048)
    u_ref = fem.solve_dirichlet(n, f_raw)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)
    assert hist[-1] <= 1e-12
    # residual history is monotone decreasing after the first few sweeps
    assert np.all(np.diff(hist[5:]) <= 1e-15)


def test_jacobi_q_small_grids():
    # reference: q = 0.3333 (n=2), 0.7357 (n=4) for the homogeneous problem
    for n, q_ref in [(2, 0.3333), (4, 0.7357)]:
        hier = _hier(n)
        f = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
        u0 = _random_init(n)
        _, hist = jacobi.solve_jacobi(hier.finest, f, u0=u0, eps=1e-5, chunk=64)
        q = multigrid.convergence_factor(hist)
        assert abs(q - q_ref) < 0.01, (n, q)


def test_vcycle_q_homogeneous_parity_and_h_independence():
    # reference q values: n=16: 0.2362, n=32: 0.2522, n=64: 0.2590
    qs = {}
    for n, q_ref in [(16, 0.2362), (32, 0.2522), (64, 0.2590)]:
        hier = _hier(n)
        f = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
        u0 = _random_init(n, key=n)
        _, hist = multigrid.solve(hier, f, u0=u0, nu1=1, nu2=1, eps=1e-6)
        qs[n] = multigrid.convergence_factor(hist)
        assert abs(qs[n] - q_ref) < 0.015, (n, qs[n], q_ref)
    # h-independence: q grows but stays bounded ~0.26
    assert qs[16] < qs[32] < qs[64] < 0.27


def test_vcycle_schedule_sweep():
    # reference (n=2^6): V(1,2) 0.1597, V(2,2) 0.1127, V(0,1) 0.4941
    n = 64
    f = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
    hier = _hier(n)
    for (nu1, nu2), q_ref in [((1, 2), 0.1597), ((2, 2), 0.1127), ((0, 1), 0.4941)]:
        u0 = _random_init(n, key=10 * nu1 + nu2)
        _, hist = multigrid.solve(hier, f, u0=u0, nu1=nu1, nu2=nu2, eps=1e-6)
        q = multigrid.convergence_factor(hist)
        assert abs(q - q_ref) < 0.02, ((nu1, nu2), q, q_ref)


def test_vcycle_converges_to_fem_oracle_interface():
    n = 32
    hier = _hier(n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float64)
    lv = hier.finest
    f_raw = jnp.ones((n + 1, n + 1), dtype=jnp.float64)
    f = stencil.apply_mass(f_raw, lv.h)
    u, hist = multigrid.solve(hier, f, nu1=2, nu2=2, eps=1e-12, max_cycles=200)
    from multigrid_feanet_tpu.core import geometry as geo

    phase = geo.circle_phase(2.0, n)
    u_ref = fem.solve_dirichlet(n, np.ones((n + 1, n + 1)), phase=phase)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-10)


def test_vcycle_nonzero_dirichlet_bc():
    n = 16
    hier = _hier(n, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    bc = np.zeros((n + 1, n + 1))
    bc[0, :] = rng.standard_normal(n + 1)
    bc[-1, :] = rng.standard_normal(n + 1)
    bc[:, 0] = rng.standard_normal(n + 1)
    bc[:, -1] = rng.standard_normal(n + 1)
    f_raw = rng.standard_normal((n + 1, n + 1))
    f = stencil.apply_mass(jnp.asarray(f_raw), hier.finest.h)
    u, _ = multigrid.solve(
        hier, f, bc_value=jnp.asarray(bc), nu1=2, nu2=2, eps=1e-12, max_cycles=200
    )
    u_ref = fem.solve_dirichlet(n, f_raw, bc_value=bc)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)


def test_transfer_operators():
    from multigrid_feanet_tpu.ops import transfer

    # restriction of a constant interior field: interior coarse nodes keep the
    # value (full weighting is an average), boundary ring is zero
    r = jnp.ones((17, 17))
    rc = np.asarray(transfer.restrict_full_weighting(r))
    assert rc.shape == (9, 9)
    np.testing.assert_allclose(rc[2:-2, 2:-2], 1.0, atol=1e-12)
    np.testing.assert_allclose(rc[0], 0.0)
    # prolongation injects at coincident nodes and averages midpoints
    v = jnp.asarray(np.arange(9.0).reshape(3, 3))
    p = np.asarray(transfer.prolong_bilinear(v))
    assert p.shape == (5, 5)
    np.testing.assert_allclose(p[::2, ::2], np.asarray(v))
    np.testing.assert_allclose(p[1, 0], 0.5 * (v[0, 0] + v[1, 0]))
    np.testing.assert_allclose(p[1, 1], 0.25 * (v[0, 0] + v[0, 1] + v[1, 0] + v[1, 1]))
    # adjointness up to the classical factor 4: <R r, v>_c = 1/4 <r, P v>_f
    # for interior-supported fields
    rng = np.random.default_rng(7)
    fine = np.zeros((17, 17))
    fine[1:-1, 1:-1] = rng.standard_normal((15, 15))
    coarse = np.zeros((9, 9))
    coarse[1:-1, 1:-1] = rng.standard_normal((7, 7))
    lhs = np.vdot(np.asarray(transfer.restrict_full_weighting(jnp.asarray(fine))), coarse)
    geo_fine = np.zeros((17, 17))
    geo_fine[1:-1, 1:-1] = 1.0
    rhs = np.vdot(fine, np.asarray(transfer.prolong_bilinear(jnp.asarray(coarse), jnp.asarray(geo_fine))))
    np.testing.assert_allclose(lhs, rhs / 4.0, rtol=1e-10)
