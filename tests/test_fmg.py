"""Coarse-grid direct solve (solvers/coarse.py) and full multigrid (fmg).

Capabilities beyond the reference (its V-cycle is relax-only at the coarsest
level and always starts from zero/random inits — MM_Model_convergence.ipynb
cell 3); these tests pin down exactness of the dense coarse solve, the
truncated-hierarchy convergence factor, and that one FMG pass is worth
multiple fine-level V-cycles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import coarse, multigrid
from multigrid_feanet_tpu.solvers.jacobi import interior_norm
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy

INTERFACE = ("circle", (0.0, 0.0), 0.5)


def test_coarse_direct_solve_exact():
    # bi-material level: A (dense, from the stencil table) vs coarse_solve
    lv = GridHierarchy.create(
        Problem(n=8, inclusion=INTERFACE, dtype=jnp.float64)
    ).finest
    rng = np.random.default_rng(0)
    f = jnp.zeros((9, 9), jnp.float64).at[1:-1, 1:-1].set(
        rng.standard_normal((7, 7))
    )
    inv = coarse.coarse_inverse(lv, dtype=jnp.float64)
    u = coarse.coarse_solve(inv, f)
    # boundary stays exactly zero
    assert float(jnp.abs(u * (1.0 - lv.geo)).max()) == 0.0
    r = f - lv.apply(u)
    assert float(interior_norm(r)) < 1e-10


def test_dense_interior_matrix_matches_operator_apply():
    lv = GridHierarchy.create(
        Problem(n=8, inclusion=INTERFACE, dtype=jnp.float64)
    ).finest
    A = coarse.dense_interior_matrix(lv)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((7, 7))
    xg = jnp.zeros((9, 9), jnp.float64).at[1:-1, 1:-1].set(x)
    via_stencil = np.asarray(lv.apply(xg))[1:-1, 1:-1].ravel()
    np.testing.assert_allclose(A @ x.ravel(), via_stencil, rtol=1e-12, atol=1e-12)


def test_truncated_hierarchy_direct_coarse_restores_q():
    # n=64 Poisson with only 3 levels (coarsest n=16).  Relax-only coarsest
    # stalls (q ~ 1); the direct coarse solve restores the full-depth
    # convergence factor (~0.26 for V(1,1), MM_Model_convergence cell 5).
    problem = Problem(n=64, dtype=jnp.float32)
    hier = GridHierarchy.create(problem, num_levels=3)
    key = jax.random.PRNGKey(0)
    u0 = jax.random.uniform(key, (65, 65), jnp.float32)
    u0 = u0 * hier.finest.geo
    f = jnp.zeros((65, 65), jnp.float32)

    _, hist_relax = multigrid.solve(hier, f, u0=u0, eps=None, max_cycles=12)
    q_relax = float(hist_relax[-1] / hist_relax[-2])

    inv = coarse.coarse_inverse(hier.levels[-1])
    _, hist_direct = multigrid.solve(
        hier, f, u0=u0, eps=None, max_cycles=12, coarse_inv=inv
    )
    q_direct = float(hist_direct[-1] / hist_direct[-2])

    assert q_direct < 0.30, q_direct
    assert q_direct < q_relax - 0.1, (q_direct, q_relax)


def test_fmg_beats_vcycles_from_zero():
    # one FMG(1 cycle/level) pass vs the same number of finest-level V-cycles
    # from zero: FMG must land at a lower residual.
    problem = Problem(n=64, inclusion=INTERFACE, dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    F = jnp.ones((65, 65), jnp.float32)
    f = stencil.apply_mass(F, hier.finest.h)

    u_fmg = multigrid.fmg(hier, f, nu1=1, nu2=1, cycles_per_level=1)
    res_fmg = float(interior_norm(f - hier.finest.apply(u_fmg)))

    u_v, hist = multigrid.solve(hier, f, eps=None, max_cycles=1)
    res_v1 = float(hist[-1])
    assert res_fmg < res_v1, (res_fmg, res_v1)


def test_fmg_then_vcycles_solves_to_tolerance():
    # f64: nonzero-f absolute tolerances below the f32 rounding floor
    problem = Problem(n=64, dtype=jnp.float64)
    hier = GridHierarchy.create(problem, num_levels=4)
    inv = coarse.coarse_inverse(hier.levels[-1], dtype=jnp.float64)
    F = jnp.ones((65, 65), jnp.float64)
    f = stencil.apply_mass(F, hier.finest.h)
    u = multigrid.fmg(hier, f, cycles_per_level=1, coarse_inv=inv)
    u, hist = multigrid.solve(hier, f, u0=u, eps=1e-9, max_cycles=30, coarse_inv=inv)
    assert hist[-1] <= 1e-9
    # truncated+direct solve is worth ~2 V-cycles of head start: reaching
    # 1e-9 from the FMG iterate takes clearly fewer cycles than from zero
    _, hist0 = multigrid.solve(hier, f, eps=1e-9, max_cycles=40, coarse_inv=inv)
    assert len(hist) <= len(hist0) - 2, (len(hist), len(hist0))
    # cross-check against the plain full-depth solve
    hier_full = GridHierarchy.create(problem)
    u_ref, _ = multigrid.solve(hier_full, f, eps=1e-10, max_cycles=60)
    assert float(jnp.abs(u - u_ref).max()) < 1e-8


def test_fmg_nonzero_scalar_bc_matches_vcycle_solve():
    problem = Problem(n=32, dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    F = jnp.ones((33, 33), jnp.float32)
    f = stencil.apply_mass(F, hier.finest.h)
    bc = 0.7
    u = multigrid.fmg(hier, f, cycles_per_level=1, bc_value=bc)
    u, hist = multigrid.solve(hier, f, u0=u, bc_value=bc, eps=1e-7, max_cycles=40)
    u_ref, _ = multigrid.solve(hier, f, bc_value=bc, eps=1e-7, max_cycles=60)
    assert float(jnp.abs(u - u_ref).max()) < 1e-4
    # boundary carries the BC value exactly
    assert float(jnp.abs(u[0, :] - bc).max()) == 0.0


def test_pallas_hierarchy_direct_coarse_interpret():
    # PallasHierarchy (interpret mode on CPU) with a truncated hierarchy +
    # direct coarse solve matches the XLA-path solve cycle-for-cycle.
    # f = 0, random init — the reference's own decay protocol, which reaches
    # arbitrary absolute tolerances in f32 (no rounding floor).
    problem = Problem(n=64, inclusion=INTERFACE, dtype=jnp.float32)
    hier = GridHierarchy.create(problem, num_levels=3)
    inv = coarse.coarse_inverse(hier.levels[-1])
    f = jnp.zeros((65, 65), jnp.float32)
    u0 = jax.random.uniform(jax.random.PRNGKey(0), (65, 65), jnp.float32)
    u0 = u0 * hier.finest.geo

    ph = PallasHierarchy(hier, pallas_threshold=64, interpret=True,
                         direct_coarse=True)
    u_p, hist_p = ph.solve(f, u0=u0, eps=1e-6, max_cycles=40)
    u_x, hist_x = multigrid.solve(hier, f, u0=u0, eps=1e-6, max_cycles=40,
                                  coarse_inv=inv)
    assert hist_p[-1] <= 1e-6 and hist_x[-1] <= 1e-6
    assert abs(len(hist_p) - len(hist_x)) <= 1
    k = min(len(hist_p), len(hist_x))
    np.testing.assert_allclose(hist_p[:k], hist_x[:k], rtol=1e-3)
