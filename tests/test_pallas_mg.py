"""Fused Pallas-backed solvers vs the chunked XLA solvers (CPU interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import multigrid
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy


def _setup(n, inclusion, threshold):
    problem = Problem(n=n, inclusion=inclusion, dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    ph = PallasHierarchy(hier, pallas_threshold=threshold, interpret=True)
    lv = hier.finest
    f_raw = jnp.ones((n + 1, n + 1), dtype=jnp.float32)
    f = stencil.apply_mass(f_raw, lv.h)
    return hier, ph, f


@pytest.mark.parametrize("threshold", [16, 10_000])  # pallas levels vs all-XLA
def test_fused_vcycle_matches_chunked_solver(threshold):
    n = 32
    hier, ph, f = _setup(n, ("circle", (0.0, 0.0), 0.5), threshold)
    u_ref, hist_ref = multigrid.solve(hier, f, nu1=1, nu2=1, eps=5e-5)
    u, hist = ph.solve(f, nu1=1, nu2=1, eps=5e-5)
    assert len(hist) == len(hist_ref)
    np.testing.assert_allclose(hist, hist_ref, rtol=6e-2)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=1e-3, atol=1e-5)


def test_fused_vcycle_mixed_backends():
    # threshold between coarsest and finest: both kinds of level in one cycle
    n = 64
    hier, ph, f = _setup(n, None, 32)
    assert ph.ps[0] is not None and ph.ps[-1] is None
    u_ref, hist_ref = multigrid.solve(hier, f, nu1=1, nu2=1, eps=1e-5)
    u, hist = ph.solve(f, nu1=1, nu2=1, eps=1e-5)
    assert len(hist) == len(hist_ref)
    np.testing.assert_allclose(hist, hist_ref, rtol=6e-2)


def test_fused_jacobi_iteration_count():
    n = 16
    hier, ph, f = _setup(n, None, 8)
    from multigrid_feanet_tpu.solvers import jacobi

    u_ref, hist_ref = jacobi.solve_jacobi(hier.finest, f, eps=1e-5)
    u, iters, res = ph.solve_jacobi(f, eps=1e-5)
    # pallas convergence test uses the lagged free residual -> at most one
    # extra sweep vs the reference convention
    assert abs(iters - len(hist_ref)) <= 1
    assert res <= 1e-5 * 1.01 or iters > len(hist_ref)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=5e-5)


def test_iterative_refinement_breaks_f32_floor():
    """f32 V-cycles stall at the rounding floor; mixed-precision IR reaches
    absolute residuals far below it (f64 residual, f32 corrections)."""
    from multigrid_feanet_tpu.solvers import pallas_mg

    n = 64
    hier, ph, f = _setup(n, None, 32)
    # plain f32 solve: find its floor
    _, hist32 = ph.solve(f, nu1=2, nu2=2, eps=1e-12, max_cycles=60)
    floor32 = hist32[-1]
    u, hist_ir = pallas_mg.solve_ir(ph, f, nu1=2, nu2=2, eps=1e-11, max_outer=30)
    assert hist_ir[-1] <= 1e-11, hist_ir
    assert hist_ir[-1] < floor32 / 10.0
    # solution matches the f64 oracle
    import numpy as np
    from multigrid_feanet_tpu.data import fem

    u_ref = fem.solve_dirichlet(n, np.ones((n + 1, n + 1)), coefficients=(1.0,))
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)


def test_fused_jacobi_solver():
    n = 16
    hier, ph, f = _setup(n, None, 8)
    u1, it1, res1 = ph.solve_jacobi(f, eps=1e-5)
    u4, it4, res4 = ph.solve_jacobi(f, eps=1e-5, fuse=4)
    assert abs(it4 - it1) <= 4
    assert res4 <= 1e-5 * 1.05
    np.testing.assert_allclose(np.asarray(u4), np.asarray(u1), atol=1e-5)
