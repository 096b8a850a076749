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
