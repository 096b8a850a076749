"""Tests for the fully-fused round-2 Pallas V-cycle solver
(solvers/pallas_mg2.py) against the round-1 mixed Pallas/XLA solver.

Exact residual-history parity at small magnitudes is not expected between
the element-factored kernel and the bitplane ops (different f32 summation
orders amplify once the residual is tiny, especially with the 20:1
coefficient contrast); the contract is: identical cycle counts, early-cycle
parity at f32 accuracy, bounded per-entry ratio throughout, and matching
solutions.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
@pytest.mark.parametrize("nlev,direct", [(None, False), (4, True)],
                         ids=["fulldepth", "truncated_direct"])
def test_v2_solve_matches_v1(bim, nlev, direct):
    prob = Problem(n=64, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
    hier = GridHierarchy.create(prob, nlev)
    ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True,
                          direct_coarse=direct)
    ph2 = PallasHierarchyV2(prob, num_levels=nlev, pallas_threshold=16,
                            rows=32, interpret=True, direct_coarse=direct)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((65, 65)), jnp.float32)
    u1, h1 = ph1.solve(f, eps=1e-3, max_cycles=40)
    u2, h2 = ph2.solve(f, eps=1e-3, max_cycles=40)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    # rounding-order differences near the eps threshold may cost one cycle
    assert abs(len(h1) - len(h2)) <= 1
    assert len(h1) < 40 and len(h2) < 40  # converged, not maxed
    m = min(len(h1), len(h2))
    # early cycles agree at f32 accuracy; later entries stay within a
    # bounded ratio as rounding-order differences amplify
    assert abs(h1[0] - h2[0]) / h1[0] < 1e-4
    assert np.all(h2[:m] / h1[:m] > 0.6) and np.all(h2[:m] / h1[:m] < 1.6)
    # v2's returned u includes one extra (post-detection) cycle; both match
    # the fixed point to f32 solve accuracy
    scale = float(np.max(np.abs(u1)))
    assert float(np.max(np.abs(np.asarray(u1) - np.asarray(u2)))) / scale < 5e-3


def test_v2_nonzero_bc():
    """Nonzero scalar Dirichlet data: v2 matches v1 cycle-for-cycle."""
    prob = Problem(n=32, inclusion=None)
    hier = GridHierarchy.create(prob)
    ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True)
    ph2 = PallasHierarchyV2(prob, pallas_threshold=16, rows=32, interpret=True,
                            direct_coarse=False)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
    u1, h1 = ph1.solve(f, bc_value=0.7, eps=1e-3, max_cycles=30)
    u2, h2 = ph2.solve(f, bc_value=0.7, eps=1e-3, max_cycles=30)
    assert len(h1) == len(h2)
    assert np.allclose(np.asarray(u1), np.asarray(u2), atol=5e-3)
    # boundary ring carries the Dirichlet value
    assert np.allclose(np.asarray(u2)[0, :], 0.7, atol=1e-6)


def test_v2_v21_cycle():
    """V(2,1): odd sweep count per cycle (carry slots swap; correctness
    must not depend on the donation parity)."""
    prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5))
    hier = GridHierarchy.create(prob)
    ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True)
    ph2 = PallasHierarchyV2(prob, pallas_threshold=16, rows=32, interpret=True,
                            direct_coarse=False)
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
    u1, h1 = ph1.solve(f, nu1=2, nu2=1, eps=1e-3, max_cycles=30)
    u2, h2 = ph2.solve(f, nu1=2, nu2=1, eps=1e-3, max_cycles=30)
    assert len(h1) == len(h2)
    assert abs(h1[0] - h2[0]) / h1[0] < 1e-4


def test_v2_solve_pcg_accelerates_and_reports_true_residual():
    """Scalar MG-preconditioned flexible CG (pallas_mg2.solve_pcg, the
    scalar twin of elastic.solve_pcg): converges to the target on the
    bi-material interface problem, its history IS the true residual
    (residual replacement every iteration), and it needs at most ~60% of
    the plain V(1,1) cycle count (Krylov acceleration contracts ~sqrt of
    the cycle's error factor per iteration)."""
    prob = Problem(n=64, inclusion=("circle", (0.0, 0.0), 0.5))
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    rng = np.random.default_rng(3)
    lv0 = ph.hier.finest
    f = jnp.asarray(rng.standard_normal((65, 65)), jnp.float32) * lv0.geo
    eps = 5e-3
    u, hist = ph.solve_pcg(f, eps=eps, max_iters=40)
    assert hist[-1] <= eps
    # history[-1] is the TRUE interior residual of the returned u
    r = (f - lv0.apply(u)) * lv0.geo
    true_res = float(jnp.sqrt(jnp.sum(jnp.asarray(r)[1:-1, 1:-1] ** 2)))
    # 1e-2 rtol: the element-factored kernel and the bitplane apply differ
    # in f32 summation order, which amplifies at small residual magnitudes
    # (a drifting recurrence would be orders of magnitude off)
    np.testing.assert_allclose(true_res, hist[-1], rtol=1e-2)
    _, h_plain = ph.solve(f, nu1=1, nu2=1, eps=eps, max_cycles=120)
    assert len(h_plain) < 120
    assert len(hist) <= max(2, int(0.6 * len(h_plain)) + 1)


def test_v2_solve_pcg_nonzero_bc_matches_vcycle_fixed_point():
    """solve_pcg with nonzero Dirichlet data converges to the same fixed
    point as the plain V-cycle solve (eps above the f32 CG floor: unlike
    the monotone V-cycle, CG's Krylov recurrences turn to noise at the
    floor — the breakdown guard stops them there)."""
    prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5))
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
    u1, _ = ph.solve(f, bc_value=0.7, eps=1e-4, max_cycles=60)
    u2, hist = ph.solve_pcg(f, bc_value=0.7, eps=1e-4, max_iters=60)
    assert hist[-1] <= 1e-4
    assert np.allclose(np.asarray(u2)[0, :], 0.7, atol=1e-6)
    assert np.allclose(np.asarray(u1), np.asarray(u2), atol=5e-4)


def test_v2_solve_pcg_breakdown_guard_stops_at_floor():
    """Pushed below the f32 floor (eps=0), CG must not run away: either
    the 4x divergence guard stops the loop early, or (with the
    difference-form kernels, whose floor noise is unbiased) the residual
    hovers stably at the floor.  Without guard+dform the residual climbed
    ~4000x above the floor (measured 0.073 from a 1.8e-5 best)."""
    prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5))
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
    _, hist = ph.solve_pcg(f, bc_value=0.7, eps=0.0, max_iters=60)
    hist = np.asarray(hist)
    assert hist[-1] <= 20.0 * hist.min()
    assert hist.max() == hist[0]  # monotone-ish: never climbs above start
