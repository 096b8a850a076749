"""Whole-solve tests for the fused Pallas BoxMG hierarchy
(solvers/pallas_boxmg.py) on the bi-material interface problem — the
problem class the operator-induced transfers exist for."""

import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.solvers.pallas_boxmg import PallasBoxMG
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

INC = ("circle", (0.0, 0.0), 0.5)


def _problem(n=64):
    return Problem(n=n, inclusion=INC)


def _f(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)


def test_boxmg_converges_and_beats_plain_vcycle():
    """Full-depth BoxMG V(1,1) on the interface problem (f=0 random-init
    decay — the floor-free protocol): converges with an h-robust factor
    (~0.3, the homogeneous problem's own ballpark) where the plain
    bilinear/FW hierarchy degrades (~0.5 at n=64)."""
    n = 64
    prob = _problem(n)
    bm = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True,
                     direct_coarse=True)
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    f0 = jnp.zeros((n + 1, n + 1), jnp.float32)
    u0 = _f(n) * bm.hier.finest.geo * 100.0
    u_b, h_b = bm.solve(f0, u0=u0, eps=1e-6, max_cycles=60)
    u_p, h_p = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=60)
    assert len(h_b) < 60 and len(h_p) < 60
    assert len(h_b) < len(h_p)  # fewer cycles to the same eps
    # asymptotic-ish factor over the recorded tail
    q_b = float(np.exp(np.mean(np.diff(np.log(np.asarray(h_b)))[2:])))
    q_p = float(np.exp(np.mean(np.diff(np.log(np.asarray(h_p)))[2:])))
    assert q_b < 0.40, q_b
    assert q_b < q_p - 0.05, (q_b, q_p)


def test_boxmg_history_is_true_residual_sequence():
    """The free-residual history equals the true interior residual of the
    iterates (same convention as PallasHierarchyV2): check the returned
    u's residual is at least as converged as history[-1]."""
    n = 64
    prob = _problem(n)
    bm = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True)
    f = _f(n, 1)
    u, hist = bm.solve(f, eps=5e-3, max_cycles=60)
    lv0 = bm.hier.finest
    r = (f - lv0.apply(u)) * lv0.geo
    res = float(jnp.sqrt(jnp.sum(jnp.asarray(r)[1:-1, 1:-1] ** 2)))
    assert res <= hist[-1] * 1.01


def test_boxmg_threshold_invariance():
    """Pallas/XLA handoff depth must not change the math: identical
    early history across pallas_threshold settings."""
    n = 64
    prob = _problem(n)
    f = _f(n, 2)
    hists = []
    for thr in (16, 48):
        bm = PallasBoxMG(prob, pallas_threshold=thr, rows=32, interpret=True,
                         direct_coarse=False)
        _, h = bm.solve(f, eps=5e-3, max_cycles=40)
        hists.append(np.asarray(h))
    m = min(len(hists[0]), len(hists[1]))
    assert abs(len(hists[0]) - len(hists[1])) <= 1
    np.testing.assert_allclose(hists[0][:m], hists[1][:m], rtol=2e-2)


def test_boxmg_pcg_accelerates():
    n = 64
    prob = _problem(n)
    bm = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True)
    f = _f(n, 3) * bm.hier.finest.geo
    eps = 5e-3
    u, hp = bm.solve_pcg(f, eps=eps, max_iters=40)
    assert hp[-1] <= eps
    _, hv = bm.solve(f, eps=eps, max_cycles=60)
    assert len(hp) <= len(hv)
    lv0 = bm.hier.finest
    r = (f - lv0.apply(u)) * lv0.geo
    res = float(jnp.sqrt(jnp.sum(jnp.asarray(r)[1:-1, 1:-1] ** 2)))
    np.testing.assert_allclose(res, hp[-1], rtol=1e-2)


def test_boxmg_bf16_coefficient_streams_still_converge():
    """bf16 S9/W4 storage perturbs the cycle, not the fixed point: the
    solve still reaches eps with at most a few extra cycles."""
    n = 64
    prob = _problem(n)
    f = _f(n, 4)
    bm32 = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True)
    bm16 = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True,
                       coef_dtype=jnp.bfloat16)
    u32, h32 = bm32.solve(f, eps=5e-3, max_cycles=60)
    u16, h16 = bm16.solve(f, eps=5e-3, max_cycles=60)
    assert len(h16) < 60
    assert len(h16) <= len(h32) + 4
    scale = float(np.max(np.abs(np.asarray(u32))))
    assert float(np.max(np.abs(np.asarray(u32) - np.asarray(u16)))) / scale < 1e-2


def test_boxmg_nu21_and_nonzero_bc():
    """V(2,1) (odd sweep parity) and nonzero Dirichlet data."""
    n = 32
    prob = _problem(n)
    bm = PallasBoxMG(prob, pallas_threshold=16, rows=32, interpret=True)
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    f = _f(n, 5)
    u_b, h_b = bm.solve(f, bc_value=0.7, nu1=2, nu2=1, eps=1e-3,
                        max_cycles=60)
    u_p, _ = ph.solve(f, bc_value=0.7, eps=1e-3, max_cycles=80)
    assert h_b[-1] <= 1e-3
    assert np.allclose(np.asarray(u_b)[0, :], 0.7, atol=1e-6)
    scale = float(np.max(np.abs(np.asarray(u_p))))
    assert float(np.max(np.abs(np.asarray(u_b) - np.asarray(u_p)))) / scale < 1e-2
