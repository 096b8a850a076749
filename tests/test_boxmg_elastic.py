"""Block-BoxMG for the elastic system (ops/boxmg_elastic.py +
solvers/elastic_boxmg.py): algebraic identities, bitplane-stencil parity,
and the convergence claim — operator-induced block transfers restore the
interface factor that bilinear transfers lose."""

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import boxmg_elastic as be
from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.solvers import elastic as es
from multigrid_feanet_tpu.solvers.elastic_boxmg import ElasticBoxMG

E, NU = 212e3, 0.288  # Plane_Stress_modify.m:11-12
INC = ("circle", (0.0, 0.0), 0.5)


def _levels(n=32, dtype=jnp.float64):
    return es.build_elastic_hierarchy(
        n, E, NU, inclusion=INC, coefficients=(1.0, 20.0), dtype=dtype)


def test_elastic_node_stencils_match_gather():
    levels = _levels(16)
    lv = levels[0]
    S_bit = np.asarray(be.elastic_node_stencils(lv, jnp.float64))
    S_gather = np.asarray(el.pattern_block_table(lv.table, lv.pid),
                          np.float64)
    np.testing.assert_allclose(S_bit, S_gather, rtol=1e-12, atol=1e-9)


def test_block_restrict_is_exact_transpose():
    levels = _levels(32)
    S = be.elastic_node_stencils(levels[0], jnp.float64)
    W4 = be.elastic_transfer_weights(S, levels[0].geo, levels[1].geo)
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.standard_normal((2, 17, 17)))
    r = jnp.asarray(rng.standard_normal((2, 33, 33)))
    lhs = float(jnp.sum(be.prolong_w4_e(uc, W4) * r))
    rhs = float(jnp.sum(uc * be.restrict_w4_e(r, W4)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_block_galerkin_variational_identity():
    levels = _levels(32)
    S = be.elastic_node_stencils(levels[0], jnp.float64)
    W4 = be.elastic_transfer_weights(S, levels[0].geo, levels[1].geo)
    Sc = be.galerkin_rap_e(S, W4)
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.standard_normal((2, 17, 17)))
    vc = jnp.asarray(rng.standard_normal((2, 17, 17)))
    lhs = float(jnp.sum(be.apply_block_s9(Sc, uc) * vc))
    Pu, Pv = be.prolong_w4_e(uc, W4), be.prolong_w4_e(vc, W4)
    rhs = float(jnp.sum(be.apply_block_s9(S, Pu) * Pv))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-11)


def test_block_apply_matches_level_apply():
    """apply_block_s9 of the bitplane stencil field == ElasticLevel.apply
    at interior nodes."""
    levels = _levels(16)
    lv = levels[0]
    S = be.elastic_node_stencils(lv, jnp.float64)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((2, 17, 17)))
    y1 = np.asarray(be.apply_block_s9(S, u))[:, 1:-1, 1:-1]
    y2 = np.asarray(lv.apply(u))[:, 1:-1, 1:-1]
    np.testing.assert_allclose(y1, y2, rtol=1e-9, atol=1e-9)


def test_elastic_boxmg_beats_plain_vcycle():
    """f=0 random-init decay at n=64 (f64 — the factor measurement):
    block-BoxMG W(2,2) holds the two-grid factor (~0.43, measured
    h-independent at n=64/128) where the plain bilinear V(2,2) hierarchy
    degrades to ~0.82.  (The V-cycle variant compounds the coarse
    interface problems' own difficulty — 0.43 two-grid -> 0.80 at full
    depth — hence gamma=2; closing the remaining gap to the homogeneous
    0.29 needs rigid-body-aware coarsening, a documented limitation.)"""
    n = 64
    levels = _levels(n, dtype=jnp.float64)
    bm = ElasticBoxMG(levels, direct_coarse=True)
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((2, n + 1, n + 1))) * levels[0].geo[None]
    f0 = jnp.zeros((2, n + 1, n + 1), jnp.float64)
    u_b, h_b = bm.solve(f0, u0=u0, nu1=2, nu2=2, eps=1e-8, max_cycles=80,
                        gamma=2)
    u_p, h_p = es.solve(levels, f0, u0=u0, nu1=2, nu2=2, eps=1e-8,
                        max_cycles=80)
    assert len(h_b) < 80
    assert len(h_b) < len(h_p)
    q_b = float(np.exp(np.mean(np.diff(np.log(h_b))[-6:])))
    q_p = float(np.exp(np.mean(np.diff(np.log(h_p))[-6:])))
    assert q_b < q_p - 0.2, (q_b, q_p)
    assert q_b < 0.5, q_b


def test_elastic_boxmg_homogeneous_depth_stable():
    """On the homogeneous problem the block weights reduce to the
    bilinear-quality pair: full-depth V(2,2) factor matches the plain
    hierarchy's (~0.29) — the machinery adds nothing spurious."""
    n = 64
    levels = es.build_elastic_hierarchy(n, E, NU, inclusion=None,
                                        coefficients=(1.0, 20.0),
                                        dtype=jnp.float64)
    bm = ElasticBoxMG(levels, direct_coarse=True)
    rng = np.random.default_rng(4)
    u0 = jnp.asarray(rng.standard_normal((2, n + 1, n + 1))) * levels[0].geo[None]
    f0 = jnp.zeros((2, n + 1, n + 1), jnp.float64)
    _, h_b = bm.solve(f0, u0=u0, nu1=2, nu2=2, eps=1e-10, max_cycles=60)
    q_b = float(np.exp(np.mean(np.diff(np.log(h_b))[-6:])))
    assert q_b < 0.33, q_b
