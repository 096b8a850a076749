"""Device-side BoxMG setup (ops/boxmg.py) — correctness of the composed W4
transfer representation and the one-jit Galerkin coarsening.

Validation is two-fold:
1. Self-validating algebraic identities that define the scheme:
   R = P^T (adjoint test) and the variational (Galerkin) identity
   <A_c u_c, v_c> = <A P u_c, P v_c> on zero-ring fields.
2. Equivalence with the research-scale module (ops/adaptive_transfer.py,
   itself validated against dense FEM and the reference protocol):
   level-0 transfers agree entrywise-on-action; the first Galerkin level
   agrees in operator action.  (Deeper levels legitimately differ near the
   boundary: ops/boxmg.py folds the Dirichlet elimination into the
   weights, the research module keeps ghost couplings that are nulled by
   the zero-ring contract — same action on the solve path at level 1, a
   slightly different, more principled operator at depth.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import adaptive_transfer as at_mod
from multigrid_feanet_tpu.ops import boxmg


def _hier(n=32, bim=True, dtype=jnp.float64):
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None,
                   dtype=dtype)
    return GridHierarchy.create(prob)


def _zero_ring(x):
    return x.at[0, :].set(0).at[-1, :].set(0).at[:, 0].set(0).at[:, -1].set(0)


def test_node_stencil_planes_matches_gather():
    hier = _hier(16)
    lv = hier.levels[0]
    S_bit = np.asarray(boxmg.node_stencil_planes(lv, jnp.float64))
    S_gather = np.asarray(at_mod.node_stencils(lv))
    np.testing.assert_allclose(S_bit, S_gather, atol=1e-12)


def test_w4_transfers_match_adaptive_transfer_level0():
    """prolong_w4 / restrict_w4 with the composed, geo-folded weights equal
    the research module's class-structured forms on zero-ring fields."""
    hier = _hier(32)
    lv0, lv1 = hier.levels[0], hier.levels[1]
    S = boxmg.node_stencil_planes(lv0, jnp.float64)
    W4 = boxmg.transfer_weights(S, lv0.geo, lv1.geo)
    at = at_mod.AdaptiveTransfer(np.asarray(S), lv0.geo, lv1.geo,
                                 dtype=jnp.float64)
    rng = np.random.default_rng(0)
    uc = _zero_ring(jnp.asarray(rng.standard_normal((17, 17))))
    np.testing.assert_allclose(np.asarray(boxmg.prolong_w4(uc, W4)),
                               np.asarray(at.prolong(uc)), atol=1e-12)
    r = jnp.asarray(rng.standard_normal((33, 33)))
    np.testing.assert_allclose(np.asarray(boxmg.restrict_w4(r, W4)),
                               np.asarray(at.restrict(r)), atol=1e-12)


def test_restrict_is_exact_transpose_of_prolong():
    """<P u_c, r> = <u_c, R r> for random fields — R = P^T exactly."""
    hier = _hier(32)
    lv0, lv1 = hier.levels[0], hier.levels[1]
    S = boxmg.node_stencil_planes(lv0, jnp.float64)
    W4 = boxmg.transfer_weights(S, lv0.geo, lv1.geo)
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.standard_normal((17, 17)))
    r = jnp.asarray(rng.standard_normal((33, 33)))
    lhs = float(jnp.sum(boxmg.prolong_w4(uc, W4) * r))
    rhs = float(jnp.sum(uc * boxmg.restrict_w4(r, W4)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_galerkin_variational_identity():
    """<A_c u_c, v_c> = <A (P u_c), (P v_c)> — the defining property of the
    Galerkin product, checked directly (no reference implementation)."""
    hier = _hier(32)
    lv0, lv1 = hier.levels[0], hier.levels[1]
    S = boxmg.node_stencil_planes(lv0, jnp.float64)
    W4 = boxmg.transfer_weights(S, lv0.geo, lv1.geo)
    Sc = boxmg.galerkin_rap(S, W4)
    rng = np.random.default_rng(2)
    uc = jnp.asarray(rng.standard_normal((17, 17)))
    vc = jnp.asarray(rng.standard_normal((17, 17)))
    lhs = float(jnp.sum(boxmg.apply_s9(Sc, uc) * vc))
    Pu, Pv = boxmg.prolong_w4(uc, W4), boxmg.prolong_w4(vc, W4)
    rhs = float(jnp.sum(boxmg.apply_s9(S, Pu) * Pv))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_galerkin_level1_action_matches_probe_module():
    """apply(Sc_device) == GeneralLevel(Sc_numpy).apply on zero-ring fields
    (entries coupling to the Dirichlet ring legitimately differ — they are
    unreachable on the solve path)."""
    hier = _hier(32)
    lv0, lv1 = hier.levels[0], hier.levels[1]
    S = boxmg.node_stencil_planes(lv0, jnp.float64)
    W4 = boxmg.transfer_weights(S, lv0.geo, lv1.geo)
    Sc = boxmg.galerkin_rap(S, W4)
    at = at_mod.AdaptiveTransfer(np.asarray(S), lv0.geo, lv1.geo,
                                 dtype=jnp.float64)
    Sc_ref = at_mod.galerkin_stencils(lv0.apply, at, 17)
    rng = np.random.default_rng(3)
    v = _zero_ring(jnp.asarray(rng.standard_normal((17, 17))))
    y1 = np.asarray(boxmg.apply_s9(Sc, v))[1:-1, 1:-1]
    y2 = np.asarray(at_mod.GeneralLevel(Sc_ref, lv1.geo,
                                        dtype=jnp.float64).apply(v))[1:-1, 1:-1]
    np.testing.assert_allclose(y1, y2, atol=1e-11)


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
def test_full_setup_variational_at_depth(bim):
    """boxmg_setup: every level pair of the full-depth hierarchy satisfies
    the variational identity (Galerkin all the way down)."""
    hier = _hier(32, bim=bim)
    outs = boxmg.boxmg_setup(hier, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    S = boxmg.node_stencil_planes(hier.levels[0], jnp.float64)
    for l, (W4, Sc) in enumerate(outs):
        m = Sc.shape[0]
        uc = jnp.asarray(rng.standard_normal((m, m)))
        vc = jnp.asarray(rng.standard_normal((m, m)))
        # ring guard sets Sc[ring, center] = 1: restrict the identity to
        # zero-ring fields, where the guard is invisible
        uc, vc = _zero_ring(uc), _zero_ring(vc)
        lhs = float(jnp.sum(boxmg.apply_s9(Sc, uc) * vc))
        Pu, Pv = boxmg.prolong_w4(uc, W4), boxmg.prolong_w4(vc, W4)
        rhs = float(jnp.sum(boxmg.apply_s9(S, Pu) * Pv))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11,
                                   err_msg=f"level {l}")
        S = Sc
