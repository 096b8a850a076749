"""Kernel-level parity for the general-stencil / W4-transfer Pallas family
(ops/pallas_general.py) against the XLA reference forms (ops/boxmg.py),
in interpret mode on the CPU backend.

Each fused kernel is checked against its mathematical decomposition:
masked Jacobi sweeps with the spatially-varying diagonal, apply_s9
residuals, and prolong_w4 / restrict_w4 transfers — at level-0 geometry
(stride 1) and coarse-level geometry (stride 2, shared fine lane width),
for both operator forms (exact bi-material phases, general planes).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import boxmg
from multigrid_feanet_tpu.ops.pallas_general import GeneralPallasLevel

N = 64
ROWS = 32


@pytest.fixture(scope="module")
def setup():
    prob = Problem(n=N, inclusion=("circle", (0.0, 0.0), 0.5))
    hier = GridHierarchy.create(prob)
    outs = boxmg.boxmg_setup(hier, dtype=jnp.float32)
    return prob, hier, outs


def _mask(H):
    g = np.zeros((H, H), np.float32)
    g[1:-1, 1:-1] = 1.0
    return jnp.asarray(g)


def _ref_sweep(S, u, f, omega=2.0 / 3.0):
    d = S[..., 1, 1]
    d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    r = (f - boxmg.apply_s9(S, u)) * _mask(u.shape[0])
    return u + (omega / d) * r


def _rng_fields(H, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    return u, f


def test_gsweep_matches_xla(setup):
    prob, hier, outs = setup
    W4_1, Sc_1 = outs[0][0], outs[0][1]
    m = Sc_1.shape[0]
    lv = GeneralPallasLevel(m - 1, stride=2, s9=Sc_1, w4=outs[1][0],
                            Wp=128, rows=ROWS, interpret=True)
    u, f = _rng_fields(m)
    got, rsq = lv.sweep(lv.pad(u), lv.pad(f))
    want = _ref_sweep(Sc_1, u, f)
    np.testing.assert_allclose(np.asarray(lv.unpad(got)), np.asarray(want),
                               atol=1e-4)
    # free pre-update residual norm
    r = (f - boxmg.apply_s9(Sc_1, u)) * _mask(m)
    np.testing.assert_allclose(float(jnp.sqrt(rsq)),
                               float(jnp.linalg.norm(r)), rtol=1e-5)


def test_gresidual_matches_xla(setup):
    prob, hier, outs = setup
    W4_1, Sc_1 = outs[0][0], outs[0][1]
    m = Sc_1.shape[0]
    lv = GeneralPallasLevel(m - 1, stride=2, s9=Sc_1, w4=outs[1][0],
                            Wp=128, rows=ROWS, interpret=True)
    u, f = _rng_fields(m, 1)
    got, _ = lv.residual(lv.pad(u), lv.pad(f))
    want = (f - boxmg.apply_s9(Sc_1, u)) * _mask(m)
    np.testing.assert_allclose(np.asarray(lv.unpad(got)), np.asarray(want),
                               atol=1e-4)


@pytest.mark.parametrize("op", ["bim", "gen"])
def test_gswrr_matches_composition(setup, op):
    """swrr == sweep; residual of the swept iterate; restrict_w4."""
    prob, hier, outs = setup
    W4_0 = outs[0][0]
    lv0 = hier.levels[0]
    if op == "bim":
        pal = GeneralPallasLevel(N, stride=1, phase=prob.phase(N),
                                 coefficients=prob.coefficients, w4=W4_0,
                                 rows=ROWS, rows_next=ROWS, interpret=True)
        S = boxmg.node_stencil_planes(lv0, jnp.float32)
    else:
        S = boxmg.node_stencil_planes(lv0, jnp.float32)
        pal = GeneralPallasLevel(N, stride=1, s9=S, w4=W4_0, rows=ROWS,
                                 rows_next=ROWS, interpret=True)
    u, f = _rng_fields(N + 1, 2)
    u1_pad, fc_pad, rsq = pal.swrr(pal.pad(u), pal.pad(f))
    u1 = _ref_sweep(S, u, f)
    np.testing.assert_allclose(np.asarray(pal.unpad(u1_pad)),
                               np.asarray(u1), atol=1e-4)
    r0 = (f - boxmg.apply_s9(S, u)) * _mask(N + 1)
    np.testing.assert_allclose(float(jnp.sqrt(rsq)),
                               float(jnp.linalg.norm(r0)), rtol=1e-5)
    r1 = (f - boxmg.apply_s9(S, u1)) * _mask(N + 1)
    fc = boxmg.restrict_w4(r1, W4_0)
    # read fc through the coarse level's layout
    lvc = GeneralPallasLevel(N // 2, stride=2, s9=outs[0][1], w4=outs[1][0],
                             Wp=pal.Wp, rows=ROWS, interpret=True)
    np.testing.assert_allclose(np.asarray(lvc.unpad(fc_pad)),
                               np.asarray(fc), atol=1e-4)


@pytest.mark.parametrize("op", ["bim", "gen"])
def test_gpsweep_matches_composition(setup, op):
    """psweep == u += prolong_w4(uc); one sweep."""
    prob, hier, outs = setup
    W4_0 = outs[0][0]
    lv0 = hier.levels[0]
    S = boxmg.node_stencil_planes(lv0, jnp.float32)
    if op == "bim":
        pal = GeneralPallasLevel(N, stride=1, phase=prob.phase(N),
                                 coefficients=prob.coefficients, w4=W4_0,
                                 rows=ROWS, rows_next=ROWS, interpret=True)
    else:
        pal = GeneralPallasLevel(N, stride=1, s9=S, w4=W4_0, rows=ROWS,
                                 rows_next=ROWS, interpret=True)
    lvc = GeneralPallasLevel(N // 2, stride=2, s9=outs[0][1], w4=outs[1][0],
                             Wp=pal.Wp, rows=ROWS, interpret=True)
    u, f = _rng_fields(N + 1, 3)
    rng = np.random.default_rng(4)
    uc = jnp.asarray(rng.standard_normal((N // 2 + 1, N // 2 + 1)),
                     jnp.float32) * _mask(N // 2 + 1)
    got = pal.psweep(pal.pad(u), pal.pad(f), lvc.pad(uc))
    u2 = u + boxmg.prolong_w4(uc, W4_0)
    want = _ref_sweep(S, u2, f)
    np.testing.assert_allclose(np.asarray(pal.unpad(got)), np.asarray(want),
                               atol=1e-4)


def test_zgwrr_matches_composition(setup):
    prob, hier, outs = setup
    W4_1, Sc_1 = outs[1][0], outs[0][1]
    m = Sc_1.shape[0]
    lvc = GeneralPallasLevel(m - 1, stride=2, s9=Sc_1, w4=W4_1, Wp=128,
                             rows=ROWS, rows_next=ROWS, interpret=True)
    _, f = _rng_fields(m, 5)
    fc_pad = lvc.zwrr(lvc.pad(f))
    d = Sc_1[..., 1, 1]
    d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    u1 = (2.0 / 3.0 / d) * f * _mask(m)
    r1 = (f - boxmg.apply_s9(Sc_1, u1)) * _mask(m)
    fc = boxmg.restrict_w4(r1, W4_1)
    lvcc = GeneralPallasLevel(m // 2, stride=4, s9=outs[1][1], Wp=128,
                              rows=ROWS, interpret=True)
    np.testing.assert_allclose(np.asarray(lvcc.unpad(fc_pad)),
                               np.asarray(fc), atol=1e-4)


def test_zgpsweep_matches_composition(setup):
    prob, hier, outs = setup
    W4_1, Sc_1 = outs[1][0], outs[0][1]
    m = Sc_1.shape[0]
    lvc = GeneralPallasLevel(m - 1, stride=2, s9=Sc_1, w4=W4_1, Wp=128,
                             rows=ROWS, rows_next=ROWS, interpret=True)
    lvcc = GeneralPallasLevel(m // 2, stride=4, s9=outs[1][1], Wp=128,
                              rows=ROWS, interpret=True)
    _, f = _rng_fields(m, 6)
    rng = np.random.default_rng(7)
    uc = jnp.asarray(rng.standard_normal((m // 2 + 1, m // 2 + 1)),
                     jnp.float32) * _mask(m // 2 + 1)
    got = lvc.zpsweep(lvc.pad(f), lvcc.pad(uc))
    d = Sc_1[..., 1, 1]
    d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    u1 = (2.0 / 3.0 / d) * f * _mask(m)
    u2 = u1 + boxmg.prolong_w4(uc, W4_1)
    want = _ref_sweep(Sc_1, u2, f)
    np.testing.assert_allclose(np.asarray(lvc.unpad(got)), np.asarray(want),
                               atol=1e-4)
