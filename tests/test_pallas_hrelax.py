"""Fused Pallas H-relax kernel (ops/pallas_hrelax.py) and the whole-solve
Pallas H-MG (solvers/hmg.py::PallasHMG), interpret mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy, build_level
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.ops.pallas_hrelax import hrelax
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear


def _rel(got, want):
    got, want = np.asarray(got), np.asarray(want)
    return float(np.max(np.abs(got - want))) / max(
        1e-30, float(np.max(np.abs(want))))


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
def test_hrelax_kernel_parity(bim):
    rng = np.random.default_rng(0)
    n = 128
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None,
                   dtype=jnp.float32)
    lv = build_level(prob, n)
    params = jnp.asarray(rng.standard_normal((3, 3, 3)) * 0.1, jnp.float32)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32) * lv.geo
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    p = PallasLevel(n, stride=1, phase=prob.phase(n) if bim else None,
                    rows=32, rows_next=32, interpret=True)
    got, rsq = hrelax(p, p.pad(u), p.pad(f), params)
    want = hnet.h_relax(lv, params, u, f, 1, 0.0)
    assert _rel(p.unpad(got), want) < 2e-6
    r_ref = (f - lv.apply(u)) * lv.geo
    rsq_ref = float(jnp.sum(r_ref * r_ref))
    assert abs(float(rsq) - rsq_ref) / max(rsq_ref, 1.0) < 1e-5
    # chained (cache roll across calls irrelevant — fresh call each time)
    b2, _ = hrelax(p, got, p.pad(f), params)
    want2 = hnet.h_relax(lv, params, u, f, 2, 0.0)
    assert _rel(p.unpad(b2), want2) < 4e-6


def _xla_hmg_cycle(hier, params, u, f, omega, level=0):
    """Masked-residual H-MG reference cycle (library convention)."""
    lv = hier.levels[level]
    u = hnet.h_relax(lv, params, u, f, 1, 0.0, omega)
    if level < hier.num_levels - 1:
        r = (f - lv.apply(u)) * lv.geo
        f_c = 4.0 * restrict_full_weighting(r)
        u_c = _xla_hmg_cycle(hier, params, jnp.zeros_like(f_c), f_c,
                             omega, level + 1)
        u = u + prolong_bilinear(u_c, lv.geo)
    return hnet.h_relax(lv, params, u, f, 1, 0.0, omega)


def test_pallas_hmg_matches_xla_cycles():
    """PallasHMG iterates equal the XLA masked-residual H-MG cycle."""
    from multigrid_feanet_tpu.solvers.hmg import PallasHMG
    from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA, interior_norm

    rng = np.random.default_rng(1)
    n = 64
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float32)
    hier = GridHierarchy.create(prob)
    params = jnp.asarray(rng.standard_normal((3, 3, 3)) * 0.05, jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    mg = PallasHMG(prob, pallas_threshold=16, rows=32, interpret=True)
    u2, h2 = mg.solve(params, f, eps=1e-3, max_cycles=25)

    u = jnp.zeros((n + 1, n + 1), jnp.float32)
    hist = []
    for _ in range(25):
        u = _xla_hmg_cycle(hier, params, u, f, DEFAULT_OMEGA)
        hist.append(float(interior_norm(f - hier.finest.apply(u))))
    h1 = np.asarray(hist)
    h2 = np.asarray(h2)
    m = min(len(h1), len(h2))
    assert m >= 3
    # cycle-for-cycle residual parity at f32 accuracy (early cycles)
    for j in range(min(m, 6)):
        assert abs(h1[j] - h2[j]) / h1[j] < 1e-3, (j, h1[j], h2[j])


@pytest.mark.parametrize("L", [1, 3], ids=["L1", "L3"])
@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
def test_fused_hmg_legs_match_compositions(bim, L):
    """The four round-4 fused H-MG leg kernels (ops/pallas_hrelax.py:
    hswrr / phrelax / zhswrr / zphrelax) are bit-exact against compositions
    of the individually-verified hrelax / restrict_residual / psweep
    kernels in interpret mode."""
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.ops import pallas_hrelax as phx

    rng = np.random.default_rng(0)
    n = 64
    phase = geometry.circle_phase(2.0, n) if bim else None
    # dform=False: the H-relax kernel family computes its residuals in the
    # PLAIN element-factored form (no difference-form variant yet), so the
    # bitwise composition oracle (restrict_residual) must match that form.
    p = PallasLevel(n, stride=1, phase=phase, rows=32, rows_next=32,
                    interpret=True, dform=False)
    pc = PallasLevel(n // 2, stride=2,
                     phase=geometry.circle_phase(2.0, n // 2) if bim else None,
                     Wp=p.Wp, rows=32, rows_next=32, interpret=True,
                     dform=False)
    params = jnp.asarray(rng.standard_normal((L, 3, 3)) * 0.1, jnp.float32)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((n // 2 + 1, n // 2 + 1)), jnp.float32)
    ub, fb, ucb = p.pad(u), p.pad(f), pc.pad(uc)

    # hswrr == hrelax ; restrict_residual
    u1_ref, rsq_ref = phx.hrelax(p, ub, fb, params)
    fc_ref, _ = p.restrict_residual(u1_ref, fb)
    u1, fc, rsq = phx.hswrr(p, ub, fb, params)
    np.testing.assert_array_equal(np.asarray(p.unpad(u1)),
                                  np.asarray(p.unpad(u1_ref)))
    np.testing.assert_array_equal(np.asarray(pc.unpad(fc)),
                                  np.asarray(pc.unpad(fc_ref)))
    assert abs(float(rsq) - float(rsq_ref)) <= 1e-5 * float(rsq_ref)

    # phrelax == psweep(omega=0) ; hrelax
    u2_ref, _ = p.psweep(ub, fb, ucb, omega=0.0)
    u3_ref, _ = phx.hrelax(p, u2_ref, fb, params)
    u3 = phx.phrelax(p, ub, fb, ucb, params)
    np.testing.assert_array_equal(np.asarray(p.unpad(u3)),
                                  np.asarray(p.unpad(u3_ref)))

    # zhswrr == hrelax(0) ; restrict_residual
    z1_ref, _ = phx.hrelax(p, p.zeros(), fb, params)
    zfc_ref, _ = p.restrict_residual(z1_ref, fb)
    zfc = phx.zhswrr(p, fb, params)
    np.testing.assert_array_equal(np.asarray(pc.unpad(zfc)),
                                  np.asarray(pc.unpad(zfc_ref)))

    # zphrelax == hrelax(0) ; psweep(omega=0) ; hrelax
    z2_ref, _ = p.psweep(z1_ref, fb, ucb, omega=0.0)
    z3_ref, _ = phx.hrelax(p, z2_ref, fb, params)
    z3 = phx.zphrelax(p, fb, ucb, params)
    np.testing.assert_array_equal(np.asarray(p.unpad(z3)),
                                  np.asarray(p.unpad(z3_ref)))


@pytest.mark.parametrize("hl,zl", [(2, True), (2, False), (None, False)],
                         ids=["hl2_zero", "hl2_nonzero", "all_nonzero"])
def test_pallas_hmg_h_levels_variants(hl, zl):
    """PallasHMG's h_levels prefix / coarse-leg flavor options match the
    XLA cycle with the same smoother placement."""
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.learn.train_hnet import _hjac_vcycle
    from multigrid_feanet_tpu.solvers.hmg import PallasHMG
    from multigrid_feanet_tpu.solvers.jacobi import interior_norm

    rng = np.random.default_rng(1)
    n = 64
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float32)
    hier = GridHierarchy.create(prob)
    params = jnp.asarray(rng.standard_normal((3, 3, 3)) * 0.05, jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    mg = PallasHMG(prob, pallas_threshold=16, rows=32, interpret=True,
                   h_levels=hl, coarse_zero_legs=zl)
    u2, h2 = mg.solve(params, f, eps=1e-3, max_cycles=25)
    u = jnp.zeros((n + 1, n + 1), jnp.float32)
    hist = []
    for _ in range(len(h2)):
        u = _hjac_vcycle(hier, params, u, f, 2.0 / 3.0, hl)
        hist.append(float(interior_norm(f - hier.finest.apply(u))))
    h1 = np.asarray(hist)
    h2 = np.asarray(h2)
    assert len(h2) < 25
    # early cycles at f32 accuracy; later entries drift with summation
    # order as residuals shrink
    np.testing.assert_allclose(h2[:5], h1[:5], rtol=2e-4)
    assert np.max(np.abs(h2 - h1) / h1) < 1e-2


def test_hrelax_dform_matches_plain_form():
    """The opt-in difference-form H-relax legs (round 5) compute the same
    operator as the plain form to f32 roundoff (dform matters only for
    the rounding BIAS at production scale — see docs/kernel_notes_r5.md)."""
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.ops.pallas_hrelax import hrelax, hswrr

    rng = np.random.default_rng(0)
    n = 64
    phase = geometry.circle_phase(2.0, n)
    p = PallasLevel(n, stride=1, phase=phase, rows=32, rows_next=32,
                    interpret=True, dform=False)
    params = jnp.asarray(rng.standard_normal((1, 3, 3)) * 0.1, jnp.float32)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    a, _ = hrelax(p, p.pad(u), p.pad(f), params, dst=p.zeros(), dform=False)
    b, _ = hrelax(p, p.pad(u), p.pad(f), params, dst=p.zeros(), dform=True)
    np.testing.assert_allclose(np.asarray(p.unpad(a)), np.asarray(p.unpad(b)),
                               atol=2e-5)
    u1a, fca, _ = hswrr(p, p.pad(u), p.pad(f), params, dst=p.zeros(),
                        dform=False)
    u1b, fcb, _ = hswrr(p, p.pad(u), p.pad(f), params, dst=p.zeros(),
                        dform=True)
    np.testing.assert_allclose(np.asarray(p.unpad(u1a)),
                               np.asarray(p.unpad(u1b)), atol=2e-5)
