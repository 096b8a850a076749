"""Interpret-mode parity tests for the Pallas elastic block-Jacobi sweep
(ops/pallas_elastic.py) against the XLA block-stencil ops, plus the
element-factored apply vs the bitplane form.

Reference physics: Archive/FEM/matlab_elasticity/Plane_Stress_modify.m
(E = 212e3, nu = 0.288 plane stress) with the FEA-Net 16-pattern
bi-material logic of FEANet/mesh.py applied to the vector operator.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_elastic import PallasElasticLevel

E, NU = 212e3, 0.288
TOL = 2e-6  # f32, relative to the field scale; E amplifies absolutes


def _rel(got, want):
    got, want = np.asarray(got), np.asarray(want)
    return float(np.max(np.abs(got - want))) / max(
        1e-30, float(np.max(np.abs(want))))


def test_factored_apply_matches_bitplane_f64():
    import jax

    rng = np.random.default_rng(0)
    n = 24
    phase = (rng.random((n, n)) < 0.4).astype(np.int8)
    pid = jnp.asarray(stencil.pattern_ids_np(phase))
    u = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)))
    for plane in ("stress", "strain"):
        want = el.apply_elastic_bitplane(pid, u, E, NU, 1.0, 20.0, plane)
        got = el.apply_elastic_factored(jnp.asarray(phase), u, E, NU,
                                        1.0, 20.0, plane)
        assert _rel(got, want) < 1e-12
    # homogeneous
    want = el.apply_elastic_bitplane(jnp.zeros((n + 1, n + 1), jnp.int8),
                                     u, E, NU, 1.0, 20.0)
    got = el.apply_elastic_factored(None, u, E, NU, 1.0, 20.0)
    assert _rel(got, want) < 1e-12


@pytest.mark.parametrize("bim,s,n", [(True, 1, 64), (False, 1, 64),
                                     (True, 2, 32)],
                         ids=["bim", "hom", "bim_s2"])
def test_pallas_elastic_sweep_parity(bim, s, n):
    rng = np.random.default_rng(1)
    a0, a1 = 1.0, 20.0
    phase = (rng.random((n, n)) < 0.4).astype(np.int8) if bim else None
    pid = jnp.asarray(stencil.pattern_ids_np(phase)) if bim else \
        jnp.zeros((n + 1, n + 1), jnp.int8)
    geo = np.zeros((n + 1, n + 1), np.float32)
    geo[1:-1, 1:-1] = 1
    geo = jnp.asarray(geo)
    u = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)),
                    jnp.float32) * geo[None]
    f = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)), jnp.float32)

    table = el.make_elastic_stencil_table(E, NU, 1.0, (a0, a1))
    dinv = el.invert_2x2(el.block_diagonal(table, pid))
    want = el.jacobi_step_elastic(table, pid, dinv, geo, u, f)
    r_ref = (f - el.apply_elastic_stencil(table, pid, u)) * geo[None]

    pl_lv = PallasElasticLevel(n, E, NU, stride=s, phase=phase,
                               coefficients=(a0, a1),
                               Wp=256 if s > 1 else None,
                               rows=32, interpret=True)
    ux, uy = pl_lv.pad(u)
    fx, fy = pl_lv.pad(f)
    (gx, gy), rsq = pl_lv.sweep(ux, uy, fx, fy)
    assert _rel(pl_lv.unpad(gx, gy), want) < TOL
    rsq_ref = float(jnp.sum(r_ref * r_ref))
    assert abs(float(rsq) - rsq_ref) / rsq_ref < 1e-5
    (rx, ry), _ = pl_lv.residual(ux, uy, fx, fy)
    assert _rel(pl_lv.unpad(rx, ry), r_ref) < TOL


def test_pallas_elastic_sweep_iterates():
    """Three chained Pallas sweeps (donation ping-pong) equal three XLA
    block-Jacobi sweeps."""
    rng = np.random.default_rng(2)
    n, a0, a1 = 64, 1.0, 20.0
    phase = (rng.random((n, n)) < 0.4).astype(np.int8)
    pid = jnp.asarray(stencil.pattern_ids_np(phase))
    geo = np.zeros((n + 1, n + 1), np.float32)
    geo[1:-1, 1:-1] = 1
    geo = jnp.asarray(geo)
    u = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)),
                    jnp.float32) * geo[None]
    f = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)), jnp.float32)
    table = el.make_elastic_stencil_table(E, NU, 1.0, (a0, a1))
    dinv = el.invert_2x2(el.block_diagonal(table, pid))
    want = u
    for _ in range(3):
        want = el.jacobi_step_elastic(table, pid, dinv, geo, want, f)

    pl_lv = PallasElasticLevel(n, E, NU, phase=phase, coefficients=(a0, a1),
                               rows=32, interpret=True)
    cur = pl_lv.pad(u)
    spare = (pl_lv.zeros(), pl_lv.zeros())
    fx, fy = pl_lv.pad(f)
    for _ in range(3):
        out, _ = pl_lv.sweep(cur[0], cur[1], fx, fy, dst=spare)
        cur, spare = out, cur
    assert _rel(pl_lv.unpad(*cur), want) < 3 * TOL


def test_pallas_elastic_mg_solve_matches_xla():
    """PallasElasticMG solve matches the XLA elastic v_cycle solve: same
    cycle counts (+-1 near eps), bounded residual ratios, same solution."""
    from multigrid_feanet_tpu.solvers import elastic as es

    rng = np.random.default_rng(3)
    n = 64
    inclusion = ("circle", (0.0, 0.0), 0.5)
    levels = es.build_elastic_hierarchy(
        n, E, NU, inclusion=inclusion, coefficients=(1.0, 20.0),
        dtype=jnp.float64)
    f = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)))
    u1, h1 = es.solve(levels, f, nu1=2, nu2=2, eps=1e-2, max_cycles=60)
    f = f.astype(jnp.float32)
    mg = es.PallasElasticMG(n, E, NU, inclusion=inclusion,
                            coefficients=(1.0, 20.0), pallas_threshold=16,
                            rows=32, interpret=True)
    u2, h2 = mg.solve(f, nu1=2, nu2=2, eps=1e-2, max_cycles=60)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert abs(len(h1) - len(h2)) <= 1
    assert len(h2) < 60
    m = min(len(h1), len(h2))
    assert np.all(h2[:m] / h1[:m] > 0.6) and np.all(h2[:m] / h1[:m] < 1.6)
    scale = float(np.max(np.abs(np.asarray(u1))))
    assert float(np.max(np.abs(np.asarray(u1) - np.asarray(u2)))) / scale < 5e-3


def test_elastic_pcg_accelerates_and_reports_true_residual():
    """MG-preconditioned flexible CG (solvers/elastic.py::solve_pcg):
    reaches the target in at most half the plain V(2,2) cycle count, and
    its history IS the true residual (residual replacement every
    iteration — the f32 recurrence drifts at |A| ~ 2e5 scale)."""
    from multigrid_feanet_tpu.solvers import elastic as es

    rng = np.random.default_rng(0)
    n = 64
    mg = es.PallasElasticMG(n, E, NU, inclusion=("circle", (0.0, 0.0), 0.5),
                            coefficients=(1.0, 20.0), pallas_threshold=16,
                            rows=32, interpret=True, direct_coarse=True)
    geo = mg.levels[0].geo[None]
    f = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)), jnp.float32) * geo
    eps = 0.05
    u, hist = mg.solve_pcg(f, eps=eps, max_iters=40)
    assert hist[-1] <= eps
    r = (f - mg.levels[0].apply(u)) * geo
    true_res = float(jnp.sqrt(jnp.sum(r[:, 1:-1, 1:-1] ** 2)))
    np.testing.assert_allclose(true_res, hist[-1], rtol=1e-3)
    _, h_plain = mg.solve(f, nu1=2, nu2=2, eps=eps, max_cycles=120)
    assert len(hist) <= max(2, len(h_plain) // 2)
