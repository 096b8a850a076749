"""Interpret-mode parity tests for the round-2 lagged-pipeline Pallas kernels
(ops/pallas_sweep.py) against the XLA bitplane ops.

Covers the stride-lane layout at strides 1/2/4 (coarse multigrid levels keep
full lane width with data every 2^l lanes), homogeneous and bi-material
operators, and all four fused legs: sweep, residual, residual+restriction,
prolongation+sweep.  Reference math: FEANet/mesh.py:103-117,
FEANet/model.py:22-30, MM_Model_convergence.ipynb cell 3.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, build_level
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi as jac

TOL = 2e-5  # relative to field scale; reassociated FMA vs bitplane form


def _rel_err(got, want):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.max(np.abs(want))))
    return float(np.max(np.abs(got - want))) / scale


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
@pytest.mark.parametrize("s,R", [(1, 32), (2, 32), (4, 64)])
def test_v2_kernels_parity(bim, s, R):
    rng = np.random.default_rng(0)
    n = 128 // s
    H = n + 1
    Wp = 256
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
    lv = build_level(prob, n)
    phase = prob.phase(n) if bim else None
    pl_lv = PallasLevel(n, stride=s, phase=phase, Wp=Wp, rows=R,
                        rows_next=R, interpret=True)
    u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32) * lv.geo
    f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    u_pad, f_pad = pl_lv.pad(u), pl_lv.pad(f)
    r_ref = (f - lv.apply(u)) * lv.geo
    rsq_ref = float(jnp.sum(r_ref * r_ref))

    # fused weighted-Jacobi sweep + free pre-update residual norm
    got, rsq = pl_lv.sweep(u_pad, f_pad)
    want = jac.jacobi_step(lv, u, f, 0.0, 2.0 / 3.0)
    assert _rel_err(pl_lv.unpad(got), want) < TOL
    assert abs(float(rsq) - rsq_ref) / max(rsq_ref, 1.0) < TOL

    # interior-masked residual
    got_r, _ = pl_lv.residual(u_pad, f_pad)
    assert _rel_err(pl_lv.unpad(got_r), r_ref) < TOL

    # fused residual + x4 full-weighting restriction into the coarse
    # stride-2s layout (reference: interior crop -> FW/16 conv -> x4)
    fc, rsq3 = pl_lv.restrict_residual(u_pad, f_pad)
    nc = n // 2
    pl_c = PallasLevel(nc, stride=2 * s, phase=None, Wp=Wp, rows=R,
                       rows_next=R, interpret=True)
    want_fc = 4.0 * restrict_full_weighting(r_ref)
    assert _rel_err(pl_c.unpad(fc), want_fc) < TOL
    assert abs(float(rsq3) - rsq_ref) / max(rsq_ref, 1.0) < TOL

    # fused (u += bilinear prolongation of coarse correction; sweep)
    uc = jnp.asarray(rng.standard_normal((nc + 1, nc + 1)), jnp.float32)
    uc_pad = pl_c.pad(uc)
    got_p, _ = pl_lv.psweep(u_pad, f_pad, uc_pad, R_up=R)
    u_corr = u + prolong_bilinear(uc, lv.geo)
    want_p = jac.jacobi_step(lv, u_corr, f, 0.0, 2.0 / 3.0)
    assert _rel_err(pl_lv.unpad(got_p), want_p) < TOL

    # fully-fused descent leg == sweep then restrict_residual, element-wise
    u1_sep, rsq_sep = pl_lv.sweep(u_pad, f_pad)
    fc_sep, _ = pl_lv.restrict_residual(u1_sep, f_pad)
    u1_fus, fc_fus, rsq_fus = pl_lv.sweep_restrict(u_pad, f_pad)
    np.testing.assert_array_equal(np.asarray(pl_lv.unpad(u1_fus)),
                                  np.asarray(pl_lv.unpad(u1_sep)))
    assert _rel_err(pl_c.unpad(fc_fus), pl_c.unpad(fc_sep)) < 1e-6
    assert float(rsq_fus) == pytest.approx(float(rsq_sep), rel=1e-6)

    # cross-cycle fused leg: pswrr == psweep then sweep_restrict
    u3_ref, _ = pl_lv.psweep(u_pad, f_pad, uc_pad, R_up=R)
    u4_ref, fc_ref, rsq_ref2 = pl_lv.sweep_restrict(u3_ref, f_pad)
    u4_fus, fc_fus2, rsq_fus2 = pl_lv.pswrr(u_pad, f_pad, uc_pad, R_up=R)
    assert _rel_err(pl_lv.unpad(u4_fus), pl_lv.unpad(u4_ref)) < 1e-6
    assert _rel_err(pl_c.unpad(fc_fus2), pl_c.unpad(fc_ref)) < 1e-6
    assert float(rsq_fus2) == pytest.approx(float(rsq_ref2), rel=1e-5)

    # zero-initial-guess legs: zsweep_restrict == sweep(0) + rr;
    # zpsweep == sweep(0) + psweep — u1 recomputed in-register
    z = pl_lv.zeros()
    u1z, _ = pl_lv.sweep(z, f_pad)
    fc_z_sep, _ = pl_lv.restrict_residual(u1z, f_pad)
    fc_z = pl_lv.zsweep_restrict(f_pad)
    assert _rel_err(pl_c.unpad(fc_z), pl_c.unpad(fc_z_sep)) < 1e-6
    u3_sep, _ = pl_lv.psweep(u1z, f_pad, uc_pad, R_up=R)
    u3_z = pl_lv.zpsweep(f_pad, uc_pad, R_up=R)
    assert _rel_err(pl_lv.unpad(u3_z), pl_lv.unpad(u3_sep)) < 1e-6


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
def test_bf16_storage_kernels(bim):
    """bfloat16-storage kernels (f32 in-kernel compute): every fused leg
    must match its f32 twin within bf16 rounding (~1e-2 relative).  On chip
    the homogeneous sweep is stream-bound and runs ~1.6x faster at 6 B/node
    (BENCH r4 ``nnz_per_s_homogeneous_bf16``); the fused V-cycle legs are
    VPU-bound and keep f32 as the production dtype."""
    rng = np.random.default_rng(1)
    n, R, Wp = 64, 32, 128
    H = n + 1
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
    phase = prob.phase(n) if bim else None
    lv32 = PallasLevel(n, phase=phase, Wp=Wp, rows=R, rows_next=R,
                       interpret=True)
    lv16 = PallasLevel(n, phase=phase, Wp=Wp, rows=R, rows_next=R,
                       interpret=True, dtype=jnp.bfloat16)
    nc = n // 2
    c32 = PallasLevel(nc, stride=2, Wp=Wp, rows=R, rows_next=R, interpret=True)
    c16 = PallasLevel(nc, stride=2, Wp=Wp, rows=R, rows_next=R,
                      interpret=True, dtype=jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((nc + 1, nc + 1)), jnp.float32)
    BTOL = 2e-2  # bf16 has an 8-bit mantissa

    def cmp(a16, a32, unpad16, unpad32):
        assert a16.dtype == jnp.bfloat16
        got = np.asarray(unpad16(a16)).astype(np.float32)
        assert _rel_err(got, unpad32(a32)) < BTOL

    o32, r32 = lv32.sweep(lv32.pad(u), lv32.pad(f))
    o16, r16 = lv16.sweep(lv16.pad(u), lv16.pad(f))
    cmp(o16, o32, lv16.unpad, lv32.unpad)
    assert float(r16) == pytest.approx(float(r32), rel=BTOL)

    p32, _ = lv32.psweep(lv32.pad(u), lv32.pad(f), c32.pad(uc), R_up=R)
    p16, _ = lv16.psweep(lv16.pad(u), lv16.pad(f), c16.pad(uc), R_up=R)
    cmp(p16, p32, lv16.unpad, lv32.unpad)

    u1_32, fc32, q32 = lv32.sweep_restrict(lv32.pad(u), lv32.pad(f))
    u1_16, fc16, q16 = lv16.sweep_restrict(lv16.pad(u), lv16.pad(f))
    cmp(u1_16, u1_32, lv16.unpad, lv32.unpad)
    cmp(fc16, fc32, c16.unpad, c32.unpad)
    assert float(q16) == pytest.approx(float(q32), rel=BTOL)

    z32 = lv32.zsweep_restrict(lv32.pad(f))
    z16 = lv16.zsweep_restrict(lv16.pad(f))
    cmp(z16, z32, c16.unpad, c32.unpad)

    zp32 = lv32.zpsweep(lv32.pad(f), c32.pad(uc), R_up=R)
    zp16 = lv16.zpsweep(lv16.pad(f), c16.pad(uc), R_up=R)
    cmp(zp16, zp32, lv16.unpad, lv32.unpad)


def test_bf16_vcycle_solve_converges():
    """Full bf16-storage V-cycle solve on the f=0 decay protocol: error and
    iterate shrink together, so bf16 rounding (relative to the current
    amplitude) does not floor the ABSOLUTE residual — same cycle count and
    tail q as f32 (verified at 4097^2 on chip: 23 cycles both dtypes)."""
    from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

    n = 64
    prob = Problem(n=n, dtype=jnp.float32)
    ph = PallasHierarchyV2(prob, num_levels=4, pallas_threshold=32, rows=32,
                           rows_coarse=32, interpret=True,
                           dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f0 = jnp.zeros((n + 1, n + 1), jnp.float32)
    u, hist = ph.solve(f0, u0=u0, eps=0.0, max_cycles=8)
    hist = np.asarray(hist)
    q = np.exp(np.mean(np.diff(np.log(hist + 1e-30))[1:]))
    assert hist[-1] < 1e-3 * hist[0]
    assert q < 0.35, q  # V(1,1) ~ 0.26 + bf16 rounding margin


@pytest.mark.parametrize("bim", [False, True], ids=["hom", "bim"])
def test_heat_mass_kernels_parity(bim):
    """PallasLevel with the pattern-independent mass triple runs the heat
    theta-system  B = M + theta dt K  (ops/heat.py): every fused leg must
    match the XLA affine-bitplane ops on the system hierarchy."""
    from multigrid_feanet_tpu.ops import heat

    rng = np.random.default_rng(3)
    n, dt, theta = 64, 0.05, 0.5
    H, Wp, R = n + 1, 128, 32
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None,
                   dtype=jnp.float32)
    lv = heat.heat_system_hierarchy(prob, dt, theta).finest
    td = theta * dt
    a0, a1 = prob.coefficients
    mass = (lv.h * lv.h / 18.0, lv.h * lv.h / 18.0, -lv.h * lv.h / 36.0)
    pl_lv = PallasLevel(n, stride=1, phase=prob.phase(n) if bim else None,
                        coefficients=(td * a0, td * a1), mass=mass,
                        Wp=Wp, rows=R, rows_next=R, interpret=True)
    u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32) * lv.geo
    f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    u_pad, f_pad = pl_lv.pad(u), pl_lv.pad(f)
    r_ref = (f - lv.apply(u)) * lv.geo
    rsq_ref = float(jnp.sum(r_ref * r_ref))

    got, rsq = pl_lv.sweep(u_pad, f_pad)
    want = jac.jacobi_step(lv, u, f, 0.0, 2.0 / 3.0)
    assert _rel_err(pl_lv.unpad(got), want) < TOL
    assert abs(float(rsq) - rsq_ref) / max(rsq_ref, 1.0) < TOL

    fc, rsq3 = pl_lv.restrict_residual(u_pad, f_pad)
    nc = n // 2
    pl_c = PallasLevel(nc, stride=2, phase=None, Wp=Wp, rows=R,
                       rows_next=R, interpret=True)
    want_fc = 4.0 * restrict_full_weighting(r_ref)
    assert _rel_err(pl_c.unpad(fc), want_fc) < TOL
    assert abs(float(rsq3) - rsq_ref) / max(rsq_ref, 1.0) < TOL

    uc = jnp.asarray(rng.standard_normal((nc + 1, nc + 1)), jnp.float32)
    uc_pad = pl_c.pad(uc)
    got_p, _ = pl_lv.psweep(u_pad, f_pad, uc_pad, R_up=R)
    u_corr = u + prolong_bilinear(uc, lv.geo)
    want_p = jac.jacobi_step(lv, u_corr, f, 0.0, 2.0 / 3.0)
    assert _rel_err(pl_lv.unpad(got_p), want_p) < TOL

    # fused legs vs their unfused compositions (mass plumbed through all)
    u1_fus, fc_fus, _ = pl_lv.sweep_restrict(u_pad, f_pad)
    fc_sep, _ = pl_lv.restrict_residual(pl_lv.sweep(u_pad, f_pad)[0], f_pad)
    assert _rel_err(pl_c.unpad(fc_fus), pl_c.unpad(fc_sep)) < 1e-6
    u4_fus, fc2_fus, _ = pl_lv.pswrr(u_pad, f_pad, uc_pad, R_up=R)
    u3_ref, _ = pl_lv.psweep(u_pad, f_pad, uc_pad, R_up=R)
    u4_ref, fc2_ref, _ = pl_lv.sweep_restrict(u3_ref, f_pad)
    assert _rel_err(pl_lv.unpad(u4_fus), pl_lv.unpad(u4_ref)) < 1e-6
    assert _rel_err(pl_c.unpad(fc2_fus), pl_c.unpad(fc2_ref)) < 1e-6
    fc_z = pl_lv.zsweep_restrict(f_pad)
    u1z, _ = pl_lv.sweep(pl_lv.zeros(), f_pad)
    fc_z_sep, _ = pl_lv.restrict_residual(u1z, f_pad)
    assert _rel_err(pl_c.unpad(fc_z), pl_c.unpad(fc_z_sep)) < 1e-6
    u3_z = pl_lv.zpsweep(f_pad, uc_pad, R_up=R)
    u3_sep, _ = pl_lv.psweep(u1z, f_pad, uc_pad, R_up=R)
    assert _rel_err(pl_lv.unpad(u3_z), pl_lv.unpad(u3_sep)) < 1e-6


def test_difference_form_annihilates_constants_and_matches():
    """The difference-form apply (_apply_bim_d/_apply_hom_d): exactly zero
    on constant fields (the property that kills the kappa-amplified
    rounding bias at 4097^2 — see the r5 kernel notes), and equal to the
    plain form to f32 roundoff on general fields."""
    import numpy as np
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.ops import stencil as st
    from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel

    n = 64
    phase = geometry.circle_phase(2.0, n)
    rng = np.random.default_rng(0)
    H = n + 1
    f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
    for dfo in (False, True):
        lv = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 20.0),
                         rows=32, interpret=True, dform=dfo)
        # constant iterate (large value): r = f - A c must be EXACTLY f at
        # the interior under the difference form
        c = 150000.0
        u_const = jnp.full((H, H), c, jnp.float32)
        r_pad, _ = lv.residual(lv.pad(u_const), lv.pad(f))
        r = np.asarray(lv.unpad(r_pad))[1:-1, 1:-1]
        want = np.asarray(f)[1:-1, 1:-1]
        if dfo:
            np.testing.assert_array_equal(r, want)
        # general-field parity with the XLA bitplane form
        u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
        pid = st.pattern_ids_np(np.asarray(phase))
        au = st.apply_stencil_bitplane(jnp.asarray(pid), u, 1.0, 20.0)
        geo = np.zeros((H, H), np.float32); geo[1:-1, 1:-1] = 1
        want_r = np.asarray((f - au) * jnp.asarray(geo))
        r2_pad, _ = lv.residual(lv.pad(u), lv.pad(f))
        r2 = np.asarray(lv.unpad(r2_pad))
        np.testing.assert_allclose(r2, want_r, atol=2e-5)


def test_qstream_sweep_matches_phase_sweep():
    """ops/pallas_qsweep: the coefficient-stream sweep equals the int8
    phase sweep (bf16 Q is exact for the (1, 20) pair)."""
    import numpy as np
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.ops import pallas_qsweep as qs
    from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel

    n = 64
    phase = geometry.circle_phase(2.0, n)
    lv = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 20.0),
                     rows=32, interpret=True, dform=False)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    want, _ = lv.sweep(lv.pad(u), lv.pad(f), dst=lv.zeros())
    for dt in (jnp.float32, jnp.bfloat16):
        q_pad = qs.make_q_pad(lv, phase, (1.0, 20.0), dtype=dt)
        got = qs.qsweep(lv, lv.pad(u), lv.pad(f), q_pad)
        np.testing.assert_array_equal(np.asarray(lv.unpad(got)),
                                      np.asarray(lv.unpad(want)))
