"""Scratch: interpret-mode parity checks for the round-2 pallas_sweep kernels
against the XLA bitplane ops (run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import Problem, build_level
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi as jac

rng = np.random.default_rng(0)


def check(name, got, want, tol=2e-5):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.max(np.abs(want))))
    err = float(np.max(np.abs(got - want))) / scale
    print(f"{name:34s} rel_err={err:.3e} {'OK' if err < tol else 'FAIL'}")
    assert err < tol, name


for bim in (False, True):
    for s, R in ((1, 32), (2, 32), (4, 64)):
        n = 128 // s  # logical level size; Wp fixed by the finest level
        H = n + 1
        Wp = 256  # covers (H-1)*s = 128 lanes
        prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
        lv = build_level(prob, n)
        phase = prob.phase(n)
        pl_lv = PallasLevel(n, stride=s, phase=phase, Wp=Wp, rows=R,
                            rows_next=R, interpret=True)
        u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32) * lv.geo
        f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
        u_pad, f_pad = pl_lv.pad(u), pl_lv.pad(f)

        # sweep
        got, rsq = pl_lv.sweep(u_pad, f_pad)
        want = jac.jacobi_step(lv, u, f, 0.0, 2.0 / 3.0)
        check(f"sweep bim={bim} s={s}", pl_lv.unpad(got), want)
        r_ref = (f - lv.apply(u)) * lv.geo
        check(f"sweep rsq bim={bim} s={s}", float(rsq), float(jnp.sum(r_ref * r_ref)))

        # residual
        got_r, rsq2 = pl_lv.residual(u_pad, f_pad)
        check(f"residual bim={bim} s={s}", pl_lv.unpad(got_r), r_ref)

        # restrict_residual -> coarse layout (stride 2s, ghost R)
        fc, rsq3 = pl_lv.restrict_residual(u_pad, f_pad)
        nc = n // 2
        pl_c = PallasLevel(nc, stride=2 * s, phase=None, Wp=Wp, rows=R,
                           rows_next=R, interpret=True)
        want_fc = 4.0 * restrict_full_weighting(r_ref)
        check(f"restrict bim={bim} s={s}", pl_c.unpad(fc), want_fc)
        check(f"restrict rsq bim={bim} s={s}", float(rsq3), float(jnp.sum(r_ref * r_ref)))

        # psweep: u += P(uc); jacobi sweep
        uc = jnp.asarray(rng.standard_normal((nc + 1, nc + 1)), jnp.float32)
        uc_pad = pl_c.pad(uc)
        got_p, _ = pl_lv.psweep(u_pad, f_pad, uc_pad, R_up=R)
        u_corr = u + prolong_bilinear(uc, lv.geo)
        want_p = jac.jacobi_step(lv, u_corr, f, 0.0, 2.0 / 3.0)
        check(f"psweep bim={bim} s={s}", pl_lv.unpad(got_p), want_p)

print("all v2 kernel checks passed")
