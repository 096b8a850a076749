"""On-chip mini parity check: the Mosaic-compiled Pallas kernels vs the XLA
bitplane ops at n=512, bi-material and homogeneous — the fast gate that
interpret-mode CI cannot provide (Mosaic lowering, scoped VMEM, donation).

Runs in a few seconds on the real TPU (one compile per kernel family):

  PYTHONPATH=/root/repo:/root/.axon_site timeout 420 python experiments/tpu_parity.py

Prints one JSON line {"ok": true, ...} and exits non-zero on any mismatch.
Tolerance: the element-factored kernels reassociate the FMA order vs the
bitplane form — <= 2e-5 relative at O(1) fields (same bound as the
interpret-mode suite, tests/test_pallas_sweep.py).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

TOL = 2e-5


def _rel(got, want):
    got, want = np.asarray(got), np.asarray(want)
    return float(np.max(np.abs(got - want)) / max(1.0, float(np.max(np.abs(want)))))


def main():
    from multigrid_feanet_tpu.core.problem import Problem, build_level
    from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
    from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
    from multigrid_feanet_tpu.solvers import jacobi as jac

    dev = str(jax.devices()[0])
    assert "TPU" in dev, f"not on TPU: {dev}"
    n = 512
    H = n + 1
    rng = np.random.default_rng(0)
    errs = {}
    for bim in (False, True):
        prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
        lv = build_level(prob, n)
        phase = prob.phase(n) if bim else None
        p = PallasLevel(n, stride=1, phase=phase, rows=64, rows_next=64,
                        interpret=False)
        u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32) * lv.geo
        f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
        u_pad, f_pad = p.pad(u), p.pad(f)
        tag = "bim" if bim else "hom"

        # sweep + free residual norm
        got, rsq = p.sweep(u_pad, f_pad)
        want = jac.jacobi_step(lv, u, f, 0.0, 2.0 / 3.0)
        r_ref = (f - lv.apply(u)) * lv.geo
        errs[f"sweep_{tag}"] = _rel(p.unpad(got), want)
        errs[f"rsq_{tag}"] = abs(float(rsq) - float(jnp.sum(r_ref * r_ref))) / \
            max(1.0, float(jnp.sum(r_ref * r_ref)))

        # fused sweep + restrict (descent leg)
        pc = PallasLevel(n // 2, stride=2, phase=None, Wp=p.Wp, rows=64,
                         rows_next=64, interpret=False)
        r1 = (f - lv.apply(want)) * lv.geo
        want_fc = 4.0 * restrict_full_weighting(r1)
        u1f, fc, _ = p.sweep_restrict(u_pad, f_pad)
        errs[f"swrr_u1_{tag}"] = _rel(p.unpad(u1f), want)
        errs[f"swrr_fc_{tag}"] = _rel(pc.unpad(fc), want_fc)

        # restrict_residual (standalone)
        fc2, _ = p.restrict_residual(u_pad, f_pad)
        errs[f"rr_{tag}"] = _rel(pc.unpad(fc2),
                                 4.0 * restrict_full_weighting(r_ref))

        # prolongation-fused sweep
        nc = n // 2
        uc = jnp.asarray(rng.standard_normal((nc + 1, nc + 1)), jnp.float32)
        got_p, _ = p.psweep(u_pad, f_pad, pc.pad(uc), R_up=64)
        u_corr = u + prolong_bilinear(uc, lv.geo)
        want_p = jac.jacobi_step(lv, u_corr, f, 0.0, 2.0 / 3.0)
        errs[f"psweep_{tag}"] = _rel(p.unpad(got_p), want_p)

        # zero-initial-guess legs (coarse-level fast path)
        u1z = jac.jacobi_step(lv, jnp.zeros_like(u), f, 0.0, 2.0 / 3.0)
        rz = (f - lv.apply(u1z)) * lv.geo
        fc_z = p.zsweep_restrict(f_pad)
        errs[f"zrr_{tag}"] = _rel(pc.unpad(fc_z),
                                  4.0 * restrict_full_weighting(rz))
        u3z = p.zpsweep(f_pad, pc.pad(uc), R_up=64)
        want_z = jac.jacobi_step(lv, u1z + prolong_bilinear(uc, lv.geo),
                                 f, 0.0, 2.0 / 3.0)
        errs[f"zpsweep_{tag}"] = _rel(p.unpad(u3z), want_z)

    # elastic block-Jacobi sweep (ops/pallas_elastic.py) vs XLA block ops
    from multigrid_feanet_tpu.ops import elasticity as el
    from multigrid_feanet_tpu.ops import stencil
    from multigrid_feanet_tpu.ops.pallas_elastic import PallasElasticLevel

    E_, nu_ = 212e3, 0.288
    phase = (rng.random((n, n)) < 0.4).astype(np.int8)
    pid = jnp.asarray(stencil.pattern_ids_np(phase))
    geo = np.zeros((H, H), np.float32)
    geo[1:-1, 1:-1] = 1
    geo = jnp.asarray(geo)
    ue = jnp.asarray(rng.standard_normal((2, H, H)), jnp.float32) * geo[None]
    fe = jnp.asarray(rng.standard_normal((2, H, H)), jnp.float32)
    table = el.make_elastic_stencil_table(E_, nu_, 1.0, (1.0, 20.0))
    dinv = el.invert_2x2(el.block_diagonal(table, pid))
    want_e = el.jacobi_step_elastic(table, pid, dinv, geo, ue, fe)
    ple = PallasElasticLevel(n, E_, nu_, phase=phase, coefficients=(1.0, 20.0),
                             rows=64, interpret=False)
    ex, ey = ple.pad(ue)
    fx, fy = ple.pad(fe)
    (gx, gy), _ = ple.sweep(ex, ey, fx, fy)
    errs["elastic_sweep"] = _rel(ple.unpad(gx, gy), want_e)

    ok = all(e < TOL for e in errs.values())
    print(json.dumps({"ok": ok, "tol": TOL, "device": dev,
                      **{k: round(v, 9) for k, v in errs.items()}}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
