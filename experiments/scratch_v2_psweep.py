"""Scratch: bisect the psweep cost at 4097^2 (bi-material).

Variants (monkey-patched _sweep_kernel corr section via a module flag):
  full      — current kernel
  norowmix  — corr rows = injection only (skip stack/reshape interleave)
  nolanemix — skip lane midpoint rolls
  nocorr    — stream uc + maintain ucc but add nothing
Plus: full at R=64 with raised vmem limit.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_psweep.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import pallas_sweep as psw

n = 4096
H = n + 1
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
phase = geometry.circle_phase(2.0, n)
print("device:", jax.devices()[0], flush=True)

VARIANT = ["full"]
_orig_kernel = psw._sweep_kernel


def patched_kernel(u_ref, f_ref, ph_ref, uc_ref, dst_ref, u_out, rsq_ref,
                   cache, phc, ucc, *, R, H, W, Wp, a0, da, omega, s,
                   bim, mode, with_corr):
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental import pallas as pl
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    v = VARIANT[0]

    cache[R + 1 : R + 2, :] = u_ref[0:1, :]
    u_win = cache[...]

    if with_corr:
        ucc[R // 2 + 1 : R // 2 + 2, :] = uc_ref[0:1, :]
        cw = ucc[...]
        if v == "norowmix":
            corr_r = jnp.concatenate([cw[0 : R // 2 + 1, :],
                                      cw[0 : R // 2 + 1, :]], axis=0)
        else:
            mids = 0.5 * (cw[0 : R // 2 + 1, :] + cw[1 : R // 2 + 2, :])
            inj = cw[1 : R // 2 + 2, :]
            corr_r = jnp.stack([mids, inj], axis=1).reshape(R + 2, Wp)
        if v == "nolanemix":
            corr = corr_r
        else:
            lane_mid = 0.5 * (psw._roll_m(corr_r, s) + psw._roll_p(corr_r, s))
            gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
            corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
        corr = jnp.where(psw._interior_mask(row0, R + 2, Wp, H, W, s), corr, 0.0)
        if v != "nocorr":
            u_win = u_win + corr
        else:
            u_win = u_win + 0.0 * corr[0:1, 0:1]

    if bim:
        ph_win = jnp.concatenate([phc[...], ph_ref[...]], axis=0)
        au, C4 = psw._apply_bim(u_win, ph_win, R + 2, a0, da, s)
        d = (2.0 / 3.0) * C4
    else:
        au, _ = psw._apply_hom(u_win, R + 2, a0, s)
        d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)

    r = f_ref[...] - au
    r = jnp.where(psw._interior_mask(row0 + 1, R, Wp, H, W, s), r, 0.0)
    u_out[...] = u_win[1 : R + 1, :] + (omega / d) * r

    @pl.when(i > 0)
    def _():
        rsq_ref[i - 1, 0] = jnp.sum(r * r)

    cache[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                              cache[R : R + 1, :])
    cache[1 : R + 1, :] = u_ref[...]
    if bim:
        phc[0:1, :] = ph_ref[R - 1 : R, :]
    if with_corr:
        ucc[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                                ucc[R // 2 : R // 2 + 1, :])
        ucc[1 : R // 2 + 1, :] = uc_ref[...]


psw._sweep_kernel = patched_kernel


def time_pingpong(step2, a, b, iters=100):
    @jax.jit
    def loop(a, b):
        def body(c, _):
            return step2(*c), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=iters // 2)
        return a
    r = loop(a, b); jax.block_until_ready(r)
    t0 = time.time(); r = loop(a, b); jax.block_until_ready(r)
    return (time.time() - t0) / iters


for R, vmem, variants in ((32, None, ["full", "norowmix", "nolanemix", "nocorr"]),
                          (64, 24, ["full"]),
                          (64, 32, ["full"])):
    lv = psw.PallasLevel(n, stride=1, phase=phase, rows=R, rows_next=R,
                         interpret=False)
    lvc = psw.PallasLevel(n // 2, stride=2, phase=None, Wp=lv.Wp, rows=R,
                          interpret=False)
    u_pad, f_pad = lv.pad(u), lv.pad(f)
    uc_pad = lvc.pad(jnp.zeros((n // 2 + 1, n // 2 + 1), jnp.float32)) + 0.1
    dst = lv.zeros()
    for v in variants:
        VARIANT[0] = v
        psw._run_sweep._clear_cache() if hasattr(psw._run_sweep, "_clear_cache") else None
        jax.clear_caches()

        def pstep2(a, b):
            a2, _ = lv.psweep(a, f_pad, uc_pad, R_up=R, dst=b, vmem_mb=vmem)
            b2, _ = lv.psweep(a2, f_pad, uc_pad, R_up=R, dst=a, vmem_mb=vmem)
            return b2, a2

        try:
            dt = time_pingpong(pstep2, u_pad, dst, iters=100)
            print(f"psweep R={R} vmem={vmem} {v:10s}  {dt*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"psweep R={R} vmem={vmem} {v:10s} FAILED: {str(e)[:120]}", flush=True)
