"""Scratch: round-2 kernel perf on the real TPU at 4097^2.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_tpu.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
from multigrid_feanet_tpu.ops import stencil

n = 4096
H = n + 1
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
u = u.at[0, :].set(0).at[-1, :].set(0).at[:, 0].set(0).at[:, -1].set(0)
f = jnp.asarray(rng.standard_normal((H, H)), jnp.float32)
phase = geometry.circle_phase(2.0, n)
print("device:", jax.devices()[0], flush=True)


def time_pingpong(step2, a, b, iters=200):
    """step2: (a, b) -> (a2, b2) doing TWO sweeps with buffers returning to
    their slots."""
    @jax.jit
    def loop(a, b):
        def body(c, _):
            return step2(*c), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=iters // 2)
        return a
    r = loop(a, b); jax.block_until_ready(r)
    t0 = time.time(); r = loop(a, b); jax.block_until_ready(r)
    return (time.time() - t0) / iters


for R in (32, 64, 128):
    for bim in (True, False):
        try:
            lv = PallasLevel(n, stride=1, phase=phase if bim else None,
                             rows=R, interpret=False)
            u_pad, f_pad = lv.pad(u), lv.pad(f)
            dst = lv.zeros()

            def step2(a, b, lv=lv, f_pad=f_pad):
                a2, _ = lv.sweep(a, f_pad, dst=b)
                b2, _ = lv.sweep(a2, f_pad, dst=a)
                return b2, a2

            dt = time_pingpong(step2, u_pad, dst)
        except Exception as e:
            print(f"R={R} bim={bim} FAILED: {str(e)[:200]}", flush=True)
            continue
        byt = (13 if bim else 12) * lv.Hp * lv.Wp
        print(f"sweep R={R:4d} bim={int(bim)}  {dt*1e6:8.1f} us  "
              f"{byt/dt/1e9:6.1f} GB/s eff", flush=True)

# correctness on-chip vs the round-1 kernel
lv = PallasLevel(n, stride=1, phase=phase, rows=64, interpret=False)
pid = stencil.pattern_ids(jnp.asarray(phase))
ps = PallasStencil(n, pid=pid, interpret=False)
got, rsq = lv.sweep(lv.pad(u), lv.pad(f))
want, rsq1 = ps.sweep_padded(ps.pad(u), ps.pad(f))
err = float(jnp.max(jnp.abs(lv.unpad(got) - ps.unpad(want))))
sc = float(jnp.max(jnp.abs(ps.unpad(want))))
print(f"sweep vs v1 on-chip: max|diff|={err:.3e} (scale {sc:.1f}), "
      f"rsq rel={abs(float(rsq)-float(rsq1))/float(rsq1):.3e}", flush=True)

# restrict_residual + psweep timing (fresh output; not aliased)
for R in (32, 64):
    for bim in (True, False):
        lv = PallasLevel(n, stride=1, phase=phase if bim else None, rows=R,
                         rows_next=R, interpret=False)
        lvc = PallasLevel(n // 2, stride=2, phase=None, Wp=lv.Wp, rows=R,
                          interpret=False)
        u_pad, f_pad = lv.pad(u), lv.pad(f)
        iters = 100

        @jax.jit
        def loop_rr(u_pad):
            def body(c, _):
                fc, rsq = lv.restrict_residual(u_pad, f_pad)
                return c + fc[R, 0], None
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

        r = loop_rr(u_pad); jax.block_until_ready(r)
        t0 = time.time(); r = loop_rr(u_pad); jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"restrict_residual R={R} bim={int(bim)}  {dt*1e6:8.1f} us", flush=True)

        uc_pad = lvc.pad(jnp.zeros((n // 2 + 1, n // 2 + 1), jnp.float32)) + 0.1
        dst = lv.zeros()

        def pstep2(a, b):
            a2, _ = lv.psweep(a, f_pad, uc_pad, R_up=R, dst=b)
            b2, _ = lv.psweep(a2, f_pad, uc_pad, R_up=R, dst=a)
            return b2, a2

        try:
            dt = time_pingpong(pstep2, u_pad, dst, iters=100)
            print(f"psweep R={R} bim={int(bim)}  {dt*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"psweep R={R} bim={int(bim)} FAILED: {str(e)[:160]}", flush=True)
