"""Scratch: honest v2 cycle breakdown at 4097^2 on TPU.

- rr timing with a real data dependency (dynamic_update_slice into the carry)
  at R=64 and R=128, hom and bim.
- full _cycle0 scan vs _cycle0 with the coarse subtree stubbed out.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_breakdown.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

n = 4096
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
phase = geometry.circle_phase(2.0, n)


def timeit(fn, *args, iters=100):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time(); r = fn(*args); jax.block_until_ready(r)
    return (time.time() - t0) / iters


# --- rr with real dependency ---
for R in (64, 128):
    for name, ph in (("hom", None), ("bim", phase)):
        try:
            lv = PallasLevel(n, stride=1, phase=ph, rows=R, rows_next=R,
                             interpret=False)
            u_pad, f_pad = lv.pad(u), lv.pad(f)
            tile = jnp.zeros((8, 128), jnp.float32)
            iters = 100

            @jax.jit
            def loop_rr(u_pad, f_pad):
                def body(up, _):
                    fc, rsq = lv.restrict_residual(up, f_pad)
                    up = jax.lax.dynamic_update_slice(
                        up, tile + rsq * 1e-38, (0, 0))
                    return up, None
                return jax.lax.scan(body, u_pad, None, length=iters)[0]

            dt = timeit(loop_rr, u_pad, f_pad, iters=iters)
            print(f"rr(dep) R={R} {name}: {dt*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"rr(dep) R={R} {name} FAILED: {str(e)[:120]}", flush=True)

# --- full cycle vs stubbed subtree ---
for name, inc in (("hom", None), ("bim", ("circle", (0.0, 0.0), 0.5))):
    prob = Problem(n=n, inclusion=inc)
    ph2 = PallasHierarchyV2(prob, num_levels=7, pallas_threshold=128,
                            rows=64, direct_coarse=True)
    p0 = ph2.pl[0]
    fb = p0.pad(f)
    iters = 40

    @jax.jit
    def loop_full(ub, sp):
        def body(c, _):
            ub, sp, rsq = ph2._cycle0(c[0], c[1], fb, 1, 1)
            return (ub, sp), None
        return jax.lax.scan(body, (ub, sp), None, length=iters)[0][0]

    dt_full = timeit(loop_full, p0.pad(u), p0.zeros(), iters=iters)

    orig = ph2._coarse_correction
    ph2._coarse_correction = lambda l, fcb, nu1, nu2: ph2.pl[1].zeros()

    @jax.jit
    def loop_l0(ub, sp):
        def body(c, _):
            ub, sp, rsq = ph2._cycle0(c[0], c[1], fb, 1, 1)
            return (ub, sp), None
        return jax.lax.scan(body, (ub, sp), None, length=iters)[0][0]

    dt_l0 = timeit(loop_l0, p0.pad(u), p0.zeros(), iters=iters)
    ph2._coarse_correction = orig
    print(f"cycle {name}: full={dt_full*1e3:.2f} ms  L0-only={dt_l0*1e3:.2f} ms  "
          f"subtree={1e3*(dt_full-dt_l0):.2f} ms", flush=True)
