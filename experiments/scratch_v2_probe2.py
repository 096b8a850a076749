"""Scratch: (a) does v1 also diverge on bim 4097^2 V(1,1)? (b) v2 with
direct solve at n=64; (c) rr-hom slowness vs bim-with-zero-phase.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_probe2.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel

n = 4096
print("device:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)
u0 = (150000.0 * jax.random.uniform(key, (n + 1, n + 1))).astype(jnp.float32)
f0 = jnp.zeros((n + 1, n + 1), jnp.float32)

# (c) rr timing: hom kernel vs bim kernel with da=0 (same math)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
for name, phase in (("hom", None), ("bim_da0", np.zeros((n, n), np.int8))):
    lv = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 1.0),
                     rows=64, rows_next=64, interpret=False)
    u_pad, f_pad = lv.pad(u), lv.pad(f)
    iters = 100

    @jax.jit
    def loop_rr(u_pad, s0):
        def body(c, _):
            fc, rsq = lv.restrict_residual(u_pad + c * 1e-30, f_pad)
            return rsq * 1e-38, None
        return jax.lax.scan(body, s0, None, length=iters)[0]

    r = loop_rr(u_pad, jnp.float32(0)); jax.block_until_ready(r)
    t0 = time.time(); r = loop_rr(u_pad, jnp.float32(0)); jax.block_until_ready(r)
    print(f"rr {name}: {(time.time()-t0)/iters*1e6:8.1f} us", flush=True)

# (b) v2 deeper truncation
for bim in (False, True):
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
    for nlev, thresh in ((7, 128), (6, 128)):
        ph = PallasHierarchyV2(prob, num_levels=nlev, pallas_threshold=thresh,
                               rows=64, direct_coarse=True)
        u, hist = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=40)
        t0 = time.time()
        u, hist = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=40)
        dt = time.time() - t0
        q = float(hist[-1] / hist[-2]) if len(hist) > 1 else float("nan")
        print(f"v2 bim={int(bim)} nlev={nlev} thresh={thresh}: {dt*1e3:7.1f} ms "
              f"cycles={len(hist)} ({dt/(len(hist)+1)*1e3:.2f} ms/cyc) "
              f"final={hist[-1]:.2e} q={q:.3f}", flush=True)

# (a) v1 bim 4097^2 V(1,1): diverges too?
prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5))
hier = GridHierarchy.create(prob)
ph1 = PallasHierarchy(hier, pallas_threshold=256)
u, hist = ph1.solve(f0, u0=u0, eps=1e-6, max_cycles=30)
q = float(hist[-1] / hist[-2]) if len(hist) > 1 else float("nan")
print(f"v1 bim 4097 V(1,1): cycles={len(hist)} final={hist[-1]:.2e} q={q:.3f}",
      flush=True)
