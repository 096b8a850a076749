"""Scratch: v2 fused V-cycle solve at 4097^2 on the real TPU — config scan.
Protocol = bench.py: f=0, random u0 (scale 1.5e5), V(1,1) to 1e-6 abs.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_solve_tpu.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

n = 4096
print("device:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)
u0 = (150000.0 * jax.random.uniform(key, (n + 1, n + 1))).astype(jnp.float32)
f0 = jnp.zeros((n + 1, n + 1), jnp.float32)

for bim in (False, True):
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
    for nlev, thresh, rows, direct in (
        (None, 256, 64, False),   # full depth, relax-only coarsest (r1 bench cfg)
        (9, 256, 64, True),       # truncated at n=16 + direct solve
        (9, 512, 64, True),       # handoff to XLA below 512
        (9, 128, 64, True),       # pallas down to 128
        (9, 256, 32, True),       # smaller row blocks
    ):
        try:
            ph = PallasHierarchyV2(prob, num_levels=nlev, pallas_threshold=thresh,
                                   rows=rows, direct_coarse=direct)
            u, hist = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=60)  # compile
            t0 = time.time()
            u, hist = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=60)
            dt = time.time() - t0
            q = float(hist[-1] / hist[-2]) if len(hist) > 1 else float("nan")
            print(f"bim={int(bim)} nlev={nlev} thresh={thresh} rows={rows} "
                  f"direct={int(direct)}: {dt*1e3:7.1f} ms  cycles={len(hist)} "
                  f"({dt/(len(hist)+1)*1e3:.2f} ms/cyc)  final={hist[-1]:.2e} q={q:.3f}",
                  flush=True)
        except Exception as e:
            print(f"bim={int(bim)} nlev={nlev} thresh={thresh} rows={rows} "
                  f"FAILED: {str(e)[:150]}", flush=True)
