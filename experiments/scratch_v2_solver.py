"""Scratch: v2 fused V-cycle vs round-1 solver parity on CPU (interpret).
Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/scratch_v2_solver.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

for bim in (False, True):
    for nlev, direct in ((None, False), (4, True)):
        prob = Problem(n=64, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None)
        hier = GridHierarchy.create(prob, nlev)
        ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True,
                              direct_coarse=direct)
        ph2 = PallasHierarchyV2(prob, num_levels=nlev, pallas_threshold=16,
                                rows=32, interpret=True, direct_coarse=direct)
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.standard_normal((65, 65)), jnp.float32)
        u1, h1 = ph1.solve(f, eps=1e-3, max_cycles=40)
        u2, h2 = ph2.solve(f, eps=1e-3, max_cycles=40)
        m = min(len(h1), len(h2))
        dh = np.max(np.abs(np.asarray(h1)[:m] - np.asarray(h2)[:m]) /
                    np.asarray(h1)[:m])
        print(f"bim={bim} nlev={nlev} direct={direct}: cycles v1={len(h1)} "
              f"v2={len(h2)} hist_rel_diff={dh:.2e}", flush=True)
        assert len(h1) == len(h2), (h1, h2)
        assert dh < 5e-3
print("v2 solver parity OK")
