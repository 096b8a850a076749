"""Scratch: arbitrate V(2,1) first-cycle parity: XLA vs v1 vs v2."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers import multigrid as mgx
from multigrid_feanet_tpu.solvers.jacobi import interior_norm
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5))
hier = GridHierarchy.create(prob)
ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True)
ph2 = PallasHierarchyV2(prob, pallas_threshold=16, rows=32, interpret=True)
rng = np.random.default_rng(2)
f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
u0 = jnp.zeros((33, 33), jnp.float32)
lv0 = hier.finest

for nu1, nu2 in ((1, 1), (2, 1)):
    # XLA
    ux = mgx.v_cycle(hier, u0, f, nu1, nu2)
    rx = float(interior_norm(f - lv0.apply(ux)))
    # v1
    u1 = ph1.v_cycle(ph1._to_level(0, u0), ph1._to_level(0, f), nu1, nu2)
    r1 = float(ph1._finest_res_norm(u1, ph1._to_level(0, f)))
    # v2
    p0 = ph2.pl[0]
    u2, sp, _ = ph2._cycle0(p0.pad(u0), p0.zeros(), p0.pad(f), nu1, nu2)
    _, rsq2 = p0.residual(u2, p0.pad(f))
    r2 = float(jnp.sqrt(rsq2))
    u1p, u2p = np.asarray(ph1._as_plain(0, u1)), np.asarray(p0.unpad(u2))
    uxp = np.asarray(ux)
    print(f"V({nu1},{nu2}): res xla={rx:.6e} v1={r1:.6e} v2={r2:.6e}")
    print(f"   u: |v1-xla|={np.max(np.abs(u1p-uxp)):.2e} "
          f"|v2-xla|={np.max(np.abs(u2p-uxp)):.2e} "
          f"|v2-v1|={np.max(np.abs(u2p-u1p)):.2e}")
