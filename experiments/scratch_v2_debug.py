"""Scratch: debug v2 cycle vs v1 cycle step by step (CPU interpret)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

prob = Problem(n=64, inclusion=("circle", (0.0, 0.0), 0.5))
hier = GridHierarchy.create(prob, None)
ph1 = PallasHierarchy(hier, pallas_threshold=16, interpret=True, direct_coarse=False)
ph2 = PallasHierarchyV2(prob, num_levels=None, pallas_threshold=16,
                        rows=32, interpret=True, direct_coarse=False)
print("v2 K =", ph2.K, "num pl levels:", len(ph2.pl), "L =", ph2.hier.num_levels)

rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((65, 65)), jnp.float32)
u = jnp.zeros((65, 65), jnp.float32)

# one v1 cycle
u1 = ph1._to_level(0, u)
f1 = ph1._to_level(0, f)
for c in range(14):
    u1 = ph1.v_cycle(u1, f1, 1, 1)
    r1 = ph1._finest_res_norm(u1, f1)
    print(f"v1 cycle {c}: res={float(r1):.6e}")
u1p = ph1._as_plain(0, u1)

# v2 cycles
p0 = ph2.pl[0]
u2 = p0.pad(u)
sp = p0.zeros()
fb = p0.pad(f)
for c in range(14):
    u2, sp, rsq = ph2._cycle0(u2, sp, fb, 1, 1)
    _, rsq_post = p0.residual(u2, fb)
    print(f"v2 cycle {c}: pre={float(jnp.sqrt(rsq)):.6e} post={float(jnp.sqrt(rsq_post)):.6e}")
u2p = p0.unpad(u2)
print("u diff after 14 cycles:", float(jnp.max(jnp.abs(u1p - u2p))),
      "scale", float(jnp.max(jnp.abs(u1p))))
