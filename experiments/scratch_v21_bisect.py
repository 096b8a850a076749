"""Scratch: bisect the v2 cycle at n=32 stage by stage vs XLA equivalents."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import multigrid as mgx
from multigrid_feanet_tpu.solvers import jacobi as jac
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

prob = Problem(n=32, inclusion=("circle", (0.0, 0.0), 0.5))
hier = GridHierarchy.create(prob)
ph2 = PallasHierarchyV2(prob, pallas_threshold=16, rows=32, interpret=True)
rng = np.random.default_rng(2)
f = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
u0 = jnp.zeros((33, 33), jnp.float32)
lv0, lv1, lv2 = hier.levels[0], hier.levels[1], hier.levels[2]
print("K =", ph2.K, "levels:", [lv.n for lv in hier.levels])

def d(name, a, b):
    print(f"{name:28s} {float(jnp.max(jnp.abs(a - b))):.3e}")

p0, p1, p2 = ph2.pl[0], ph2.pl[1], ph2.pl[2]
fb = p0.pad(f)

# stage 1: pre-sweep
u1b, _ = p0.sweep(p0.pad(u0), fb, dst=p0.zeros())
u1x = jac.jacobi_step(lv0, u0, f, 0.0, 2.0 / 3.0)
d("pre-sweep", p0.unpad(u1b), u1x)

# stage 2: restrict_residual
fcb, _ = p0.restrict_residual(u1b, fb)
rx = (f - lv0.apply(u1x)) * lv0.geo
fcx = 4.0 * restrict_full_weighting(rx)
d("fc (level1 rhs)", p1.unpad(fcb), fcx)

# stage 3: level-1 pre-sweep from zeros
uc1b, _ = p1.sweep(p1.zeros(), fcb, dst=p1.zeros())
uc1x = jac.jacobi_step(lv1, jnp.zeros_like(fcx), fcx, 0.0, 2.0 / 3.0)
d("level1 pre-sweep", p1.unpad(uc1b), uc1x)

# stage 4: level-1 restrict_residual
fc2b, _ = p1.restrict_residual(uc1b, fcb)
r1x = (fcx - lv1.apply(uc1x)) * lv1.geo
fc2x = 4.0 * restrict_full_weighting(r1x)
d("fc2 (level2 rhs)", p2.unpad(fc2b), fc2x)

# stage 5: XLA handoff subtree at level 2
uc2x = ph2._xla_vcycle(2, jnp.zeros_like(fc2x), fc2x, 1, 1)
uc2b = p2.pad(ph2._xla_vcycle(2, jnp.zeros_like(p2.unpad(fc2b)), p2.unpad(fc2b), 1, 1))
d("level2 solution", p2.unpad(uc2b), uc2x)

# stage 6: level-1 psweep
uc1b2, _ = p1.psweep(uc1b, fcb, uc2b, dst=p1.zeros(), vmem_mb=None)
uc1x2 = jac.jacobi_step(lv1, uc1x + prolong_bilinear(uc2x, lv1.geo), fcx, 0.0, 2.0 / 3.0)
d("level1 psweep", p1.unpad(uc1b2), uc1x2)

# stage 7: level-0 psweep
u2b, _ = p0.psweep(u1b, fb, uc1b2, dst=p0.zeros(), vmem_mb=None)
u2x = jac.jacobi_step(lv0, u1x + prolong_bilinear(uc1x2, lv0.geo), f, 0.0, 2.0 / 3.0)
d("level0 psweep", p0.unpad(u2b), u2x)

# compare _cycle0 composition against the staged version
u2b_c, sp, rsq = ph2._cycle0(p0.pad(u0), p0.zeros(), fb, 1, 1)
d("cycle0 vs staged", p0.unpad(u2b_c), p0.unpad(u2b))
# and _coarse_correction vs staged level-1 solution
uc1b_c = ph2._coarse_correction(1, fcb, 1, 1)
d("coarse_corr vs staged", p1.unpad(uc1b_c), p1.unpad(uc1b2))

# arbiter: mgx.v_cycle vs my chain
ux = mgx.v_cycle(hier, u0, f, 1, 1)
d("mgx vs my-chain final", ux, u2x)
# stagewise: mgx hand-unrolled with UNMASKED residual
u1m = jac.jacobi_step(lv0, u0, f, 0.0, 2.0 / 3.0)
d("stage1 mgx vs mine", u1m, u1x)
rm = f - lv0.apply(u1m)
fcm = 4.0 * restrict_full_weighting(rm)
d("stage2 fc mgx vs mine", fcm, fcx)
uc1m = jac.jacobi_step(lv1, jnp.zeros_like(fcm), fcm, 0.0, 2.0 / 3.0)
r1m = fcm - lv1.apply(uc1m)
fc2m = 4.0 * restrict_full_weighting(r1m)
d("stage4 fc2 mgx vs mine", fc2m, fc2x)
uc2m = mgx.v_cycle(hier, jnp.zeros_like(fc2m), fc2m, 1, 1, level=2)
d("stage5 uc2 mgx vs mine", uc2m, uc2x)
uc1m2 = jac.jacobi_step(lv1, uc1m + prolong_bilinear(uc2m, lv1.geo), fcm, 0.0, 2.0 / 3.0)
d("stage6 mgx vs mine", uc1m2, uc1x2)
u2m = jac.jacobi_step(lv0, u1m + prolong_bilinear(uc1m2, lv0.geo), f, 0.0, 2.0 / 3.0)
d("stage7 mgx vs mine", u2m, u2x)
d("hand-mgx vs mgx", u2m, ux)
