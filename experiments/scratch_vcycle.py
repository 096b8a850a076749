"""Scratch: per-component breakdown of the 4097^2 V-cycle on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear

n = 4096
prob = Problem(n=n, size=2.0, coefficients=(1.0, 20.0), inclusion=("circle", (0.0, 0.0), 0.5))
hier = GridHierarchy.create(prob)
ph = PallasHierarchy(hier, interpret=False)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)


def timeit(fn, *args, iters=50):
    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(*c), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c
    r = run(*args); jax.block_until_ready(r)
    t0 = time.time(); r = run(*args); jax.block_until_ready(r)
    return (time.time() - t0) / iters


ps0 = ph.ps[0]
u_pad, f_pad = ps0.pad(u), ps0.pad(f)

# full V-cycle
def vc(u_pad, f_pad):
    return ph.v_cycle(u_pad, f_pad, 1, 1), f_pad
dt = timeit(vc, u_pad, f_pad)
print(f"v_cycle total        {dt*1e3:8.3f} ms", flush=True)

# finest-level pieces
def sweep(u_pad, f_pad):
    un, _ = ps0.sweep_padded(u_pad, f_pad)
    return un, f_pad
print(f"finest sweep         {timeit(sweep, u_pad, f_pad)*1e3:8.3f} ms", flush=True)

def resid(u_pad, f_pad):
    r, _ = ps0.residual_padded(u_pad, f_pad)
    return r, f_pad
print(f"finest residual      {timeit(resid, u_pad, f_pad)*1e3:8.3f} ms", flush=True)

r_plain = ph._residual_plain(0, u_pad, f_pad)

def unpad_only(u_pad, f_pad):
    r = ps0.unpad(u_pad)
    return ps0.pad(r), f_pad
print(f"unpad+pad finest     {timeit(unpad_only, u_pad, f_pad)*1e3:8.3f} ms", flush=True)

def restrict_op(r, f_pad):
    rc = 4.0 * restrict_full_weighting(r)
    return prolong_bilinear(rc, hier.levels[0].geo), f_pad  # round trip keeps shape
print(f"restrict+prolong     {timeit(restrict_op, r_plain, f_pad)*1e3:8.3f} ms", flush=True)

def restrict_only(r, z):
    rc = 4.0 * restrict_full_weighting(r)
    return r, rc.sum() + z
print(f"restrict only        {timeit(restrict_only, r_plain, jnp.float32(0))*1e3:8.3f} ms", flush=True)

rc = 4.0 * restrict_full_weighting(r_plain)
def prolong_only(rc, z):
    c = prolong_bilinear(rc, hier.levels[0].geo)
    return rc, c.sum() + z
print(f"prolong only         {timeit(prolong_only, rc, jnp.float32(0))*1e3:8.3f} ms", flush=True)

# to_level pad for level 1 + level-1 cycle cost: time v_cycle at level 1
ps1 = ph.ps[1]
f1 = ps1.pad(rc)
u1 = ph._zeros(1)
def vc1(u1, f1):
    return ph.v_cycle(u1, f1, 1, 1, level=1), f1
print(f"v_cycle from level1  {timeit(vc1, u1, f1)*1e3:8.3f} ms", flush=True)

ps2 = ph.ps[2]
f2 = ps2.pad(jnp.zeros((1025, 1025), jnp.float32))
u2 = ph._zeros(2)
def vc2(u2, f2):
    return ph.v_cycle(u2, f2, 1, 1, level=2), f2
print(f"v_cycle from level2  {timeit(vc2, u2, f2)*1e3:8.3f} ms", flush=True)

print(f"levels: {[lv.n for lv in hier.levels]}, pallas: {[p is not None for p in ph.ps]}", flush=True)
