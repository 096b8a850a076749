"""Scratch: sweep-kernel timing vs row-block size on the real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil

n = 4096
phase = geometry.circle_phase(2.0, n)
pid = stencil.pattern_ids(jnp.asarray(phase))
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)

def timeit(ps, u_pad, f_pad, iters=200):
    @jax.jit
    def run(u_pad):
        def body(c, _):
            un, _ = ps.sweep_padded(c, f_pad)
            return un, None
        c, _ = jax.lax.scan(body, u_pad, None, length=iters)
        return c
    r = run(u_pad); r.block_until_ready()
    t0 = time.time(); r = run(u_pad); r.block_until_ready()
    return (time.time() - t0) / iters

for rows in (32, 64, 96, 128):
    for bim in (True, False):
        try:
            ps = PallasStencil(n, pid=pid if bim else None, interpret=False, rows=rows)
            dt = timeit(ps, ps.pad(u), ps.pad(f))
            bw = (13 if bim else 12) * ps.Hp * ps.Wp / dt / 1e9
            print(f"rows={rows:4d} bim={bim}  {dt*1e6:8.1f} us  {bw:6.1f} GB/s eff", flush=True)
        except Exception as e:
            print(f"rows={rows:4d} bim={bim}  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
