"""Scratch: can the pallas copy reach XLA's 838 GB/s? Multi-buffering + manual loop."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Hp, Wp = 4224, 4224
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((Hp, Wp)), jnp.float32)
f = jnp.asarray(rng.standard_normal((Hp, Wp)), jnp.float32)


def bench(make_run, x0, iters=200, label=""):
    try:
        run = make_run()
        r = run(x0); jax.block_until_ready(r)
        t0 = time.time(); r = run(x0); jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"{label:34s} {dt*1e6:8.1f} us  {12*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{label:34s} FAILED {str(e)[:120]}", flush=True)


# A) pipeline copy with buffer_count
def pipe_copy(rows, nbuf):
    def kernel(u_ref, f_ref, o_ref):
        o_ref[...] = u_ref[...] + f_ref[...]
    bs = lambda: pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM,
                              pipeline_mode=pl.Buffered(buffer_count=nbuf))
    @jax.jit
    def run(c):
        def body(c, _):
            out = pl.pallas_call(
                kernel, grid=(Hp // rows,),
                in_specs=[bs(), bs()],
                out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM,
                                       pipeline_mode=pl.Buffered(buffer_count=nbuf)),
                out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            )(c, f)
            return out, None
        c, _ = jax.lax.scan(body, c, None, length=200)
        return c
    return run

for rows in (32, 64):
    for nbuf in (3, 4):
        bench(lambda rows=rows, nbuf=nbuf: pipe_copy(rows, nbuf), u,
              label=f"pipe_copy rows={rows} nbuf={nbuf}")

# B) fully manual: grid=(1,), fori_loop with S-slot double buffering both directions
def manual_full(rows, S):
    nb = Hp // rows
    def kernel(u_hbm, f_hbm, o_hbm, us, fs, os_, in_sems, out_sems):
        def in_dma(b, slot):
            return (pltpu.make_async_copy(u_hbm.at[pl.ds(b * rows, rows)], us.at[slot], in_sems.at[slot, 0]),
                    pltpu.make_async_copy(f_hbm.at[pl.ds(b * rows, rows)], fs.at[slot], in_sems.at[slot, 1]))
        def out_dma(b, slot):
            return pltpu.make_async_copy(os_.at[slot], o_hbm.at[pl.ds(b * rows, rows)], out_sems.at[slot])
        for b in range(min(S, nb)):
            for d in in_dma(b, b % S):
                d.start()
        def body(b, _):
            slot = b % S
            for d in in_dma(b, slot):
                d.wait()
            # wait for previous out DMA using this slot
            @pl.when(b >= S)
            def _():
                out_dma(b - S, slot).wait()
            os_[slot] = us[slot] + fs[slot]
            out_dma(b, slot).start()
            @pl.when(b + S < nb)
            def _():
                for d in in_dma(b + S, slot):
                    d.start()
            return _
        jax.lax.fori_loop(0, nb, body, None)
        for b in range(max(0, nb - S), nb):
            out_dma(b, b % S).wait()
    @jax.jit
    def run(c):
        def body(c, _):
            out = pl.pallas_call(
                kernel, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                scratch_shapes=[pltpu.VMEM((S, rows, Wp), jnp.float32)] * 3 +
                               [pltpu.SemaphoreType.DMA((S, 2)), pltpu.SemaphoreType.DMA((S,))],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(c, f)
            return out, None
        c, _ = jax.lax.scan(body, c, None, length=200)
        return c
    return run

for rows in (32, 64, 128):
    for S in (3, 4):
        bench(lambda rows=rows, S=S: manual_full(rows, S), u,
              label=f"manual_full rows={rows} S={S}")
