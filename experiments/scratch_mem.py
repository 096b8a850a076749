"""Scratch: memory-path ceilings — XLA elementwise vs pallas pipeline vs manual DMA."""
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


def timeit(step, x0, iters=200):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c
    r = run(x0); jax.block_until_ready(r)
    t0 = time.time(); r = run(x0); jax.block_until_ready(r)
    return (time.time() - t0) / iters


# 1) XLA elementwise add: 12 B/node
dt = timeit(lambda c: c + f, u)
print(f"xla_add            {dt*1e6:8.1f} us  {12*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)

# 1b) XLA 9-point homogeneous stencil via shifts (pad-free roll): ~12 B/node
def xla_s9(c):
    acc = 2.0 * c
    for sh, ax in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
        acc = acc + jnp.roll(c, sh, axis=ax)
    return acc + f
dt = timeit(xla_s9, u)
print(f"xla_s9_roll        {dt*1e6:8.1f} us  {12*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)

# 2) pallas pipeline-only copy (no manual DMA), various rows
def pipe_copy(rows):
    def kernel(u_ref, f_ref, o_ref):
        o_ref[...] = u_ref[...] + f_ref[...]
    @jax.jit
    def run(c):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                grid=(Hp // rows,),
                in_specs=[pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            )(c, f)
            return out, None
        c, _ = jax.lax.scan(body, c, None, length=200)
        return c
    return run

for rows in (32, 64, 128, 256, 512):
    try:
        run = pipe_copy(rows)
        r = run(u); jax.block_until_ready(r)
        t0 = time.time(); r = run(u); jax.block_until_ready(r)
        dt = (time.time() - t0) / 200
        print(f"pipe_copy rows={rows:4d} {dt*1e6:8.1f} us  {12*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"pipe_copy rows={rows:4d} FAILED {str(e)[:100]}", flush=True)

# 3) manual-DMA copy at bigger rows (copy kernel only needs 2 slots + out)
def manual_copy(rows):
    HpG = Hp + 2 * rows
    def kernel(u_hbm, f_ref, o_ref, scratch, sems):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        def dma(block, slot):
            start = pl.multiple_of((block + 1) * rows - 8, 8)
            return pltpu.make_async_copy(u_hbm.at[pl.ds(start, rows + 16)],
                                         scratch.at[slot], sems.at[slot])
        @pl.when(i == 0)
        def _():
            dma(0, 0).start()
        @pl.when(i + 1 < nb)
        def _():
            dma(i + 1, (i + 1) % 2).start()
        dma(i, i % 2).wait()
        o_ref[...] = scratch[i % 2][8:8 + rows, :] + f_ref[...]
    up = jnp.zeros((HpG, Wp), jnp.float32).at[rows:rows + Hp].set(u)
    fp = jnp.zeros((HpG, Wp), jnp.float32).at[rows:rows + Hp].set(f)
    @jax.jit
    def run(c):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                grid=(Hp // rows,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((HpG, Wp), jnp.float32),
                scratch_shapes=[pltpu.VMEM((2, rows + 16, Wp), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            )(c, fp)
            return out, None
        c, _ = jax.lax.scan(body, c, None, length=200)
        return c
    return run, up

for rows in (64, 128, 256):
    try:
        run, up = manual_copy(rows)
        r = run(up); jax.block_until_ready(r)
        t0 = time.time(); r = run(up); jax.block_until_ready(r)
        dt = (time.time() - t0) / 200
        print(f"manual_copy rows={rows:4d} {dt*1e6:8.1f} us  {12*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"manual_copy rows={rows:4d} FAILED {str(e)[:100]}", flush=True)
