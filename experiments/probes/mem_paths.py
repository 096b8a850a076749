"""Scratch: DMA queue parallelism — priorities, split streams, HBM-HBM, aliasing."""
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


def bench(make_run, x0, iters=200, label="", bytes_per=12 * Hp * Wp):
    try:
        run = make_run()
        r = run(x0); jax.block_until_ready(r)
        t0 = time.time(); r = run(x0); jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"{label:40s} {dt*1e6:8.1f} us  {bytes_per/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{label:40s} FAILED {str(e)[:140]}", flush=True)


def scan200(step):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=200)
        return c
    return run


# 0) sanity: XLA add with non-simplifiable op (fma with const)
bench(lambda: scan200(lambda c: c * 0.999 + f), u, label="xla_fma")

# A) pipeline copy with input_output_aliases (in-place u)
def pipe_alias(rows):
    def kernel(u_ref, f_ref, o_ref):
        o_ref[...] = u_ref[...] + f_ref[...]
    def step(c):
        return pl.pallas_call(
            kernel, grid=(Hp // rows,),
            in_specs=[pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            input_output_aliases={0: 0},
        )(c, f)
    return scan200(step)

for rows in (64, 128):
    bench(lambda rows=rows: pipe_alias(rows), u, label=f"pipe_alias rows={rows}")

# B) manual copy, each block split into C column-chunk DMAs (parallel streams)
def manual_cols(rows, C):
    nb = Hp // rows
    wc = Wp // C
    def kernel(u_hbm, f_ref, o_ref, scratch, sems):
        i = pl.program_id(0)
        def dmas(block, slot):
            return [pltpu.make_async_copy(
                        u_hbm.at[pl.ds(block * rows, rows), pl.ds(c * wc, wc)],
                        scratch.at[slot, :, pl.ds(c * wc, wc)],
                        sems.at[slot, c])
                    for c in range(C)]
        @pl.when(i == 0)
        def _():
            for d in dmas(0, 0):
                d.start()
        @pl.when(i + 1 < nb)
        def _():
            for d in dmas(i + 1, (i + 1) % 2):
                d.start()
        for d in dmas(i, i % 2):
            d.wait()
        o_ref[...] = scratch[i % 2] + f_ref[...]
    def step(c):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, rows, Wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, C))],
        )(c, f)
    return scan200(step)

for C in (2, 4):
    bench(lambda C=C: manual_cols(128, C), u, label=f"manual_cols rows=128 C={C}")

# C) manual copy with alternating DMA priorities
def manual_prio(rows):
    nb = Hp // rows
    def kernel(u_hbm, f_ref, o_ref, scratch, sems):
        i = pl.program_id(0)
        def dma(block, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(block * rows, rows)], scratch.at[slot], sems.at[slot])
        @pl.when(i == 0)
        def _():
            dma(0, 0).start(priority=0)
        @pl.when(i + 1 < nb)
        def _():
            dma(i + 1, (i + 1) % 2).start(priority=1)
        dma(i, i % 2).wait()
        o_ref[...] = scratch[i % 2] + f_ref[...]
    def step(c):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, rows, Wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(c, f)
    return scan200(step)

bench(lambda: manual_prio(128), u, label="manual_prio rows=128")

# D) raw whole-buffer HBM->HBM DMA (one stream, max size): 8 B/node
def hbm_copy():
    def kernel(u_hbm, o_hbm, sem):
        d = pltpu.make_async_copy(u_hbm, o_hbm, sem)
        d.start()
        d.wait()
    def step(c):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(c)
    return scan200(step)

bench(lambda: hbm_copy(), u, label="hbm_to_hbm whole", bytes_per=8 * Hp * Wp)

# E) raw HBM->HBM via 4 parallel row-chunk DMAs
def hbm_copy4():
    def kernel(u_hbm, o_hbm, sems):
        q = Hp // 4
        ds = [pltpu.make_async_copy(u_hbm.at[pl.ds(k * q, q)],
                                    o_hbm.at[pl.ds(k * q, q)], sems.at[k])
              for k in range(4)]
        for d in ds:
            d.start()
        for d in ds:
            d.wait()
    def step(c):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(c)
    return scan200(step)

bench(lambda: hbm_copy4(), u, label="hbm_to_hbm 4 streams", bytes_per=8 * Hp * Wp)
