"""Scratch: sweep kernel with donated-dst aliasing (ping-pong, no carry copy)."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import (
    PallasStencil, _apply_taps, _diag, _interior_mask)

n = 4096
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
phase = geometry.circle_phase(2.0, n)
pid = stencil.pattern_ids(jnp.asarray(phase))


def make_sweep(ps, bim=True):
    rows, H, W, Wp = ps.rows, ps.H, ps.W, ps.Wp
    a0, da, omega = ps.a0, ps.da, ps.omega

    def kernel(u_hbm, f_ref, pid_ref, dst_ref, u_out, rsq_ref, scratch, sems):
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
        tile = scratch[i % 2]
        pid_blk = pid_ref[...] if bim else None
        au = _apply_taps(tile, pid_blk, rows, a0, da, bim)
        r = f_ref[...] - au
        r = jnp.where(_interior_mask(i, rows, Wp, H, W), r, 0.0)
        d = _diag(pid_blk, a0, da, bim, r.dtype)
        u_out[...] = tile[8:8 + rows, :] + (omega / d) * r
        rsq_ref[i, 0] = jnp.sum(r * r)

    HpG = ps.Hp + 2 * rows
    nb = ps.Hp // rows
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM)
         if bim else pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        pl.BlockSpec(memory_space=pl.ANY),  # dst (donated, never read)
    ]

    @jax.jit
    def sweep(u_pad, f_pad, pid_pad, dst):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((HpG, Wp), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((2, rows + 16, Wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            input_output_aliases={3: 0},
            cost_estimate=pl.CostEstimate(
                flops=(50 if bim else 18) * ps.Hp * Wp,
                bytes_accessed=(13 if bim else 12) * ps.Hp * Wp, transcendentals=0),
        )(u_pad, f_pad, pid_pad if bim else jnp.zeros((32, 128), jnp.int8), dst)
    return sweep


def bench(ps, bim, iters=200):
    sweep = make_sweep(ps, bim)
    u_pad, f_pad = ps.pad(u), ps.pad(f)
    dst = jnp.zeros_like(u_pad)

    @jax.jit
    def run(a, b):
        def body(c, _):
            a, b = c
            a2, _ = sweep(a, f_pad, ps.pid_pad, b)   # writes into b's buffer
            b2, _ = sweep(a2, f_pad, ps.pid_pad, a)  # writes into a's buffer
            return (b2, a2), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=iters // 2)
        return a
    r = run(u_pad, dst); jax.block_until_ready(r)
    t0 = time.time(); r = run(u_pad, dst); jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    byt = (13 if bim else 12) * ps.Hp * ps.Wp
    print(f"alias_sweep bim={bim} rows={ps.rows:4d} {dt*1e6:8.1f} us  "
          f"{byt/dt/1e9:6.1f} GB/s eff", flush=True)
    # correctness vs existing kernel
    ref, _ = ps.sweep_padded(u_pad, f_pad)
    got, _ = sweep(u_pad, f_pad, ps.pid_pad, jnp.zeros_like(u_pad))
    err = float(jnp.max(jnp.abs(ps.unpad(ref) - ps.unpad(got))))
    print(f"  max|diff| vs existing kernel: {err:.3e}", flush=True)


for rows in (32, 64, 128):
    for bim in (True, False):
        try:
            ps = PallasStencil(n, pid=pid if bim else None, interpret=False, rows=rows)
            bench(ps, bim)
        except Exception as e:
            print(f"rows={rows} bim={bim} FAILED {str(e)[:140]}", flush=True)
