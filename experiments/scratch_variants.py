"""Scratch: isolate memory vs compute cost of the sweep kernel on TPU."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil, _S9, _S4, _diag

n = 4096
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
phase = geometry.circle_phase(2.0, n)
pid = stencil.pattern_ids(jnp.asarray(phase))


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


def make_variant(ps, mode, with_pid=True, with_f=True, with_rsq=True):
    """mode: copy | s9_norolls | s9 | full"""
    rows, H, W, Wp = ps.rows, ps.H, ps.W, ps.Wp
    a0, da, omega = ps.a0, ps.da, ps.omega
    bim = with_pid and ps.pid_pad is not None

    def kernel(u_hbm, f_ref, pid_ref, u_out, rsq_ref, scratch, sems):
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
        if mode == "copy":
            out = tile[8:8 + rows, :]
            if with_f:
                out = out + f_ref[...]
            if bim:
                out = out + pid_ref[...].astype(jnp.float32)
            u_out[...] = out
            if with_rsq:
                rsq_ref[i, 0] = tile[8, 0]
            return
        # stencil accumulation
        rolled = {0: tile}
        if mode != "s9_norolls":
            rolled[1] = pltpu.roll(tile, Wp - 1, 1)
            rolled[-1] = pltpu.roll(tile, 1, 1)
        else:
            rolled[1] = tile
            rolled[-1] = tile
        acc = None
        for (dr, dc), w in _S9.items():
            term = (a0 * w) * rolled[dc][8 + dr:8 + dr + rows, :]
            acc = term if acc is None else acc + term
        if mode == "full" and bim:
            p = pid_ref[...].astype(jnp.int32)
            for e, taps in enumerate(_S4):
                bit = ((p >> e) & 1).astype(jnp.float32)
                t4 = None
                for (dr, dc), w in taps.items():
                    term = w * rolled[dc][8 + dr:8 + dr + rows, :]
                    t4 = term if t4 is None else t4 + term
                acc = acc + (da * bit) * t4
        r = f_ref[...] - acc
        gr = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
        interior = (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)
        r = jnp.where(interior, r, 0.0)
        if mode == "full" and bim:
            d = _diag(p, a0, da, True, r.dtype)
        else:
            d = jnp.asarray(4.0 * (2.0 / 3.0) * a0, r.dtype)
        u_out[...] = tile[8:8 + rows, :] + (omega / d) * r
        if with_rsq:
            rsq_ref[i, 0] = jnp.sum(r * r)

    @jax.jit
    def run(u_pad, f_pad, pid_pad):
        HpG = u_pad.shape[0]
        nb = (HpG - 2 * rows) // rows
        out, rsq = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM)
                if bim else
                pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((HpG, Wp), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, rows + 16, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(u_pad, f_pad, pid_pad)
        return out
    return run


for rows in (32, 64):
    ps = PallasStencil(n, pid=pid, interpret=False, rows=rows)
    u_pad, f_pad = ps.pad(u), ps.pad(f)
    pid_pad = ps.pid_pad
    pid_small = jnp.zeros((32, 128), jnp.int8)
    for mode, wp in (("copy", False), ("copy", True), ("s9_norolls", False),
                     ("s9", False), ("full", True)):
        try:
            run = make_variant(ps, mode, with_pid=wp)
            dt = timeit(lambda c: run(c, f_pad, pid_pad if wp else pid_small), u_pad)
            nbytes = (13 if wp else 12) * ps.Hp * ps.Wp
            print(f"rows={rows} mode={mode:10s} pid={wp}  {dt*1e6:8.1f} us  "
                  f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"rows={rows} mode={mode:10s} pid={wp}  FAILED {str(e)[:120]}", flush=True)
