"""Scratch: lagged-pipeline sweep kernel — pure BlockSpec pipeline, persistent
VMEM cache of the previous row block, output emitted one block behind."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil, _S9, _S4

n = 4096
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
phase = geometry.circle_phase(2.0, n)
pid = stencil.pattern_ids(jnp.asarray(phase))

CENTER = 2.0 / 3.0


def _views(cache, r):
    """cache: (r+2, Wp) holding rows [(i-1)r-1 .. ir]. views[(dr,dc)][j] =
    u[(i-1)r + j + dr, j2 + dc]."""
    Wp = cache.shape[1]
    rolled = {0: cache, 1: pltpu.roll(cache, Wp - 1, 1), -1: pltpu.roll(cache, 1, 1)}
    return {(dr, dc): rolled[dc][1 + dr: 1 + dr + r, :]
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)}


def make_sweep(rows, H, W, Wp, Hp, a0, da, omega, bim, alias):
    nb = Hp // rows

    def kernel(u_ref, f_ref, pid_ref, dst_ref, u_out, rsq_ref, cache):
        i = pl.program_id(0)
        # step 0 computes garbage into out block 0 (rewritten at step 1 before
        # the pipeline flushes it; same out index on consecutive steps).
        cache[rows + 1:rows + 2, :] = u_ref[0:1, :]
        tile = cache[...]  # value: pltpu.roll on a scratch ref breaks effect tracking
        v = _views(tile, rows)
        acc = None
        for (dr, dc), w in _S9.items():
            t = (a0 * w) * v[(dr, dc)]
            acc = t if acc is None else acc + t
        if bim:
            p = pid_ref[...].astype(jnp.int32)
            for e, taps in enumerate(_S4):
                bit = ((p >> e) & 1).astype(jnp.float32)
                t4 = None
                for (dr, dc), w in taps.items():
                    t = w * v[(dr, dc)]
                    t4 = t if t4 is None else t4 + t
                acc = acc + (da * bit) * t4
            nbits = (p & 1) + ((p >> 1) & 1) + ((p >> 2) & 1) + ((p >> 3) & 1)
            d = CENTER * (4.0 * a0 + da * nbits.astype(jnp.float32))
        else:
            d = jnp.asarray(4.0 * CENTER * a0, jnp.float32)
        r_ = f_ref[...] - acc
        gr = (i - 1) * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0)  # data rows of out block i
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
        interior = (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)
        r_ = jnp.where(interior, r_, 0.0)
        u_out[...] = tile[1:rows + 1, :] + (omega / d) * r_

        @pl.when(i > 0)
        def _():
            rsq_ref[i - 1, 0] = jnp.sum(r_ * r_)

        # advance cache: rows [ir-1 .. (i+1)r); at i==0 the halo row is the
        # zero row above the domain
        top = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32), tile[rows:rows + 1, :])
        cache[0:1, :] = top
        cache[1:rows + 1, :] = u_ref[...]

    # ghost-block layout: buffers are (nb+2 blocks, Wp), data at blocks
    # 1..nb.  Static index maps keep the pipeline fully multi-buffered:
    # u reads block i+1 (one ahead), f/pid/out ride at block i.
    in_specs = [
        pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
         if bim else pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]

    @jax.jit
    def sweep(u_pad, f_pad, pid_pad, dst):
        return pl.pallas_call(
            kernel, grid=(nb + 1,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Hp + 2 * rows, Wp), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((rows + 2, Wp), jnp.float32)],
            input_output_aliases=({3: 0} if alias else {}),
            cost_estimate=pl.CostEstimate(
                flops=(50 if bim else 18) * Hp * Wp,
                bytes_accessed=13 * Hp * Wp, transcendentals=0),
        )(u_pad, f_pad, pid_pad if bim else jnp.zeros((32, 128), jnp.int8), dst)
    return sweep


def run_case(rows, bim, alias, iters=200):
    H = W = n + 1
    Wp = ((W + 127) // 128) * 128
    Hp = ((H + rows - 1) // rows) * rows
    a0, a1 = 1.0, 20.0
    da = a1 - a0 if bim else 0.0
    sweep = make_sweep(rows, H, W, Wp, Hp, a0, da, 2.0 / 3.0, bim, alias)
    pad = lambda x, dt=jnp.float32: jnp.zeros((Hp + 2 * rows, Wp), dt).at[rows:rows + H, :W].set(x.astype(dt))
    u_pad, f_pad = pad(u), pad(f)
    pid_pad = pad(pid, jnp.int8) if bim else None
    dst = jnp.zeros_like(u_pad)

    @jax.jit
    def loop(a, b):
        def body(c, _):
            a, b = c
            a2, _ = sweep(a, f_pad, pid_pad, b)
            b2, _ = sweep(a2, f_pad, pid_pad, a)
            return (b2, a2), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=iters // 2)
        return a
    r = loop(u_pad, dst); jax.block_until_ready(r)
    t0 = time.time(); r = loop(u_pad, dst); jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    byt = (13 if bim else 12) * Hp * Wp
    print(f"pipe_sweep rows={rows:4d} bim={int(bim)} alias={int(alias)} "
          f"{dt*1e6:8.1f} us  {byt/dt/1e9:6.1f} GB/s eff", flush=True)
    return sweep, u_pad, f_pad, pid_pad, Hp, Wp, H


# correctness first at one config
sweep, u_pad, f_pad, pid_pad, Hp, Wp, H = run_case(32, True, True, iters=2)
got, rsq = sweep(u_pad, f_pad, pid_pad, jnp.zeros_like(u_pad))
ps = PallasStencil(n, pid=pid, interpret=False, rows=32)
ref, rsq_ref = ps.sweep_padded(ps.pad(u), ps.pad(f))
err = float(jnp.max(jnp.abs(got[32:32 + H, :H] - ps.unpad(ref))))
rerr = abs(float(jnp.sum(rsq)) - float(rsq_ref)) / float(rsq_ref)
print(f"max|diff| vs existing kernel: {err:.3e}  rsq rel err: {rerr:.3e}", flush=True)

for rows in (32, 64):
    for bim in (True, False):
        for alias in (True, False):
            try:
                run_case(rows, bim, alias)
            except Exception as e:
                print(f"rows={rows} bim={bim} alias={alias} FAILED {str(e)[:120]}", flush=True)
