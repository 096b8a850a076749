"""Scratch: lagged-pipeline sweep with ELEMENT-FACTORED stencil math.

A u(i,j) = sum_{4 surrounding elements e} Q_e * [ (5/6) u_ij - (1/6) u_diag_e
           - (1/6) s_e ],  s_e = sum of e's 4 corner nodes, Q_e = a0 + da*phase_e.

Per-tile vector ops ~ 35 vs ~82 for the 25-tap bitplane form.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil

n = 4096
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
phase = jnp.asarray(geometry.circle_phase(2.0, n))  # (n, n) element phases
pid = stencil.pattern_ids(phase)


def make_sweep(rows, H, W, Wp, a0, da, omega, bim, mode="sweep"):
    """Buffers: ghost-block (nb+2 blocks, Wp); u data blocks 1..nb.
    phase: (n, n) element map padded the same way (element (p,q) at buffer
    row p+rows).  Kernel consumes phase rows [(i-1)r-1 .. ir) per step —
    i.e. a lagged spec PLUS one extra cached row, same trick as u."""
    Hp = ((H + rows - 1) // rows) * rows
    nb = Hp // rows

    def kernel(u_ref, f_ref, ph_ref, dst_ref, u_out, rsq_ref, cache, phc):
        i = pl.program_id(0)
        # cache invariant (start of step i): cache[0:r+1] = u rows [(i-1)r-1, ir)
        #                                    phc[0:1]    = phase row (i-1)r-1
        cache[rows + 1:rows + 2, :] = u_ref[0:1, :]
        tile = cache[...]                       # (r+2, Wp): u rows [(i-1)r-1 .. ir]
        if bim:
            ph_blk = ph_ref[...]                # phase rows [(i-1)r .. ir)
            # ph: (r+1, Wp) = phase rows [(i-1)r-1 .. ir)
            ph = jnp.concatenate([phc[0:1, :], ph_blk[0:rows, :]], axis=0).astype(jnp.float32)
            Q = a0 + da * ph

        ul = pltpu.roll(tile, Wp - 1, 1)        # ul[.., q] = u[.., q+1]
        t = tile + ul                           # t(p,q) = u(p,q) + u(p,q+1)
        # s_e for element (p,q): t(p,q) + t(p+1,q) — via row slices
        if bim:
            s = t[0:rows + 1, :] + t[1:rows + 2, :]   # s(p,q), p in [(i-1)r-1, ir)
            P = Q * s
            Pc = P + pltpu.roll(P, 1, 1)        # Pc(p,q) = P(p,q) + P(p,q-1)
            sigP = Pc[0:rows, :] + Pc[1:rows + 1, :]  # at node rows [(i-1)r .. ir)
            Qc = Q + pltpu.roll(Q, 1, 1)
            C4 = Qc[0:rows, :] + Qc[1:rows + 1, :]
            # diag terms: D=Q*u, E2=Q*u_right, E3=Q*u_down, E4=Q*u_downright
            D = Q * tile[0:rows + 1, :]
            E2 = Q * ul[0:rows + 1, :]
            E3 = Q * tile[1:rows + 2, :]
            E4 = Q * ul[1:rows + 2, :]
            Dr = pltpu.roll(D, 1, 1)            # Dr(p,q) = D(p,q-1)
            E3r = pltpu.roll(E3, 1, 1)
            sigD = (Dr[0:rows, :] + E2[0:rows, :]) + (E3r[1:rows + 1, :] + E4[1:rows + 1, :])
            uc = tile[1:rows + 1, :]
            au = (5.0 / 6.0) * (uc * C4) - (1.0 / 6.0) * (sigD + sigP)
            d = (2.0 / 3.0) * C4
        else:
            # homogeneous: A u = a0 * (3 u - (1/3) sum_3x3 u)
            ur = pltpu.roll(tile, 1, 1)
            t3 = t + ur                          # u + left + right per row
            s9 = t3[0:rows, :] + t3[1:rows + 1, :] + t3[2:rows + 2, :]
            uc = tile[1:rows + 1, :]
            au = (3.0 * a0) * uc - (a0 / 3.0) * s9
            d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)
        r_ = f_ref[...] - au
        gr = (i - 1) * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
        interior = (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)
        r_ = jnp.where(interior, r_, 0.0)
        if mode == "sweep":
            u_out[...] = uc + (omega / d) * r_
        else:
            u_out[...] = r_

        @pl.when(i > 0)
        def _():
            rsq_ref[i - 1, 0] = jnp.sum(r_ * r_)

        top = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32), tile[rows:rows + 1, :])
        cache[0:1, :] = top
        cache[1:rows + 1, :] = u_ref[...]
        if bim:
            phc[0:1, :] = ph_blk[rows - 1:rows, :]

    scr = [pltpu.VMEM((rows + 2, Wp), jnp.float32), pltpu.VMEM((1, Wp), jnp.int8)]
    in_specs = [
        pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
         if bim else pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]

    @jax.jit
    def sweep(u_pad, f_pad, ph_pad, dst):
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
            scratch_shapes=scr,
            input_output_aliases={3: 0},
            cost_estimate=pl.CostEstimate(
                flops=(35 if bim else 12) * Hp * Wp,
                bytes_accessed=13 * Hp * Wp, transcendentals=0),
        )(u_pad, f_pad, ph_pad if bim else jnp.zeros((32, 128), jnp.int8), dst)
    return sweep


# wait — the phase spec is lagged (block i) but the kernel needs phase rows
# [(i-1)r-1 .. ir), i.e. block (i-1) of DATA rows plus one earlier row.  With
# the ghost-block layout, phase data row p at buffer row p+rows; block i of the
# buffer = rows [(i-1)r .. ir).  The extra row (i-1)r-1 comes from the phc
# 1-row cache carried from the previous step (phc = last row of block i-1).


def run_case(rows, bim, iters=200):
    H = W = n + 1
    Wp = ((W + 127) // 128) * 128
    Hp = ((H + rows - 1) // rows) * rows
    a0, a1 = 1.0, 20.0
    da = a1 - a0 if bim else 0.0
    sweep = make_sweep(rows, H, W, Wp, a0, da, 2.0 / 3.0, bim)
    pad = lambda x, dt=jnp.float32: (jnp.zeros((Hp + 2 * rows, Wp), dt)
                                     .at[rows:rows + x.shape[0], :x.shape[1]].set(x.astype(dt)))
    u_pad, f_pad = pad(u), pad(f)
    ph_pad = pad(phase, jnp.int8) if bim else None
    dst = jnp.zeros_like(u_pad)

    @jax.jit
    def loop(a, b):
        def body(c, _):
            a, b = c
            a2, _ = sweep(a, f_pad, ph_pad, b)
            b2, _ = sweep(a2, f_pad, ph_pad, a)
            return (b2, a2), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=iters // 2)
        return a
    r = loop(u_pad, dst); jax.block_until_ready(r)
    t0 = time.time(); r = loop(u_pad, dst); jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    byt = (13 if bim else 12) * Hp * Wp
    print(f"fact_sweep rows={rows:4d} bim={int(bim)} {dt*1e6:8.1f} us  "
          f"{byt/dt/1e9:6.1f} GB/s eff", flush=True)
    return sweep, u_pad, f_pad, ph_pad, Hp, Wp, H


# correctness
for bim in (True, False):
    sweep, u_pad, f_pad, ph_pad, Hp, Wp, H = run_case(32, bim, iters=2)
    got, rsq = sweep(u_pad, f_pad, ph_pad, jnp.zeros_like(u_pad))
    ps = PallasStencil(n, pid=pid if bim else None, interpret=False, rows=32)
    ref, rsq_ref = ps.sweep_padded(ps.pad(u), ps.pad(f))
    err = float(jnp.max(jnp.abs(got[32:32 + H, :H] - ps.unpad(ref))))
    sc = float(jnp.max(jnp.abs(ps.unpad(ref))))
    rerr = abs(float(jnp.sum(rsq)) - float(rsq_ref)) / float(rsq_ref)
    print(f"bim={bim}: max|diff|={err:.3e} (scale {sc:.2f})  rsq rel={rerr:.3e}", flush=True)

for rows in (32, 64, 128):
    for bim in (True, False):
        try:
            run_case(rows, bim)
        except Exception as e:
            print(f"rows={rows} bim={bim} FAILED {str(e)[:120]}", flush=True)
