"""Per-element coefficient-stream ("Q-stream") bi-material Jacobi sweep
(round 5, VERDICT r4 #5).

The production sweep streams the raw int8 element phase and materializes
Q = a0 + da*phase in-kernel; on the VPU-bound bi-material form the int8
unpack is a measurable part of the residue.  This variant streams the
PRECOMPUTED per-element coefficient Q instead:

    measured at 4097^2 (results/sweep_variants_r5.json):
      int8 phase   375 us   402 Gnnz/s   (production default)
      Q f32        440 us   (loses: +3 B/node > saved convert)
      Q bf16       339 us   478 Gnnz/s   (+1 B/node, native convert)

bf16 Q is EXACT for the reference's (1, 20) coefficient pair (both
representable in an 8-bit mantissa), so the operator is unchanged there;
for general coefficients it rounds Q to bf16 (~3 decimal digits).  The
int8 form stays the default because every FUSED V-cycle leg shares the
phase stream; this standalone sweep serves smoother-only workloads
(e.g. solvers/pallas_mg.solve_jacobi-style iteration) at +19%.

Temporal fusion of the bi-material sweep LOSES (the form is VPU-bound):
r1 fused-4 = 359 Gnnz/s vs 402 single (BENCH_r04), and the r4 deep-window
pswrr (3 applies/pass) measured ~4% slower than split legs
(docs/kernel_notes_r4.md finding 2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_feanet_tpu.ops.pallas_sweep import (
    PallasLevel, _interior_mask, _lagged_spec, _roll_m, _roll_p, _SMEM_SPEC,
    _default_bounds)


def _qsweep_kernel(u_ref, f_ref, q_ref, dst_ref, bnd_ref, u_out, cache, qc,
                   *, R, H, W, Wp, omega, s, nb):
    """Element-factored bi-material sweep with a PRECOMPUTED Q stream
    (element coefficients, f32/bf16) instead of int8 phases.  Same lagged
    pipeline/ghost-block layout as pallas_sweep._sweep_kernel."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    lo, hi = bnd_ref[0], bnd_ref[1]

    cache[R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        u_ref[0:1, :].astype(jnp.float32))
    u_win = cache[...]
    Q = jnp.concatenate([qc[...], q_ref[...].astype(jnp.float32)],
                        axis=0)  # (R+1, Wp) element rows [row0, row0+R+1)
    L = R + 2
    ul = _roll_p(u_win, s)
    t = u_win + ul
    s_e = t[0 : L - 1, :] + t[1:L, :]
    P = Q * s_e
    Pc = P + _roll_m(P, s)
    sigP = Pc[0 : L - 2, :] + Pc[1 : L - 1, :]
    Qc = Q + _roll_m(Q, s)
    C4 = Qc[0 : L - 2, :] + Qc[1 : L - 1, :]
    D = Q * u_win[0 : L - 1, :]
    E2 = Q * ul[0 : L - 1, :]
    E3 = Q * u_win[1:L, :]
    E4 = Q * ul[1:L, :]
    Dr = _roll_m(D, s)
    E3r = _roll_m(E3, s)
    sigD = (Dr[0 : L - 2, :] + E2[0 : L - 2, :]) + (E3r[1 : L - 1, :]
                                                    + E4[1 : L - 1, :])
    uc = u_win[1 : L - 1, :]
    au = (5.0 / 6.0) * (uc * C4) - (1.0 / 6.0) * (sigD + sigP)
    d = (2.0 / 3.0) * C4
    r = f_ref[...].astype(jnp.float32) - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    u_out[...] = (uc + (omega / d) * r).astype(u_out.dtype)

    cache[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                              cache[R : R + 1, :])
    cache[1 : R + 1, :] = u_ref[...].astype(jnp.float32)
    qc[0:1, :] = q_ref[R - 1 : R, :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("R", "H", "W", "Wp", "omega",
                                             "s", "interpret"))
def _run_qsweep(u_pad, f_pad, q_pad, dst, *, R, H, W, Wp, omega, s,
                interpret):
    nb = (u_pad.shape[0] - 2 * R) // R
    bnd = _default_bounds(H, W)
    kern = functools.partial(_qsweep_kernel, R=R, H=H, W=W, Wp=Wp,
                             omega=omega, s=s, nb=nb)
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 0),
                  _lagged_spec(R, Wp, 0),
                  pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC],
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
        scratch_shapes=[pltpu.VMEM((R + 2, Wp), jnp.float32),
                        pltpu.VMEM((1, Wp), jnp.float32)],
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=30 * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(12 + q_pad.dtype.itemsize)
            * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(u_pad, f_pad, q_pad, dst, bnd)
    return out




def make_q_pad(level: PallasLevel, phase, coefficients=(1.0, 20.0),
               dtype=jnp.bfloat16):
    """Element-coefficient stream buffer in the level's layout."""
    a0, a1 = (float(c) for c in coefficients)
    q_np = np.asarray(phase, np.float32) * (a1 - a0) + a0
    buf = np.zeros(level.buf_shape, np.float32)
    n = q_np.shape[0]
    buf[level.R : level.R + n, 0 : n * level.s : level.s] = q_np
    return jnp.asarray(buf, dtype)


def qsweep(level: PallasLevel, u_pad, f_pad, q_pad, dst=None):
    """One weighted-Jacobi sweep with the Q-stream operator -> u_new."""
    if dst is None:
        dst = level.zeros()
    return _run_qsweep(u_pad, f_pad, q_pad, dst, R=level.R, H=level.H,
                       W=level.W, Wp=level.Wp, omega=level.omega, s=level.s,
                       interpret=level.interpret)
