"""Fused H-relax Pallas kernel: one weighted-Jacobi sweep + the 3-layer
learned H-Net correction in a single HBM pass.

Reference math (M-FEANet-mg_test.ipynb cells 4-5; models/hnet.py):

    jac = jacobi_step(u, f)            (interior update, boundary kept)
    x0  = (jac - u) masked to interior
    x_{l+1} = conv3x3(x_l, k_l) masked to interior     (L layers)
    u  <- jac + x_L

Everything is evaluated in-register on (R + 8)-row windows of the same
lagged-pipeline ghost-block layout as ops/pallas_sweep.py: each conv layer
consumes one window row per side, so the kernel reads u rows
[(i-1)R - 4, iR + 4) to emit rows [(i-1)R, iR).  All intermediate values
pass through ``jnp.where`` SELECTS (never multiplicative masks): scratch
caches hold garbage on the priming step and out-of-domain diagonals can be
zero, so any inf/NaN must be select-killed, not multiplied by zero.

The XLA form (models/hnet.py::h_relax) costs ~6 field passes per relax;
this kernel is one (17 B/node bi-material).  Single-device only (no shard
halo strips yet — the H-MG capability is a single-chip reference protocol).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_feanet_tpu.ops.pallas_sweep import (
    PallasLevel,
    _apply_bim,
    _apply_hom,
    _default_bounds,
    _interior_mask,
    _lagged_spec,
    _roll_m,
    _roll_p,
    _SMEM_SPEC,
)


def _hrelax_kernel(u_ref, f_ref, ph_ref, k_ref, bnd_ref, dst_ref, u_out,
                   rsq_ref, ucache, fcache, phcache, *, R, H, W, Wp, a0, da,
                   omega, s, nb, bim, L):
    """Grid step i emits node rows [(i-1)R, iR).

    All inputs lag by ONE block (u/f/ph block i+1 -> rows [iR, (i+1)R)).
    Cache invariants at the start of step i:
      ucache[0 : R+4]   = u node rows [(i-1)R - 4, iR)
      fcache[0 : R+3]   = f node rows [(i-1)R - 3, iR)
      phcache[0 : R+4]  = element rows [(i-1)R - 4, iR)
    (garbage at i <= 1 for ghost rows — harmless: every use is inside a
    select whose condition excludes non-interior rows).
    ``k_ref``: (L, 3, 3) H-Net conv kernels in SMEM.
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 4  # node row of window row 0
    lo, hi = bnd_ref[0], bnd_ref[1]

    uw = jnp.concatenate([ucache[...], u_ref[0:4, :]], axis=0)  # (R+8, Wp)
    fw = jnp.concatenate([fcache[...], f_ref[0:3, :]], axis=0)  # (R+6, Wp)
    if bim:
        phw = jnp.concatenate([phcache[...], ph_ref[0:3, :]], axis=0)
        au, C4 = _apply_bim(uw, phw, R + 8, a0, da, s)
        d = (2.0 / 3.0) * C4
    else:
        au, _ = _apply_hom(uw, R + 8, a0, s)
        d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)

    # jac on node rows [row0 + 1, row0 + R + 7): select-masked (d may be 0
    # in garbage/ghost element rows -> inf * 0 = NaN under a multiply mask)
    m_jac = _interior_mask(row0 + 1, R + 6, Wp, lo, hi, W, s)
    uin = uw[1 : R + 7, :]
    jac = jnp.where(m_jac, uin + (omega / d) * (fw - au), uin)
    x = jnp.where(m_jac, jac - uin, 0.0)

    # free pre-update interior residual norm^2 over this step's out rows
    @pl.when(i > 0)
    def _():
        rm = jnp.where(m_jac, fw - au, 0.0)[3 : R + 3, :]
        rsq_ref[i - 1, 0] = jnp.sum(rm * rm)

    nrows = R + 6
    base = row0 + 1
    for l in range(L):
        xm, xp = _roll_m(x, s), _roll_p(x, s)
        t = (xm, x, xp)  # lane offsets -s, 0, +s
        y = None
        for a in range(3):  # row offset a-1
            for b in range(3):
                term = k_ref[l, a, b] * t[b][a : a + nrows - 2, :]
                y = term if y is None else y + term
        nrows -= 2
        base += 1
        x = jnp.where(_interior_mask(base, nrows, Wp, lo, hi, W, s), y, 0.0)

    # x now covers exactly rows [(i-1)R, iR); jac rows start at row0+1
    u_out[...] = jac[3 : R + 3, :] + x

    # roll caches forward
    ucache[0:4, :] = uw[R : R + 4, :]
    ucache[4 : R + 4, :] = u_ref[...]
    fcache[0:3, :] = fw[R : R + 3, :]
    fcache[3 : R + 3, :] = f_ref[...]
    if bim:
        phcache[0:4, :] = phw[R : R + 4, :]
        phcache[4 : R + 4, :] = ph_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "interpret",
    "vmem_mb"))
def _run_hrelax(u_pad, f_pad, ph_pad, params, dst, bnd, *, R, H, W, Wp,
                a0, da, omega, s, L, interpret, vmem_mb=None):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if dst is None:
        dst = jnp.zeros_like(u_pad)
    if bnd is None:
        bnd = _default_bounds(H, W)
    kern = functools.partial(_hrelax_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0,
                             da=da, omega=omega, s=s, nb=nb, bim=bim, L=L)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(pl.BlockSpec((32, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_SMEM_SPEC, _SMEM_SPEC, pl.BlockSpec(memory_space=pl.ANY)]
    args += [params.astype(jnp.float32), bnd, dst]
    out, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 4, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((R + 4, Wp), jnp.int8),
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=(35 + 18 * L) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(13 if bim else 12) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(*args)
    return out, jnp.sum(rsq)


def hrelax(level: PallasLevel, u_pad, f_pad, params, dst=None, bnd=None):
    """One fused H-relax sweep on a PallasLevel's padded buffers ->
    (u_new, rsq) with ``rsq`` the pre-update interior residual norm^2.
    ``params``: (L, 3, 3) H-Net conv kernels; donates ``dst``."""
    return _run_hrelax(u_pad, f_pad, level.ph_pad, params, dst, bnd,
                       R=level.R, H=level.H, W=level.W, Wp=level.Wp,
                       a0=level.a0, da=level.da, omega=level.omega,
                       s=level.s, L=int(params.shape[0]),
                       interpret=level.interpret, vmem_mb=level.vmem_mb)
