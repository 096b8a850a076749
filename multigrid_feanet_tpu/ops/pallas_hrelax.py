"""Fused H-relax Pallas kernel: one weighted-Jacobi sweep + the 3-layer
learned H-Net correction in a single HBM pass.

Reference math (M-FEANet-mg_test.ipynb cells 4-5; models/hnet.py):

    jac = jacobi_step(u, f)            (interior update, boundary kept)
    x0  = (jac - u) masked to interior
    x_{l+1} = conv3x3(x_l, k_l) masked to interior     (L layers)
    u  <- jac + x_L

Everything is evaluated in-register on (R + 2(L+1))-row windows of the
same lagged-pipeline ghost-block layout as ops/pallas_sweep.py: each conv
layer consumes one window row per side (D = L + 1 rows per side total),
so the kernel reads u rows [(i-1)R - D, iR + D) to emit rows
[(i-1)R, iR).  The chain depth L is a static parameter (odd L for the
prolongation-fused legs); L=1 trades receptive field for ~3x less
VPU chain compute (docs/kernel_notes_r4.md).  All intermediate values
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
    _apply_op,
    _halo_spec,
    _apply_hom,
    _c4_from_q,
    _default_bounds,
    _interior_mask,
    _lagged_spec,
    _owned_rows_mask,
    _roll_m,
    _roll_p,
    _round_up,
    _SMEM_SPEC,
)


def _hrelax_kernel(u_ref, f_ref, ph_ref, k_ref, bnd_ref, dst_ref, u_out,
                   rsq_ref, ucache, fcache, phcache, *, R, H, W, Wp, a0, da,
                   omega, s, nb, bim, L, dform=False):
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
    D = L + 1  # rows consumed per side: 1 (jacobi) + L (conv chain)
    i = pl.program_id(0)
    row0 = (i - 1) * R - D  # node row of window row 0
    lo, hi = bnd_ref[0], bnd_ref[1]

    uw = jnp.concatenate([ucache[...], u_ref[0:D, :]], axis=0)  # (R+2D, Wp)
    fw = jnp.concatenate([fcache[...], f_ref[0 : D - 1, :]], axis=0)
    if bim:
        phw = jnp.concatenate([phcache[...], ph_ref[0 : D - 1, :]], axis=0)
        au, C4 = _apply_op(uw, phw, R + 2 * D, a0, da, s, None, True, dform)
        d = (2.0 / 3.0) * C4
    else:
        au, _ = _apply_op(uw, None, R + 2 * D, a0, da, s, None, False, dform)
        d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)

    # jac on node rows [row0 + 1, row0 + R + 2D - 1): select-masked (d may
    # be 0 in garbage/ghost element rows -> inf * 0 = NaN under a multiply
    # mask)
    m_jac = _interior_mask(row0 + 1, R + 2 * D - 2, Wp, lo, hi, W, s)
    uin = uw[1 : R + 2 * D - 1, :]
    jac = jnp.where(m_jac, uin + (omega / d) * (fw - au), uin)
    x = jnp.where(m_jac, jac - uin, 0.0)

    # free pre-update interior residual norm^2 over this step's out rows
    @pl.when(i > 0)
    def _():
        rm = jnp.where(m_jac, fw - au, 0.0)[L : L + R, :]
        rsq_ref[i - 1, 0] = jnp.sum(rm * rm)

    x = _hchain(x, k_ref, L, s, row0 + 1, Wp, lo, hi, W)

    # x now covers exactly rows [(i-1)R, iR); jac rows start at row0+1
    u_out[...] = jac[L : L + R, :] + x

    # roll caches forward
    ucache[0:D, :] = uw[R : R + D, :]
    ucache[D : R + D, :] = u_ref[...]
    fcache[0 : D - 1, :] = fw[R : R + D - 1, :]
    fcache[D - 1 : R + D - 1, :] = f_ref[...]
    if bim:
        phcache[0:D, :] = phw[R : R + D, :]
        phcache[D : R + D, :] = ph_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "interpret",
    "vmem_mb", "dform"))
def _run_hrelax(u_pad, f_pad, ph_pad, params, dst, bnd, *, R, H, W, Wp,
                a0, da, omega, s, L, interpret, vmem_mb=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if dst is None:
        dst = jnp.zeros_like(u_pad)
    if bnd is None:
        bnd = _default_bounds(H, W)
    kern = functools.partial(_hrelax_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0,
                             da=da, omega=omega, s=s, nb=nb, bim=bim, L=L,
                             dform=dform)
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
            pltpu.VMEM((R + L + 1, Wp), jnp.float32),
            pltpu.VMEM((R + L, Wp), jnp.float32),
            pltpu.VMEM((R + L + 1, Wp), jnp.int8),
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


def hrelax(level: PallasLevel, u_pad, f_pad, params, dst=None, bnd=None,
           dform: bool = False):
    """One fused H-relax sweep on a PallasLevel's padded buffers ->
    (u_new, rsq) with ``rsq`` the pre-update interior residual norm^2.
    ``params``: (L, 3, 3) H-Net conv kernels; donates ``dst``."""
    return _run_hrelax(u_pad, f_pad, level.ph_pad, params, dst, bnd,
                       R=level.R, H=level.H, W=level.W, Wp=level.Wp,
                       a0=level.a0, da=level.da, omega=level.omega,
                       s=level.s, L=int(params.shape[0]),
                       interpret=level.interpret, vmem_mb=level.vmem_mb,
                       dform=dform)


# ---------------------------------------------------------------------------
# Fused H-MG V-cycle legs (round 4).  The round-3 PallasHMG cycle ran FOUR
# HBM passes at every level (hrelax, restrict_residual, psweep(omega=0),
# hrelax) — 51 B/node vs the plain V(1,1) cycle's 17 — which made the
# learned smoother a wall-clock loss at 4097^2 even before its (then-poor)
# cycle count.  These kernels mirror ops/pallas_sweep.py's fused legs for
# the H-relax smoother:
#
#   hswrr:    u1 = hrelax(u0); f_c = 4 FW(f - A u1)        (descent, 15 B/node)
#   phrelax:  u3 = hrelax(u1 + P(uc))                      (ascent,  15 B/node)
#   zhswrr:   u1 = hrelax(0) in-register; f_c = 4 FW(...)  (descent,  7 B/node)
#   zphrelax: u3 = hrelax(hrelax(0) + P(uc))               (ascent,  11 B/node)
#
# so an H-MG V(1,1) cycle costs 30 B/node at the fine level and 18 at every
# coarse level — plain-MG coarse-leg traffic, ~1.75x the plain fine level —
# and the extra conv-chain FLOPs ride the bandwidth-bound kernels for free.
# All in-register math reuses the lagged-pipeline window algebra of
# ops/pallas_sweep.py; every intermediate is select-masked (jnp.where), so
# priming-step scratch garbage and out-of-domain diagonals never reach an
# emitted row (see the invariants note in _hrelax_kernel above).
# ---------------------------------------------------------------------------


def _hchain(x, k_ref, L, s, base, Wp, lo, hi, W):
    """L-layer geo-masked 3x3 conv chain on an (K, Wp) window whose row 0 is
    node row ``base``; trims one row per side per layer.  Returns
    (K - 2L, Wp) rows [base + L, ...)."""
    nrows = x.shape[0]
    for l in range(L):
        t = (_roll_m(x, s), x, _roll_p(x, s))
        y = None
        for a in range(3):
            for b in range(3):
                term = k_ref[l, a, b] * t[b][a : a + nrows - 2, :]
                y = term if y is None else y + term
        nrows -= 2
        base += 1
        x = jnp.where(_interior_mask(base, nrows, Wp, lo, hi, W, s), y, 0.0)
    return x


def _jac_rows(uw, fw, phw, K, a0, da, omega, s, row0, Wp, lo, hi, W, bim,
              dform=False):
    """Weighted-Jacobi update on the K-2 inner rows of ``uw``.

    ``uw``: (K, Wp) u rows [row0, row0+K); ``fw``: (K-2, Wp) f rows
    [row0+1, ...); ``phw``: (K-1, Wp) element rows [row0, ...) when bim.
    Returns (jac, x0, r0) on rows [row0+1, row0+K-1): the updated iterate
    (boundary rows keep their value), the masked increment jac - u, and the
    masked pre-update residual."""
    if bim:
        au, C4 = _apply_op(uw, phw, K, a0, da, s, None, True, dform)
        d = (2.0 / 3.0) * C4
    else:
        au, _ = _apply_op(uw, None, K, a0, da, s, None, False, dform)
        d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)
    m = _interior_mask(row0 + 1, K - 2, Wp, lo, hi, W, s)
    uin = uw[1 : K - 1, :]
    jac = jnp.where(m, uin + (omega / d) * (fw - au), uin)
    x0 = jnp.where(m, jac - uin, 0.0)
    r0 = jnp.where(m, fw - au, 0.0)
    return jac, x0, r0


def _hrelax0_rows(fw, phw, k_ref, K, L, a0, da, omega, s, row0, Wp, lo, hi,
                  W, bim):
    """hrelax from u = 0 (zero-BC error equation), fully in-register:
    u1 = g0 + H(g0) with g0 = (omega/d) f at interior nodes, 0 elsewhere.
    ``fw``: (K, Wp) f rows [row0, row0+K); ``phw``: (K+1, Wp) element rows
    [row0-1, ...) when bim.  Returns (K-2L, Wp) rows [row0+L, ...)."""
    if bim:
        Q = phw.astype(jnp.float32) * da + a0
        d = (2.0 / 3.0) * _c4_from_q(Q, K + 1, s)  # node rows = fw's rows
    else:
        d = jnp.asarray((8.0 / 3.0) * a0, jnp.float32)
    g0 = jnp.where(_interior_mask(row0, K, Wp, lo, hi, W, s),
                   (omega / d) * fw, 0.0)
    x = _hchain(g0, k_ref, L, s, row0, Wp, lo, hi, W)
    return g0[L : K - L, :] + x


def _fw_rows(r1, R, Wp, s):
    """x4-scaled full weighting of (R+1, Wp) residual rows
    [(i-1)R - 1, iR - 1] -> (R/2, Wp) coarse rows [(i-1)R/2, iR/2) on the
    2s lane grid (identical algebra to _rr_kernel)."""
    A = r1[0:R, :].reshape(R // 2, 2, Wp)
    B = jnp.concatenate([A[1:, 0, :], r1[R : R + 1, :]], axis=0)
    rows_fw = A[:, 0, :] + 2.0 * A[:, 1, :] + B
    lanes_fw = 2.0 * rows_fw + _roll_m(rows_fw, s) + _roll_p(rows_fw, s)
    return lanes_fw * (4.0 / 16.0)


def _prolong_rows(cw, Wp, s, row0, lo, hi, W):
    """Bilinear prolongation of a (K, Wp) coarse window whose row 0 is
    coarse row row0/2 (``row0`` EVEN) -> (2K-2, Wp) interior-masked
    correction rows [row0, row0 + 2K - 2)."""
    K = cw.shape[0]
    mids = 0.5 * (cw[0 : K - 1, :] + cw[1:K, :])
    corr_r = jnp.stack([cw[0 : K - 1, :], mids], axis=1).reshape(
        2 * (K - 1), Wp)
    lane_mid = 0.5 * (_roll_m(corr_r, s) + _roll_p(corr_r, s))
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
    return jnp.where(
        _interior_mask(row0, 2 * (K - 1), Wp, lo, hi, W, s), corr, 0.0)


def _hswrr_kernel(u_ref, f_ref, ph_ref, k_ref, bnd_ref, uh_ref, fh_ref,
                  phh_ref, dst_ref, u1_out, fc_out, rsq_ref, ucache, fcache,
                  phcache, *, R, H, W, Wp, a0, da, omega, s, nb, own_hi, bim,
                  L, dform=False):
    """Fused H-MG descent leg.  Grid step i emits u1 = hrelax(u0) node rows
    [(i-1)R, iR), coarse rows [(i-1)R/2, iR/2) of f_c = 4 FW(f - A u1), and
    the free pre-update residual norm^2 of u0 (rows [(i-1)R - 1, iR - 1)).

    All inputs lag ONE block.  Cache invariants at the start of step i:
      ucache[0 : R+6]  = u0 rows     [(i-1)R - 6, iR)
      fcache[0 : R+5]  = f rows      [(i-1)R - 5, iR)
      phcache[0 : R+6] = element rows [(i-1)R - 6, iR)

    Shard halos (DEEP strips — L=1 only; all-zero single-device):
    ``uh_ref`` rows 8-(D+2)..7 = u rows -(D+2)..-1, rows 0..D+1 = u rows
    Hloc..Hloc+D+1; ``fh_ref`` rows 8-(D+1)..7 / 0..D = f analogues;
    ``phh_ref`` rows 8-(D+2)..7 = element rows -(D+2)..-1, rows 0..D =
    element rows Hloc..Hloc+D.
    """
    D = L + 1
    i = pl.program_id(0)
    row0 = (i - 1) * R - (D + 2)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    u_in = jnp.where(i == nb, uh_ref[0 : D + 2, :], u_ref[0 : D + 2, :])
    f_in = jnp.where(i == nb, fh_ref[0 : D + 1, :], f_ref[0 : D + 1, :])
    uw = jnp.concatenate([ucache[...], u_in], axis=0)
    fw = jnp.concatenate([fcache[...], f_in], axis=0)
    phw = (jnp.concatenate(
        [phcache[...],
         jnp.where(i == nb, phh_ref[0 : D + 1, :], ph_ref[0 : D + 1, :])],
        axis=0) if bim else None)  # (R+2D+3) element rows [row0, ...)

    # jac on R+2D+2 rows [row0+1, ...) = [(i-1)R - D - 1, iR + D + 1)
    jac, x0, r0 = _jac_rows(uw, fw, phw, R + 2 * D + 4, a0, da, omega, s,
                            row0, Wp, lo, hi, W, bim, dform)
    x = _hchain(x0, k_ref, L, s, row0 + 1, Wp, lo, hi, W)  # (R+4) rows
    u1 = jac[L : L + R + 4, :] + x  # rows [(i-1)R - 2, iR + 2)
    u1_out[...] = u1[2 : R + 2, :]

    @pl.when(i > 0)
    def _():
        # disjoint owned span rows [(i-1)R - 1, iR - 1)
        rq = jnp.where(_owned_rows_mask(row0 + D + 1, R, -1, own_hi),
                       r0[D : D + R, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # residual of u1 on R+2 rows [(i-1)R - 1, iR + 1)
    au1, _ = _apply_op(u1, phw[D : D + R + 3, :] if bim else None, R + 4,
                       a0, da, s, None, bim, dform)
    r1 = fw[D : D + R + 2, :] - au1
    r1 = jnp.where(_interior_mask(row0 + D + 1, R + 2, Wp, lo, hi, W, s),
                   r1, 0.0)
    fc = _fw_rows(r1[0 : R + 1, :], R, Wp, s)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc, 0.0)

    # roll caches forward (i == 0: north halo strips seed the caches —
    # zeros on a single device, the neighbour's rows under sharding)
    ucache[0 : D + 2, :] = jnp.where(i == 0, uh_ref[8 - (D + 2) : 8, :],
                                     uw[R : R + D + 2, :])
    ucache[D + 2 : R + D + 2, :] = u_ref[...]
    fcache[0 : D + 1, :] = jnp.where(i == 0, fh_ref[8 - (D + 1) : 8, :],
                                     fw[R : R + D + 1, :])
    fcache[D + 1 : R + D + 1, :] = f_ref[...]
    if bim:
        phcache[0 : D + 2, :] = jnp.where(i == 0, phh_ref[8 - (D + 2) : 8, :],
                                          phw[R : R + D + 2, :])
        phcache[D + 2 : R + D + 2, :] = ph_ref[...]


def _phrelax_kernel(u_ref, f_ref, ph_ref, uc_ref, k_ref, bnd_ref, uh_ref,
                    fh_ref, phh_ref, uch_ref, dst_ref, u_out, ucache, fcache,
                    phcache, ucc, *, R, H, W, Wp, a0, da, omega, s, nb, bim,
                    L, dform=False):
    """Fused H-MG ascent leg.  Grid step i emits node rows [(i-1)R, iR) of
    u3 = hrelax(u1 + P(uc)).

    u1/f/ph lag ONE block; uc as in the psweep path.  Cache invariants at
    the start of step i:
      ucache[0 : R+4]   = u1 rows     [(i-1)R - 4, iR)
      fcache[0 : R+3]   = f rows      [(i-1)R - 3, iR)
      phcache[0 : R+4]  = element rows [(i-1)R - 4, iR)
      ucc[0 : R/2+2]    = coarse rows [(i-1)R/2 - 2, iR/2)
    """
    D = L + 1  # EVEN (L odd): prolongation window alignment needs
    i = pl.program_id(0)
    row0 = (i - 1) * R - D  # an even window start
    lo, hi = bnd_ref[0], bnd_ref[1]

    uw = jnp.concatenate(
        [ucache[...], jnp.where(i == nb, uh_ref[0:D, :], u_ref[0:D, :])],
        axis=0)  # (R+2D)
    fw = jnp.concatenate(
        [fcache[...],
         jnp.where(i == nb, fh_ref[0 : D - 1, :], f_ref[0 : D - 1, :])],
        axis=0)
    phw = (jnp.concatenate(
        [phcache[...],
         jnp.where(i == nb, phh_ref[0 : D - 1, :], ph_ref[0 : D - 1, :])],
        axis=0) if bim else None)  # (R+2D-1)
    cw = jnp.concatenate(
        [ucc[...],
         jnp.where(i == nb, uch_ref[0 : D // 2 + 1, :],
                   uc_ref[0 : D // 2 + 1, :])],
        axis=0)  # (R/2 + D + 1)

    corr = _prolong_rows(cw, Wp, s, row0, lo, hi, W)  # (R+2D) rows [row0,)
    u2 = uw + corr
    jac, x0, _ = _jac_rows(u2, fw, phw, R + 2 * D, a0, da, omega, s, row0,
                           Wp, lo, hi, W, bim, dform)
    x = _hchain(x0, k_ref, L, s, row0 + 1, Wp, lo, hi, W)  # (R) rows
    u_out[...] = jac[L : L + R, :] + x  # rows [(i-1)R, iR)

    # roll caches forward (i == 0: halo strips seed the caches)
    ucache[0:D, :] = jnp.where(i == 0, uh_ref[8 - D : 8, :],
                               uw[R : R + D, :])
    ucache[D : R + D, :] = u_ref[...]
    fcache[0 : D - 1, :] = jnp.where(i == 0, fh_ref[8 - (D - 1) : 8, :],
                                     fw[R : R + D - 1, :])
    fcache[D - 1 : R + D - 1, :] = f_ref[...]
    if bim:
        phcache[0:D, :] = jnp.where(i == 0, phh_ref[8 - D : 8, :],
                                    phw[R : R + D, :])
        phcache[D : R + D, :] = ph_ref[...]
    ucc[0 : D // 2, :] = jnp.where(i == 0, uch_ref[8 - D // 2 : 8, :],
                                   cw[R // 2 : R // 2 + D // 2, :])
    ucc[D // 2 : R // 2 + D // 2, :] = uc_ref[...]


def _zhswrr_kernel(f_ref, ph_ref, k_ref, bnd_ref, fc_out, fcache, phcache,
                   *, R, H, W, Wp, a0, da, omega, s, nb, bim, L,
                   dform=False):
    """Zero-initial-guess fused H-MG descent leg: with u1 = hrelax(0)
    computed entirely in-register (g0 = (omega/d) f is pointwise), emit
    coarse rows [(i-1)R/2, iR/2) of f_c = 4 FW(f - A u1).  u1 never touches
    HBM.  Cache invariants at the start of step i:
      fcache[0 : R+5]  = f rows       [(i-1)R - 5, iR)
      phcache[0 : R+6] = element rows [(i-1)R - 6, iR)
    """
    i = pl.program_id(0)
    row0f = (i - 1) * R - (L + 2)  # f-window row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    fw = jnp.concatenate([fcache[...], f_ref[0 : L + 2, :]], axis=0)
    phw = (jnp.concatenate([phcache[...], ph_ref[0 : L + 2, :]], axis=0)
           if bim else None)  # (R+2L+5) element rows [row0f - 1, ...)

    u1 = _hrelax0_rows(fw, phw, k_ref, R + 2 * L + 4, L, a0, da, omega, s,
                       row0f, Wp, lo, hi, W, bim)  # (R+4) rows
    # element rows [(i-1)R - 2, iR + 1) when bim
    au1, _ = _apply_op(u1, phw[L + 1 : L + R + 4, :] if bim else None,
                       R + 4, a0, da, s, None, bim, dform)
    r1 = fw[L + 1 : L + R + 3, :] - au1  # rows [(i-1)R - 1, iR + 1)
    r1 = jnp.where(_interior_mask(row0f + L + 1, R + 2, Wp, lo, hi, W, s),
                   r1, 0.0)
    fc = _fw_rows(r1[0 : R + 1, :], R, Wp, s)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc, 0.0)

    fcache[0 : L + 2, :] = fw[R : R + L + 2, :]
    fcache[L + 2 : R + L + 2, :] = f_ref[...]
    if bim:
        phcache[0 : L + 3, :] = phw[R : R + L + 3, :]
        phcache[L + 3 : R + L + 3, :] = ph_ref[...]


def _zphrelax_kernel(f_ref, ph_ref, uc_ref, k_ref, bnd_ref, dst_ref, u_out,
                     fcache, phcache, ucc, *, R, H, W, Wp, a0, da, omega, s,
                     nb, bim, L, dform=False):
    """Zero-initial-guess fused H-MG ascent leg: emit node rows
    [(i-1)R, iR) of u3 = hrelax(hrelax(0) + P(uc)) — the level's
    pre-smoothed iterate is recomputed in-register, never stored.
    Cache invariants at the start of step i:
      fcache[0 : R+7]  = f rows       [(i-1)R - 7, iR)
      phcache[0 : R+8] = element rows [(i-1)R - 8, iR)
      ucc[0 : R/2+2]   = coarse rows  [(i-1)R/2 - 2, iR/2)
    """
    D = L + 1  # EVEN (L odd)
    i = pl.program_id(0)
    row0f = (i - 1) * R - (2 * L + 1)
    row0 = (i - 1) * R - D  # u2-window row 0 (EVEN)
    lo, hi = bnd_ref[0], bnd_ref[1]

    fw = jnp.concatenate([fcache[...], f_ref[0 : 2 * L + 1, :]], axis=0)
    phw = (jnp.concatenate([phcache[...], ph_ref[0 : 2 * L + 1, :]], axis=0)
           if bim else None)  # (R+4L+3) element rows [row0f - 1, ...)
    cw = jnp.concatenate([ucc[...], uc_ref[0 : D // 2 + 1, :]],
                         axis=0)  # (R/2 + D + 1)

    u1 = _hrelax0_rows(fw, phw, k_ref, R + 4 * L + 2, L, a0, da, omega, s,
                       row0f, Wp, lo, hi, W, bim)  # (R+2D) rows [row0, ...)
    corr = _prolong_rows(cw, Wp, s, row0, lo, hi, W)  # (R+2D)
    u2 = u1 + corr
    jac, x0, _ = _jac_rows(u2, fw[L + 1 : L + R + 2 * D - 1, :],
                           phw[L + 1 : L + R + 2 * D, :] if bim else None,
                           R + 2 * D, a0, da, omega, s, row0, Wp, lo, hi, W,
                           bim, dform)
    x = _hchain(x0, k_ref, L, s, row0 + 1, Wp, lo, hi, W)  # (R) rows
    u_out[...] = jac[L : L + R, :] + x

    fcache[0 : 2 * L + 1, :] = fw[R : R + 2 * L + 1, :]
    fcache[2 * L + 1 : R + 2 * L + 1, :] = f_ref[...]
    if bim:
        phcache[0 : 2 * L + 2, :] = phw[R : R + 2 * L + 2, :]
        phcache[2 * L + 2 : R + 2 * L + 2, :] = ph_ref[...]
    ucc[0 : D // 2, :] = cw[R // 2 : R // 2 + D // 2, :]
    ucc[D // 2 : R // 2 + D // 2, :] = uc_ref[...]


_DUMMY_PH_SPEC = pl.BlockSpec((32, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "Rc", "out_rows",
    "own_rows", "interpret", "vmem_mb", "dform"))
def _run_hswrr(u_pad, f_pad, ph_pad, params, dst, bnd, uh=None, fh=None,
               phh=None, *, R, H, W, Wp, a0, da, omega, s, L, Rc, interpret,
               vmem_mb=None, out_rows=None, own_rows=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _hswrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega, s=s,
        nb=nb, own_hi=(own_rows if own_rows is not None else nb * R) - 2,
        bim=bim, L=L, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_PH_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_SMEM_SPEC, _SMEM_SPEC, _halo_spec(Wp), _halo_spec(Wp),
                 _halo_spec(Wp), pl.BlockSpec(memory_space=pl.ANY)]
    args += [params.astype(jnp.float32), bnd, uh, fh, phh, dst]
    u1, fc, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _lagged_spec(R // 2, Wp, idx_off),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
            jax.ShapeDtypeStruct((out_rows, Wp), u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + L + 3, Wp), jnp.float32),
            pltpu.VMEM((R + L + 2, Wp), jnp.float32),
            pltpu.VMEM((R + L + 3, Wp), jnp.int8),
        ],
        input_output_aliases={8: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: u + f + u1 out (12) + int8 phase (1) + coarse out (2)
        cost_estimate=pl.CostEstimate(
            flops=(76 + 18 * L if bim else 30 + 18 * L)
            * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(15 if bim else 14) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(*args)
    # Ghost-block invariant as _run_rr: fc blocks outside [idx_off,
    # nb + idx_off] are never written; consumers must jnp.where-mask.
    return u1, fc, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "R_up", "interpret",
    "vmem_mb", "dform"))
def _run_phrelax(u_pad, f_pad, ph_pad, uc_pad, params, dst, bnd, uh=None,
                 fh=None, phh=None, uch=None, *, R, H, W, Wp, a0, da, omega,
                 s, L, R_up, interpret, vmem_mb=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if bnd is None:
        bnd = _default_bounds(H, W)
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    uch = (jnp.zeros((8, Wp), jnp.float32) if uch is None
           else uch.astype(jnp.float32))
    assert (2 * R_up) % R == 0
    assert L % 2 == 1, "prolongation window alignment needs odd chain depth"
    kern = functools.partial(
        _phrelax_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, bim=bim, L=L, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_PH_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_lagged_spec(R // 2, Wp, 2 * R_up // R), _SMEM_SPEC,
                 _SMEM_SPEC, _halo_spec(Wp), _halo_spec(Wp), _halo_spec(Wp),
                 _halo_spec(Wp), pl.BlockSpec(memory_space=pl.ANY)]
    args += [uc_pad, params.astype(jnp.float32), bnd, uh, fh, phh, uch, dst]
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + L + 1, Wp), jnp.float32),
            pltpu.VMEM((R + L, Wp), jnp.float32),
            pltpu.VMEM((R + L + 1, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + (L + 1) // 2, Wp), jnp.float32),
        ],
        input_output_aliases={10: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: u1 + f + out (12) + phase (1) + uc at 1/2 rows (2)
        cost_estimate=pl.CostEstimate(
            flops=(60 + 18 * L if bim else 25 + 18 * L)
            * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(15 if bim else 14) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "Rc", "out_rows",
    "interpret", "vmem_mb", "dform"))
def _run_zhswrr(f_pad, ph_pad, params, bnd, *, R, H, W, Wp, a0, da, omega,
                s, L, Rc, interpret, vmem_mb=None, out_rows=None,
                dform=False):
    nb = (f_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _zhswrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega, s=s,
        nb=nb, bim=bim, L=L, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1)]
    args = [f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_PH_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_SMEM_SPEC, _SMEM_SPEC]
    args += [params.astype(jnp.float32), bnd]
    fc = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=_lagged_spec(R // 2, Wp, idx_off),
        out_shape=jax.ShapeDtypeStruct((out_rows, Wp), f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + L + 2, Wp), jnp.float32),
            pltpu.VMEM((R + L + 3, Wp), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: f in (4) + int8 phase (1) + coarse out (2)
        cost_estimate=pl.CostEstimate(
            flops=(45 + 18 * L if bim else 20 + 18 * L)
            * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(7 if bim else 6) * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(*args)
    return fc


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "L", "R_up", "interpret",
    "vmem_mb", "dform"))
def _run_zphrelax(f_pad, ph_pad, uc_pad, params, dst, bnd, *, R, H, W, Wp,
                  a0, da, omega, s, L, R_up, interpret, vmem_mb=None,
                  dform=False):
    nb = (f_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    assert L % 2 == 1, "prolongation window alignment needs odd chain depth"
    kern = functools.partial(
        _zphrelax_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, bim=bim, L=L, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1)]
    args = [f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_PH_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_lagged_spec(R // 2, Wp, 2 * R_up // R), _SMEM_SPEC,
                 _SMEM_SPEC, pl.BlockSpec(memory_space=pl.ANY)]
    args += [uc_pad, params.astype(jnp.float32), bnd, dst]
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f_pad.shape, f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * L + 1, Wp), jnp.float32),
            pltpu.VMEM((R + 2 * L + 2, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + (L + 1) // 2, Wp), jnp.float32),
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: f in (4) + phase (1) + uc at 1/2 rows (2) + out (4)
        cost_estimate=pl.CostEstimate(
            flops=(70 + 36 * L if bim else 30 + 36 * L)
            * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(11 if bim else 10) * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(*args)
    return out


# ---- PallasLevel-facing wrappers ----


def hswrr(level: PallasLevel, u_pad, f_pad, params, dst=None,
          out_rows: Optional[int] = None, bnd=None, uh=None, fh=None,
          phh=None, own_rows: Optional[int] = None, ph_pad=None,
          dform: bool = False):
    """Fused H-MG descent leg -> (u1, f_c, rsq): u1 = hrelax(u0),
    f_c = 4 FW(f - A u1) in the coarse level's layout, rsq = pre-update
    interior residual norm^2 of u0.  Equivalent to ``u1, rsq = hrelax(u0, f);
    f_c, _ = level.restrict_residual(u1, f)``.  Donates ``dst``.
    Same ghost-block caveat on ``f_c`` as restrict_residual."""
    if dst is None:
        dst = level.zeros()
    return _run_hswrr(u_pad, f_pad,
                      level.ph_pad if ph_pad is None else ph_pad,
                      params, dst, bnd, uh, fh, phh,
                      R=level.R, H=level.H, W=level.W, Wp=level.Wp,
                      a0=level.a0, da=level.da, omega=level.omega, s=level.s,
                      L=int(params.shape[0]), Rc=level.Rc,
                      interpret=level.interpret, vmem_mb=level.vmem_mb,
                      out_rows=out_rows, own_rows=own_rows, dform=dform)


def phrelax(level: PallasLevel, u_pad, f_pad, uc_pad, params,
            R_up: Optional[int] = None, dst=None, bnd=None, uh=None,
            fh=None, phh=None, uch=None, ph_pad=None,
            dform: bool = False):
    """Fused H-MG ascent leg -> u3 = hrelax(u1 + P(uc)).  Equivalent to
    ``u2, _ = level.psweep(u1, f, uc, omega=0.0); u3, _ = hrelax(u2, f)``.
    Donates ``dst``."""
    if dst is None:
        dst = level.zeros()
    return _run_phrelax(u_pad, f_pad,
                        level.ph_pad if ph_pad is None else ph_pad,
                        uc_pad, params, dst, bnd, uh, fh, phh, uch,
                        R=level.R, H=level.H, W=level.W, Wp=level.Wp,
                        a0=level.a0, da=level.da, omega=level.omega,
                        s=level.s, L=int(params.shape[0]),
                        R_up=int(R_up if R_up is not None else level.Rc),
                        interpret=level.interpret, vmem_mb=level.vmem_mb,
                        dform=dform)


def zhswrr(level: PallasLevel, f_pad, params,
           out_rows: Optional[int] = None, dform: bool = False):
    """ZERO-initial-guess fused H-MG descent leg -> f_c: with
    u1 = hrelax(0) computed in-register, emit f_c = 4 FW(f - A u1).
    u1 never touches HBM (7 B/node bi-material)."""
    return _run_zhswrr(f_pad, level.ph_pad, params, None, R=level.R,
                       H=level.H, W=level.W, Wp=level.Wp, a0=level.a0,
                       da=level.da, omega=level.omega, s=level.s,
                       L=int(params.shape[0]), Rc=level.Rc,
                       interpret=level.interpret, vmem_mb=level.vmem_mb,
                       out_rows=out_rows, dform=dform)


def zphrelax(level: PallasLevel, f_pad, uc_pad, params,
             R_up: Optional[int] = None, dst=None, dform: bool = False):
    """ZERO-initial-guess fused H-MG ascent leg -> u3 =
    hrelax(hrelax(0) + P(uc)); the level's pre-smoothed iterate is
    recomputed in-register, never stored.  Donates ``dst``."""
    if dst is None:
        dst = level.zeros()
    return _run_zphrelax(f_pad, level.ph_pad, uc_pad, params, dst, None,
                         R=level.R, H=level.H, W=level.W, Wp=level.Wp,
                         a0=level.a0, da=level.da, omega=level.omega,
                         s=level.s, L=int(params.shape[0]),
                         R_up=int(R_up if R_up is not None else level.Rc),
                         interpret=level.interpret, vmem_mb=level.vmem_mb,
                         dform=dform)
