"""Pallas TPU kernel for the vector (2-DOF/node) elasticity operator:
fused block-Jacobi sweep in one HBM pass.

The reference's elasticity capability lives in its MATLAB oracles
(Archive/FEM/matlab_elasticity/Plane_Stress_modify.m, solve_plane_strain.m);
ops/elasticity.py carries the FEA-Net-style block-stencil form and the XLA
bitplane apply.  This module is the fast path: the element-factored
5-constant form (ops/elasticity.py::elastic_factor_constants, validated to
f64 roundoff against the bitplane/dense forms) evaluated inside the same
lagged-pipeline ghost-block machinery as the scalar kernels
(ops/pallas_sweep.py) — displacement components ride as two separate
buffers, the phase bitmap as one int8 stream, and the 2x2 block-Jacobi
diagonal is inverted in closed form in-register.

Per node, A u needs only 4 element coefficients Q_e = a0 + da*phase_e and
their 8 pair/diff sums; both output components share them.  One sweep reads
ux, uy, fx, fy (+ph) and writes ux, uy: 21 B/node bi-material vs the XLA
bitplane form's ~5 field passes over 2-component fields.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_feanet_tpu.ops.elasticity import elastic_factor_constants
from multigrid_feanet_tpu.ops.pallas_sweep import (
    _default_bounds,
    _halo_spec,
    _interior_mask,
    _lagged_spec,
    _owned_rows_mask,
    _roll_m,
    _roll_p,
    _round_up,
    _SMEM_SPEC,
)


def _q_corners_win(ph_win, L, a0, da, s):
    """Per-node element coefficients over node rows [1, L-1) of an (L, Wp)
    window; ``ph_win``: (L-1, Wp) element phases, row k = elements between
    node rows k and k+1, stored at the lane of the west-south corner node.
    Returns (Q_ne, Q_nw, Q_se, Q_sw), each (L-2, Wp).  Ghost/out-of-domain
    elements are phase 0 => Q = a0, matching the bitplane semantics."""
    Q = ph_win.astype(jnp.float32) * da + a0  # (L-1, Wp)
    Qm = _roll_m(Q, s)  # element west of lane q
    return Q[1 : L - 1, :], Qm[1 : L - 1, :], Q[0 : L - 2, :], Qm[0 : L - 2, :]


def _apply_el(ux, uy, qc, L, s, consts):
    """Element-factored elastic A u on node rows [1, L-1) of (L, Wp) ux/uy
    windows.  ``qc`` = (Q_ne, Q_nw, Q_se, Q_sw) from ``_q_corners_win``.
    Returns (Ax, Ay, Dxx, Dxy): operator output and the 2x2 block-diagonal
    entries (Dyy = Dxx, Dyx = Dxy).  Math: ops/elasticity.py::
    apply_elastic_factored (validated vs bitplane + dense FEM)."""
    al, be, ga, ep, de, ze = consts
    Qne, Qnw, Qse, Qsw = qc
    C4 = (Qne + Qnw) + (Qse + Qsw)
    C4s = (Qne + Qsw) - (Qnw + Qse)
    Qe, Qw = Qne + Qse, Qnw + Qsw
    Qn, Qs = Qne + Qnw, Qse + Qsw
    dE, dW = Qne - Qse, Qsw - Qnw
    dN, dS = Qne - Qnw, Qsw - Qse

    outs = []
    for uc, vo, sg, g_ew, g_ns in ((ux, uy, 1.0, ga, de),
                                   (uy, ux, -1.0, de, ga)):
        ucE, ucW = _roll_p(uc, s), _roll_m(uc, s)
        voE, voW = _roll_p(vo, s), _roll_m(vo, s)
        o = (al * C4 * uc[1 : L - 1, :]
             + g_ew * (Qe * ucE[1 : L - 1, :] + Qw * ucW[1 : L - 1, :])
             + g_ns * (Qn * uc[2:L, :] + Qs * uc[0 : L - 2, :])
             + ze * (Qne * ucE[2:L, :] + Qnw * ucW[2:L, :]
                     + Qse * ucE[0 : L - 2, :] + Qsw * ucW[0 : L - 2, :])
             + be * C4s * vo[1 : L - 1, :]
             - sg * ep * (dE * voE[1 : L - 1, :] + dW * voW[1 : L - 1, :])
             + sg * ep * (dN * vo[2:L, :] + dS * vo[0 : L - 2, :])
             - be * (Qne * voE[2:L, :] - Qnw * voW[2:L, :]
                     - Qse * voE[0 : L - 2, :] + Qsw * voW[0 : L - 2, :]))
        outs.append(o)
    return outs[0], outs[1], al * C4, be * C4s


def _el_sweep_kernel(ux_ref, uy_ref, fx_ref, fy_ref, ph_ref, dx_ref, dy_ref,
                     uhx_ref, uhy_ref, bnd_ref, ux_out, uy_out, rsq_ref,
                     cx, cy, phc, *, R, H, W, Wp, a0, da, omega, s, nb,
                     own_hi, consts, mode):
    """Grid step i emits node rows [(i-1)R, iR) of both components.

    Same lagged-pipeline layout as ops/pallas_sweep.py::_sweep_kernel:
    ux/uy blocks lag by one (block i+1 -> rows [iR, (i+1)R)); caches carry
    rows [(i-1)R - 1, iR); ``uhx/uhy`` are (8, Wp) shard-halo strips (row 7
    = node row -1, row 0 = node row nb*R; all-zero single-device);
    ``bnd_ref`` (SMEM int32[4]) = updatable [lo, hi] rows.  ``rsq``
    accumulates the pre-update interior residual norm^2 of BOTH components
    (free convergence test)."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    lo, hi = bnd_ref[0], bnd_ref[1]

    cx[R + 1 : R + 2, :] = jnp.where(i == nb, uhx_ref[0:1, :], ux_ref[0:1, :])
    cy[R + 1 : R + 2, :] = jnp.where(i == nb, uhy_ref[0:1, :], uy_ref[0:1, :])
    uxw = cx[...]  # (R+2, Wp) node rows [row0, row0 + R + 2)
    uyw = cy[...]

    ph_win = jnp.concatenate([phc[...], ph_ref[...]], axis=0)  # (R+1, Wp)
    qc = _q_corners_win(ph_win, R + 2, a0, da, s)
    ax, ay, dxx, dxy = _apply_el(uxw, uyw, qc, R + 2, s, consts)

    m = _interior_mask(row0 + 1, R, Wp, lo, hi, W, s)
    rx = jnp.where(m, fx_ref[...] - ax, 0.0)
    ry = jnp.where(m, fy_ref[...] - ay, 0.0)
    if mode == "sweep":
        det = dxx * dxx - dxy * dxy
        w = omega / det
        ux_out[...] = uxw[1 : R + 1, :] + w * (dxx * rx - dxy * ry)
        uy_out[...] = uyw[1 : R + 1, :] + w * (dxx * ry - dxy * rx)
    else:  # residual
        ux_out[...] = rx
        uy_out[...] = ry

    @pl.when(i > 0)
    def _():
        mo = _owned_rows_mask(row0 + 1, R, 0, own_hi)
        rqx = jnp.where(mo, rx, 0.0)
        rqy = jnp.where(mo, ry, 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rqx * rqx) + jnp.sum(rqy * rqy)

    cx[0:1, :] = jnp.where(i == 0, uhx_ref[7:8, :], cx[R : R + 1, :])
    cx[1 : R + 1, :] = ux_ref[...]
    cy[0:1, :] = jnp.where(i == 0, uhy_ref[7:8, :], cy[R : R + 1, :])
    cy[1 : R + 1, :] = uy_ref[...]
    phc[0:1, :] = ph_ref[R - 1 : R, :]


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "consts", "mode",
    "interpret", "vmem_mb", "own_rows"))
def _run_el_sweep(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, dx, dy, uhx, uhy,
                  bnd, *, R, H, W, Wp, a0, da, omega, s, consts, mode,
                  interpret, vmem_mb=None, own_rows=None):
    nb = (ux_pad.shape[0] - 2 * R) // R
    if dx is None:
        dx, dy = jnp.zeros_like(ux_pad), jnp.zeros_like(uy_pad)
    if uhx is None:
        uhx = jnp.zeros((8, Wp), ux_pad.dtype)
        uhy = jnp.zeros((8, Wp), ux_pad.dtype)
    if bnd is None:
        bnd = _default_bounds(H, W)
    kern = functools.partial(
        _el_sweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, own_hi=(own_rows if own_rows is not None else nb * R) - 1,
        consts=consts, mode=mode)
    in_specs = [
        _lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),  # ux, uy (lagged)
        _lagged_spec(R, Wp, 0), _lagged_spec(R, Wp, 0),  # fx, fy
        _lagged_spec(R, Wp, 0),                          # ph
        # donated destinations: aliased, never streamed
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        _halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC,      # halos + bounds
    ]
    out_specs = [
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    params = {}
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
    (ux_new, uy_new, rsq) = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(ux_pad.shape, ux_pad.dtype),
            jax.ShapeDtypeStruct(uy_pad.shape, uy_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((1, Wp), jnp.int8),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(**params) if params else None,
        cost_estimate=pl.CostEstimate(
            flops=90 * (ux_pad.shape[0] - 2 * R) * Wp,
            # bytes/node: ux+uy+fx+fy in, ux+uy out (24 B f32) + ph (1 B)
            bytes_accessed=25 * (ux_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, dx, dy, uhx, uhy, bnd)
    return ux_new, uy_new, jnp.sum(rsq)


class PallasElasticLevel:
    """Ghost-block stride-lane layout + fused block-Jacobi sweep for one
    elastic level.  ``phase``: (n, n) element bitmap (None = homogeneous);
    ``coefficients`` scale the element stiffness per phase.  Fields are
    (2, H, W) logically; padded as two separate (Hp + 2R, Wp) buffers."""

    def __init__(self, n: int, E: float, nu: float, stride: int = 1,
                 phase=None, coefficients=(1.0, 20.0), plane: str = "stress",
                 omega: float = 2.0 / 3.0, Wp: Optional[int] = None,
                 rows: int = 32, rows_next: Optional[int] = None,
                 interpret: Optional[bool] = None,
                 dtype=jnp.float32, vmem_mb: Optional[int] = 64):
        self.n = n
        self.H = self.W = n + 1
        self.s = int(stride)
        self.R = int(rows)
        self.Rc = int(rows_next if rows_next is not None else rows)
        assert (2 * self.Rc) % self.R == 0
        assert self.R % 32 == 0
        self.Wp = Wp or _round_up(self.W * self.s, 128)
        self.Hp = _round_up(self.H, self.R)
        self.nb = self.Hp // self.R
        self.a0 = float(coefficients[0])
        self.da = float(coefficients[1]) - float(coefficients[0])
        self.consts = tuple(float(c) for c in
                            elastic_factor_constants(E, nu, plane))
        self.omega = float(omega)
        self.dtype = dtype
        self.vmem_mb = vmem_mb
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        buf = np.zeros(self.buf_shape, np.int8)
        if phase is not None:
            ph_np = np.asarray(phase)
            buf[self.R : self.R + ph_np.shape[0],
                0 : ph_np.shape[1] * self.s : self.s] = ph_np
        self.ph_pad = jnp.asarray(buf)

    @property
    def buf_shape(self):
        return (self.Hp + 2 * self.R, self.Wp)

    def zeros(self):
        return jnp.zeros(self.buf_shape, self.dtype)

    def pad(self, u):
        """(2, H, W) displacement field -> (ux_pad, uy_pad) buffers."""
        out = []
        for c in range(2):
            b = jnp.zeros(self.buf_shape, self.dtype)
            out.append(b.at[self.R : self.R + self.H,
                            0 : self.W * self.s : self.s].set(
                                u[c].astype(self.dtype)))
        return tuple(out)

    def unpad(self, ux_pad, uy_pad):
        sl = (slice(self.R, self.R + self.H),
              slice(0, (self.W - 1) * self.s + 1, self.s))
        return jnp.stack([ux_pad[sl], uy_pad[sl]], axis=0)

    def _cfg(self):
        return dict(R=self.R, H=self.H, W=self.W, Wp=self.Wp, a0=self.a0,
                    da=self.da, omega=self.omega, s=self.s,
                    consts=self.consts, interpret=self.interpret,
                    vmem_mb=self.vmem_mb)

    def sweep(self, ux_pad, uy_pad, fx_pad, fy_pad, dst=None, halos=None,
              bnd=None, own_rows=None):
        """One damped block-Jacobi sweep; returns ((ux, uy), rsq_pre) with
        ``rsq_pre`` the pre-update interior residual norm^2 of the incoming
        iterate (both components).  ``dst``: optional (dx, dy) donated
        spares; ``halos``: optional (uhx, uhy) shard strips."""
        dx, dy = dst if dst is not None else (None, None)
        uhx, uhy = halos if halos is not None else (None, None)
        ux, uy, rsq = _run_el_sweep(
            ux_pad, uy_pad, fx_pad, fy_pad, self.ph_pad, dx, dy, uhx, uhy,
            bnd, mode="sweep", own_rows=own_rows, **self._cfg())
        return (ux, uy), rsq

    def residual(self, ux_pad, uy_pad, fx_pad, fy_pad, dst=None, halos=None,
                 bnd=None, own_rows=None):
        """Interior-masked block residual (f - A u) in padded layout."""
        dx, dy = dst if dst is not None else (None, None)
        uhx, uhy = halos if halos is not None else (None, None)
        rx, ry, rsq = _run_el_sweep(
            ux_pad, uy_pad, fx_pad, fy_pad, self.ph_pad, dx, dy, uhx, uhy,
            bnd, mode="residual", own_rows=own_rows, **self._cfg())
        return (rx, ry), rsq

    # ---- fused V-cycle legs (round 4) ----

    def sweep_restrict(self, ux_pad, uy_pad, fx_pad, fy_pad, dst=None,
                       out_rows: Optional[int] = None, own_rows=None):
        """Fused elastic descent leg -> ((ux1, uy1), (fcx, fcy), rsq):
        one block-Jacobi sweep + residual of the swept iterate + x4
        full-weighting restriction per component, one HBM pass.  ``rsq`` is
        the PRE-sweep residual norm^2 (both components); the coarse RHS
        buffers carry the scalar restrict_residual ghost-block caveat."""
        dx, dy = dst if dst is not None else (None, None)
        if dx is None:
            dx, dy = self.zeros(), self.zeros()
        return _run_el_swrr(ux_pad, uy_pad, fx_pad, fy_pad, self.ph_pad,
                            dx, dy, None, Rc=self.Rc, out_rows=out_rows,
                            own_rows=own_rows, **self._cfg())

    def psweep(self, ux_pad, uy_pad, fx_pad, fy_pad, ucx, ucy,
               R_up: Optional[int] = None, dst=None):
        """Fused elastic ascent leg -> (ux3, uy3) = BJ(u1 + P(uc)):
        bilinear prolongation-add of both coarse components fused into the
        post-smoothing block-Jacobi sweep."""
        dx, dy = dst if dst is not None else (None, None)
        if dx is None:
            dx, dy = self.zeros(), self.zeros()
        return _run_el_psweep(ux_pad, uy_pad, fx_pad, fy_pad, self.ph_pad,
                              ucx, ucy, dx, dy, None,
                              R_up=int(R_up if R_up is not None else self.Rc),
                              **self._cfg())

    def zsweep_restrict(self, fx_pad, fy_pad,
                        out_rows: Optional[int] = None):
        """ZERO-initial-guess fused descent leg -> (fcx, fcy): the
        pointwise block solve u1 = omega D^-1 f never touches HBM."""
        return _run_el_zrr(fx_pad, fy_pad, self.ph_pad, None, Rc=self.Rc,
                           out_rows=out_rows, **self._cfg())

    def zpsweep(self, fx_pad, fy_pad, ucx, ucy,
                R_up: Optional[int] = None, dst=None):
        """ZERO-initial-guess fused ascent leg -> (ux3, uy3) =
        BJ(omega D^-1 f + P(uc))."""
        dx, dy = dst if dst is not None else (None, None)
        if dx is None:
            dx, dy = self.zeros(), self.zeros()
        return _run_el_zpsweep(fx_pad, fy_pad, self.ph_pad, ucx, ucy, dx,
                               dy, None,
                               R_up=int(R_up if R_up is not None else self.Rc),
                               **self._cfg())


# ---------------------------------------------------------------------------
# Fused elastic V-cycle legs (round 4, VERDICT r3 #3).  The round-3 elastic
# cycle left every inter-level transfer in XLA (unpad -> full-weighting ->
# re-pad per component, plus a separate residual kernel); these mirror the
# scalar fused legs of ops/pallas_sweep.py for 2-DOF fields:
#
#   sweep_restrict:  u1 = BJ(u0); (fcx, fcy) = 4 FW(f - A u1)   (29 B/node)
#   psweep:          u3 = BJ(u1 + P(uc))                        (29 B/node)
#   zsweep_restrict: u1 = omega D^-1 f in-register; FW(...)     (13 B/node)
#   zpsweep:         u3 = BJ(omega D^-1 f + P(uc))              (21 B/node)
#
# (BJ = damped 2x2 block-Jacobi.)  A V(1,1) elastic cycle then costs
# 58 B/node at the fine level and 34 at coarse levels — exactly 2x the
# scalar per-node traffic, i.e. the per-DOF cost of the scalar path.
# Coarse levels keep the fine lane width at stride 2^l (stride-lane
# layout), so restriction emits in place and prolongation reads in place.
# ---------------------------------------------------------------------------

from multigrid_feanet_tpu.ops.pallas_hrelax import _fw_rows


def _block_update(uxw, uyw, rx, ry, dxx, dxy, omega, k0, k1):
    """u + omega D^-1 r on window rows [k0, k1) (D = [[dxx, dxy], [dxy,
    dxx]]).  ``rx/ry/dxx/dxy`` are aligned with rows [k0, k1) already."""
    det = dxx * dxx - dxy * dxy
    w = omega / det
    ux = uxw[k0:k1, :] + w * (dxx * rx - dxy * ry)
    uy = uyw[k0:k1, :] + w * (dxx * ry - dxy * rx)
    return ux, uy


def _el_prolong(cw, Wp, s, row0, lo, hi, W, odd_row0=True):
    """Bilinear prolongation of a coarse window for ODD ``row0`` (the
    scalar psweep alignment): window row m covers fine row row0 + m, even m
    are midpoints and odd m injections.  ``cw``: (K, Wp), row 0 = coarse
    row (row0+1)/2 - 1.  Returns (2(K-1), Wp) interior-masked rows."""
    K = cw.shape[0]
    mids = 0.5 * (cw[0 : K - 1, :] + cw[1:K, :])
    inj = cw[1:K, :]
    corr_r = jnp.stack([mids, inj], axis=1).reshape(2 * (K - 1), Wp)
    lane_mid = 0.5 * (_roll_m(corr_r, s) + _roll_p(corr_r, s))
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
    return jnp.where(
        _interior_mask(row0, 2 * (K - 1), Wp, lo, hi, W, s), corr, 0.0)


def _el_swrr_kernel(ux_ref, uy_ref, fx_ref, fy_ref, ph_ref, dx_ref, dy_ref,
                    bnd_ref, ux_out, uy_out, fcx_out, fcy_out, rsq_ref,
                    cx, cy, cfx, cfy, phc, *, R, H, W, Wp, a0, da, omega, s,
                    nb, own_hi, consts):
    """Fused elastic descent leg.  Grid step i emits u1 = BJ(u0) rows
    [(i-1)R, iR), coarse rows [(i-1)R/2, iR/2) of 4 FW(f - A u1) per
    component, and the free pre-update residual norm^2 of u0 (rows
    [(i-1)R - 1, iR - 1)).  All inputs lag ONE block.  Cache invariants at
    the start of step i:
      cx/cy[0 : R+3]   = u0 rows [(i-1)R - 3, iR)
      cfx/cfy[0 : R+2] = f rows  [(i-1)R - 2, iR)
      phc[0 : R+3]     = element rows [(i-1)R - 3, iR)
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 3
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    uxw = jnp.concatenate([cx[...], ux_ref[0:2, :]], axis=0)  # (R+5)
    uyw = jnp.concatenate([cy[...], uy_ref[0:2, :]], axis=0)
    fxw = jnp.concatenate([cfx[...], fx_ref[0:1, :]], axis=0)  # (R+3)
    fyw = jnp.concatenate([cfy[...], fy_ref[0:1, :]], axis=0)
    phw = jnp.concatenate([phc[...], ph_ref[0:2, :]], axis=0)  # (R+5)

    # BJ update on R+3 rows [(i-1)R - 2, iR + 1)
    qc = _q_corners_win(phw, R + 5, a0, da, s)
    ax, ay, dxx, dxy = _apply_el(uxw, uyw, qc, R + 5, s, consts)
    m = _interior_mask(row0 + 1, R + 3, Wp, lo, hi, W, s)
    r0x = jnp.where(m, fxw - ax, 0.0)
    r0y = jnp.where(m, fyw - ay, 0.0)
    ux1, uy1 = _block_update(uxw, uyw, r0x, r0y, dxx, dxy, omega, 1, R + 4)
    ux_out[...] = ux1[2 : R + 2, :]
    uy_out[...] = uy1[2 : R + 2, :]

    @pl.when(i > 0)
    def _():
        mo = _owned_rows_mask(row0 + 2, R, -1, own_hi)
        rqx = jnp.where(mo, r0x[1 : R + 1, :], 0.0)
        rqy = jnp.where(mo, r0y[1 : R + 1, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rqx * rqx) + jnp.sum(rqy * rqy)

    # residual of u1 on R+1 rows [(i-1)R - 1, iR) + FW per component
    qc1 = _q_corners_win(phw[1 : R + 3, :], R + 3, a0, da, s)
    ax1, ay1, _, _ = _apply_el(ux1, uy1, qc1, R + 3, s, consts)
    m1 = _interior_mask(row0 + 2, R + 1, Wp, lo, hi, W, s)
    r1x = jnp.where(m1, fxw[1 : R + 2, :] - ax1, 0.0)
    r1y = jnp.where(m1, fyw[1 : R + 2, :] - ay1, 0.0)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    mc = _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s)
    fcx_out[...] = jnp.where(mc, _fw_rows(r1x, R, Wp, s), 0.0)
    fcy_out[...] = jnp.where(mc, _fw_rows(r1y, R, Wp, s), 0.0)

    # roll caches
    cx[0:3, :] = uxw[R : R + 3, :]
    cx[3 : R + 3, :] = ux_ref[...]
    cy[0:3, :] = uyw[R : R + 3, :]
    cy[3 : R + 3, :] = uy_ref[...]
    cfx[0:2, :] = fxw[R : R + 2, :]
    cfx[2 : R + 2, :] = fx_ref[...]
    cfy[0:2, :] = fyw[R : R + 2, :]
    cfy[2 : R + 2, :] = fy_ref[...]
    phc[0:3, :] = phw[R : R + 3, :]
    phc[3 : R + 3, :] = ph_ref[...]


def _el_psweep_kernel(ux_ref, uy_ref, fx_ref, fy_ref, ph_ref, ucx_ref,
                      ucy_ref, dx_ref, dy_ref, bnd_ref, ux_out, uy_out,
                      cx, cy, phc, ccx, ccy, *, R, H, W, Wp, a0, da, omega,
                      s, nb, consts):
    """Fused elastic ascent leg.  Grid step i emits rows [(i-1)R, iR) of
    u3 = BJ(u1 + P(uc)) for both components.  u/f/ph as in the elastic
    sweep kernel (u lags one block, f/ph stream block i); uc lags as in the
    scalar psweep.  Cache invariants at the start of step i:
      cx/cy[0 : R+1] = u1 rows [(i-1)R - 1, iR)
      phc[0]         = element row (i-1)R - 1
      ccx/ccy[0 : R/2+1] = coarse rows [(i-1)R/2 - 1, iR/2)
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1  # ODD
    lo, hi = bnd_ref[0], bnd_ref[1]

    uxw = jnp.concatenate([cx[...], ux_ref[0:1, :]], axis=0)  # (R+2)
    uyw = jnp.concatenate([cy[...], uy_ref[0:1, :]], axis=0)
    phw = jnp.concatenate([phc[...], ph_ref[...]], axis=0)  # (R+1)
    cwx = jnp.concatenate([ccx[...], ucx_ref[0:1, :]], axis=0)  # (R/2+2)
    cwy = jnp.concatenate([ccy[...], ucy_ref[0:1, :]], axis=0)

    corrx = _el_prolong(cwx, Wp, s, row0, lo, hi, W)  # (R+2)
    corry = _el_prolong(cwy, Wp, s, row0, lo, hi, W)
    u2x = uxw + corrx
    u2y = uyw + corry

    qc = _q_corners_win(phw, R + 2, a0, da, s)
    ax, ay, dxx, dxy = _apply_el(u2x, u2y, qc, R + 2, s, consts)
    m = _interior_mask(row0 + 1, R, Wp, lo, hi, W, s)
    rx = jnp.where(m, fx_ref[...] - ax, 0.0)
    ry = jnp.where(m, fy_ref[...] - ay, 0.0)
    ux3, uy3 = _block_update(u2x, u2y, rx, ry, dxx, dxy, omega, 1, R + 1)
    ux_out[...] = ux3
    uy_out[...] = uy3

    cx[0:1, :] = uxw[R : R + 1, :]
    cx[1 : R + 1, :] = ux_ref[...]
    cy[0:1, :] = uyw[R : R + 1, :]
    cy[1 : R + 1, :] = uy_ref[...]
    phc[0:1, :] = ph_ref[R - 1 : R, :]
    ccx[0:1, :] = cwx[R // 2 : R // 2 + 1, :]
    ccx[1 : R // 2 + 1, :] = ucx_ref[...]
    ccy[0:1, :] = cwy[R // 2 : R // 2 + 1, :]
    ccy[1 : R // 2 + 1, :] = ucy_ref[...]


def _el_zrr_kernel(fx_ref, fy_ref, ph_ref, bnd_ref, fcx_out, fcy_out,
                   cfx, cfy, phc, *, R, H, W, Wp, a0, da, omega, s, nb,
                   consts):
    """Zero-initial-guess fused elastic descent leg: with
    (ux1, uy1) = omega D^-1 (fx, fy) at interior nodes (pointwise 2x2
    solve), emit coarse rows of 4 FW(f - A u1) per component; u1 never
    touches HBM.  Cache invariants at the start of step i:
      cfx/cfy[0 : R+2] = f rows [(i-1)R - 2, iR)
      phc[0 : R+3]     = element rows [(i-1)R - 3, iR)
    """
    i = pl.program_id(0)
    row0f = (i - 1) * R - 2
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    fxw = jnp.concatenate([cfx[...], fx_ref[0:1, :]], axis=0)  # (R+3)
    fyw = jnp.concatenate([cfy[...], fy_ref[0:1, :]], axis=0)
    phw = jnp.concatenate([phc[...], ph_ref[0:1, :]], axis=0)  # (R+4)

    # D blocks on all R+3 f rows: corner sums from element rows
    # [row0f - 1, row0f + R + 3)
    qc = _q_corners_win(phw, R + 5, a0, da, s)
    al, be = consts[0], consts[1]
    Qne, Qnw, Qse, Qsw = qc
    dxx = al * ((Qne + Qnw) + (Qse + Qsw))
    dxy = be * ((Qne + Qsw) - (Qnw + Qse))
    det = dxx * dxx - dxy * dxy
    m = _interior_mask(row0f, R + 3, Wp, lo, hi, W, s)
    w = omega / det
    ux1 = jnp.where(m, w * (dxx * fxw - dxy * fyw), 0.0)
    uy1 = jnp.where(m, w * (dxx * fyw - dxy * fxw), 0.0)

    qc1 = _q_corners_win(phw[1 : R + 3, :], R + 3, a0, da, s)
    ax1, ay1, _, _ = _apply_el(ux1, uy1, qc1, R + 3, s, consts)
    m1 = _interior_mask(row0f + 1, R + 1, Wp, lo, hi, W, s)
    r1x = jnp.where(m1, fxw[1 : R + 2, :] - ax1, 0.0)
    r1y = jnp.where(m1, fyw[1 : R + 2, :] - ay1, 0.0)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    mc = _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s)
    fcx_out[...] = jnp.where(mc, _fw_rows(r1x, R, Wp, s), 0.0)
    fcy_out[...] = jnp.where(mc, _fw_rows(r1y, R, Wp, s), 0.0)

    cfx[0:2, :] = fxw[R : R + 2, :]
    cfx[2 : R + 2, :] = fx_ref[...]
    cfy[0:2, :] = fyw[R : R + 2, :]
    cfy[2 : R + 2, :] = fy_ref[...]
    phc[0:3, :] = phw[R : R + 3, :]
    phc[3 : R + 3, :] = ph_ref[...]


def _el_zpsweep_kernel(fx_ref, fy_ref, ph_ref, ucx_ref, ucy_ref, dx_ref,
                       dy_ref, bnd_ref, ux_out, uy_out, cfx, cfy, phc, ccx,
                       ccy, *, R, H, W, Wp, a0, da, omega, s, nb, consts):
    """Zero-initial-guess fused elastic ascent leg: emit rows [(i-1)R, iR)
    of u3 = BJ(omega D^-1 f + P(uc)); the pre-smoothed iterate is
    recomputed in-register, never stored.  Cache invariants at the start of
    step i:
      cfx/cfy[0 : R+1] = f rows [(i-1)R - 1, iR)
      phc[0 : R+2]     = element rows [(i-1)R - 2, iR)
      ccx/ccy[0 : R/2+1] = coarse rows [(i-1)R/2 - 1, iR/2)
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1  # ODD
    lo, hi = bnd_ref[0], bnd_ref[1]

    fxw = jnp.concatenate([cfx[...], fx_ref[0:1, :]], axis=0)  # (R+2)
    fyw = jnp.concatenate([cfy[...], fy_ref[0:1, :]], axis=0)
    phw = jnp.concatenate([phc[...], ph_ref[0:1, :]], axis=0)  # (R+3)
    cwx = jnp.concatenate([ccx[...], ucx_ref[0:1, :]], axis=0)  # (R/2+2)
    cwy = jnp.concatenate([ccy[...], ucy_ref[0:1, :]], axis=0)

    # u1 = omega D^-1 f on R+2 rows [row0, row0 + R + 2)
    qc = _q_corners_win(phw, R + 4, a0, da, s)
    al, be = consts[0], consts[1]
    Qne, Qnw, Qse, Qsw = qc
    dxx0 = al * ((Qne + Qnw) + (Qse + Qsw))
    dxy0 = be * ((Qne + Qsw) - (Qnw + Qse))
    det0 = dxx0 * dxx0 - dxy0 * dxy0
    m0 = _interior_mask(row0, R + 2, Wp, lo, hi, W, s)
    w0 = omega / det0
    ux1 = jnp.where(m0, w0 * (dxx0 * fxw - dxy0 * fyw), 0.0)
    uy1 = jnp.where(m0, w0 * (dxx0 * fyw - dxy0 * fxw), 0.0)

    corrx = _el_prolong(cwx, Wp, s, row0, lo, hi, W)
    corry = _el_prolong(cwy, Wp, s, row0, lo, hi, W)
    u2x = ux1 + corrx
    u2y = uy1 + corry

    qc2 = _q_corners_win(phw[1 : R + 2, :], R + 2, a0, da, s)
    ax, ay, dxx, dxy = _apply_el(u2x, u2y, qc2, R + 2, s, consts)
    m = _interior_mask(row0 + 1, R, Wp, lo, hi, W, s)
    rx = jnp.where(m, fxw[1 : R + 1, :] - ax, 0.0)
    ry = jnp.where(m, fyw[1 : R + 1, :] - ay, 0.0)
    ux3, uy3 = _block_update(u2x, u2y, rx, ry, dxx, dxy, omega, 1, R + 1)
    ux_out[...] = ux3
    uy_out[...] = uy3

    cfx[0:1, :] = fxw[R : R + 1, :]
    cfx[1 : R + 1, :] = fx_ref[...]
    cfy[0:1, :] = fyw[R : R + 1, :]
    cfy[1 : R + 1, :] = fy_ref[...]
    phc[0:2, :] = phw[R : R + 2, :]
    phc[2 : R + 2, :] = ph_ref[...]
    ccx[0:1, :] = cwx[R // 2 : R // 2 + 1, :]
    ccx[1 : R // 2 + 1, :] = ucx_ref[...]
    ccy[0:1, :] = cwy[R // 2 : R // 2 + 1, :]
    ccy[1 : R // 2 + 1, :] = ucy_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "consts", "Rc",
    "out_rows", "own_rows", "interpret", "vmem_mb"))
def _run_el_swrr(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, dx, dy, bnd, *, R,
                 H, W, Wp, a0, da, omega, s, consts, Rc, interpret,
                 vmem_mb=None, out_rows=None, own_rows=None):
    nb = (ux_pad.shape[0] - 2 * R) // R
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _el_swrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, own_hi=(own_rows if own_rows is not None else nb * R) - 2,
        consts=consts)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),
                _lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),
                _lagged_spec(R, Wp, 1),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC]
    out_specs = [
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _lagged_spec(R // 2, Wp, idx_off),
        _lagged_spec(R // 2, Wp, idx_off),
        pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    ux1, uy1, fcx, fcy, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(ux_pad.shape, ux_pad.dtype),
            jax.ShapeDtypeStruct(uy_pad.shape, uy_pad.dtype),
            jax.ShapeDtypeStruct((out_rows, Wp), ux_pad.dtype),
            jax.ShapeDtypeStruct((out_rows, Wp), ux_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.int8),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: ux+uy+fx+fy in, ux1+uy1 out (24) + ph (1) + 2 coarse
        # outs at 1/2 rows (4)
        cost_estimate=pl.CostEstimate(
            flops=190 * (ux_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=29 * (ux_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, dx, dy, bnd)
    # fc ghost-block invariant as the scalar _run_rr: mask before reducing.
    return ux1, uy1, fcx, fcy, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "consts", "R_up",
    "interpret", "vmem_mb"))
def _run_el_psweep(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, ucx, ucy, dx, dy,
                   bnd, *, R, H, W, Wp, a0, da, omega, s, consts, R_up,
                   interpret, vmem_mb=None):
    nb = (ux_pad.shape[0] - 2 * R) // R
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    kern = functools.partial(
        _el_psweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, consts=consts)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),
                _lagged_spec(R, Wp, 0), _lagged_spec(R, Wp, 0),
                _lagged_spec(R, Wp, 0),
                _lagged_spec(R // 2, Wp, 2 * R_up // R),
                _lagged_spec(R // 2, Wp, 2 * R_up // R),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC]
    out_specs = [
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    ux3, uy3 = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(ux_pad.shape, ux_pad.dtype),
            jax.ShapeDtypeStruct(uy_pad.shape, uy_pad.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 1, Wp), jnp.float32),
            pltpu.VMEM((R + 1, Wp), jnp.float32),
            pltpu.VMEM((1, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + 1, Wp), jnp.float32),
            pltpu.VMEM((R // 2 + 1, Wp), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: u+f in, out (24) + ph (1) + 2 coarse in at 1/2 rows (4)
        cost_estimate=pl.CostEstimate(
            flops=120 * (ux_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=29 * (ux_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(ux_pad, uy_pad, fx_pad, fy_pad, ph_pad, ucx, ucy, dx, dy, bnd)
    return ux3, uy3


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "consts", "Rc",
    "out_rows", "interpret", "vmem_mb"))
def _run_el_zrr(fx_pad, fy_pad, ph_pad, bnd, *, R, H, W, Wp, a0, da, omega,
                s, consts, Rc, interpret, vmem_mb=None, out_rows=None):
    nb = (fx_pad.shape[0] - 2 * R) // R
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _el_zrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, consts=consts)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),
                _lagged_spec(R, Wp, 1), _SMEM_SPEC]
    out_specs = [_lagged_spec(R // 2, Wp, idx_off),
                 _lagged_spec(R // 2, Wp, idx_off)]
    fcx, fcy = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, Wp), fx_pad.dtype),
            jax.ShapeDtypeStruct((out_rows, Wp), fx_pad.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: fx+fy in (8) + ph (1) + 2 coarse outs (4)
        cost_estimate=pl.CostEstimate(
            flops=130 * (fx_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=13 * (fx_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(fx_pad, fy_pad, ph_pad, bnd)
    return fcx, fcy


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "omega", "s", "consts", "R_up",
    "interpret", "vmem_mb"))
def _run_el_zpsweep(fx_pad, fy_pad, ph_pad, ucx, ucy, dx, dy, bnd, *, R, H,
                    W, Wp, a0, da, omega, s, consts, R_up, interpret,
                    vmem_mb=None):
    nb = (fx_pad.shape[0] - 2 * R) // R
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    kern = functools.partial(
        _el_zpsweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        s=s, nb=nb, consts=consts)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1),
                _lagged_spec(R, Wp, 1),
                _lagged_spec(R // 2, Wp, 2 * R_up // R),
                _lagged_spec(R // 2, Wp, 2 * R_up // R),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC]
    out_specs = [
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    ux3, uy3 = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(fx_pad.shape, fx_pad.dtype),
            jax.ShapeDtypeStruct(fx_pad.shape, fx_pad.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 1, Wp), jnp.float32),
            pltpu.VMEM((R + 1, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + 1, Wp), jnp.float32),
            pltpu.VMEM((R // 2 + 1, Wp), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes/node: fx+fy in (8) + ph (1) + 2 coarse in (4) + 2 out (8)
        cost_estimate=pl.CostEstimate(
            flops=200 * (fx_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=21 * (fx_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0),
    )(fx_pad, fy_pad, ph_pad, ucx, ucy, dx, dy, bnd)
    return ux3, uy3
