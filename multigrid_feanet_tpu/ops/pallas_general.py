"""Pallas TPU kernels for GENERAL spatially-varying 9-point operators and
operator-induced (BoxMG/W4) inter-grid transfers — the production path for
the industrialized BoxMG hierarchy (round 5; setup math in ops/boxmg.py).

Same design rules as the round-2 kernel family (ops/pallas_sweep.py — read
its module docstring first): lagged pipelines with persistent VMEM caches
for the +-1-row halos, donated destinations, stride-lane coarse layouts
(level l keeps the finest lane width with data every 2^l lanes), free
pre-update residual norms, and jnp.where masks (never ``* mask``) so
uninitialized ghost-block rows can never poison a reduction.

New ingredients over the fixed-stencil family:

- **9-plane operator streams.**  A general level's operator is a per-node
  (3, 3) stencil stored as a (9, Hp + 2R, Wp) plane stack in the level's
  own layout; ``A u`` is 9 FMAs against a rolled/row-shifted u window.
  The Jacobi ``omega / d`` guards the centre plane in-register
  (``_guard_d``) — outside-the-grid coefficient slots are zero, and
  ops/boxmg.py guards the Dirichlet-ring centers at setup.  Plane stacks
  may be stored bf16
  (``coef_dtype``): the kernels cast to f32 on load — transfers and coarse
  operators are preconditioner-side, so storage rounding perturbs the
  cycle, not the fixed point (level 0 keeps the EXACT int8-phase
  bi-material operator).

- **W4 transfer streams.**  Operator-induced P/R in the composed
  per-fine-node (2, 2) form of ops/boxmg.py, stored as a (4, ., .) plane
  stack  [w00, w01, w10, w11]  in the FINE level's layout.  Prolongation
  of a stride-2s coarse field is 4 FMAs against parity-selected lane
  rolls; restriction (the exact transpose) is the same planes contracted
  over each coarse node's 3x3 fine window — both fuse into the sweep
  kernels exactly like the bilinear/full-weighting legs they generalize.

Kernel inventory (V(1,1) BoxMG cycle = gswrr + gpsweep at level 0,
zgwrr + zgpsweep at general coarse levels):

  gsweep    general weighted-Jacobi sweep (+ free pre-update residual
            norm^2); mode="residual" emits the masked residual instead.
  gswrr     pre-smooth sweep + residual of the swept iterate + W4
            restriction in ONE pass (operator: bim via int8 phase, or
            general via planes) -> (u1, f_c, rsq).
  gpsweep   W4 prolongation-add fused into the first post-smoothing sweep
            (operator: bim or general).
  zgwrr     ZERO-initial-guess descent: u1 = (omega/d) f pointwise (never
            stored) + residual + W4 restriction (general operator).
  zgpsweep  ZERO-initial-guess ascent: recompute u1 pointwise, add the W4
            correction, post-smooth (general operator).

Single-device kernels (no shard halo strips): the distributed BoxMG path
is future work — the plain V-cycle and H-MG families carry the sharded
paths (parallel/pallas_shard.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_feanet_tpu.ops.pallas_sweep import (
    _DUMMY_SPEC,
    _SMEM_SPEC,
    _apply_bim,
    _apply_op,
    _default_bounds,
    _diag_bim,
    _interior_mask,
    _lagged_spec,
    _owned_rows_mask,
    _roll_m,
    _roll_p,
    _round_up,
)


def _plane_spec(K, R, Wp, off):
    """Lagged BlockSpec for a (K, rows, Wp) plane stack."""
    return pl.BlockSpec((K, R, Wp), lambda i, o=off: (0, i + o, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# In-kernel math helpers.
# ---------------------------------------------------------------------------


def _apply_gen(u_win, s9, L, s):
    """General A u on node rows [1, L-1) of an (L, Wp) u window.  ``s9``:
    (9, L-2, Wp) f32 stencil planes aligned to the OUTPUT rows (plane
    3*dr + dc couples to the (dr-1, (dc-1)*s) neighbour)."""
    uW = _roll_m(u_win, s)
    uE = _roll_p(u_win, s)
    au = None
    for dr in range(3):
        sl = slice(dr, dr + L - 2)
        t = (s9[3 * dr + 0] * uW[sl] + s9[3 * dr + 1] * u_win[sl]
             + s9[3 * dr + 2] * uE[sl])
        au = t if au is None else au + t
    return au


def _w4_corr(cw, w4m, R, Wp, s):
    """W4 prolongation of a coarse window onto R+2 fine rows starting at an
    ODD fine row ``row0``:  corr[m] = sum_ab w4m[2a+b, m] * uc[(row0+m)//2
    + a, lane-sampled b].  ``cw``: (R/2+2, Wp) coarse rows [c0, c0+R/2+2)
    with c0 = (row0-1)/2; ``w4m``: (4, R+2, Wp) f32 planes aligned to the
    fine rows.  Caller masks the result to the interior (rows beyond the
    data read zeros whose weights are also zero)."""
    K = R // 2 + 2
    x, y = cw[0 : K - 1], cw[1:K]
    # ucA[m] = cw[ceil(m/2)]  (the a=0 coarse source row of fine row m)
    ucA = jnp.stack([x, y], axis=1).reshape(2 * K - 2, Wp)
    yz = jnp.concatenate([cw[2:K], jnp.zeros((1, Wp), jnp.float32)], axis=0)
    # ucB[m] = cw[ceil(m/2) + 1]  (a=1 source; the one out-of-window read,
    # at the last EVEN fine row, carries an identically-zero weight)
    ucB = jnp.stack([y, yz], axis=1).reshape(2 * K - 2, Wp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    even_lane = (lane & (2 * s - 1)) == 0

    def b0(xr):
        return jnp.where(even_lane, xr, _roll_m(xr, s))

    def b1(xr):
        return jnp.where(even_lane, _roll_p(xr, 2 * s), _roll_p(xr, s))

    return (w4m[0] * b0(ucA) + w4m[1] * b1(ucA)
            + w4m[2] * b0(ucB) + w4m[3] * b1(ucB))


def _w4_restrict(r, w4m, R, Wp, s):
    """W4 restriction (exact P^T): ``r`` (R+1, Wp) interior-masked residual
    rows [(i-1)R - 1, iR - 1]; ``w4m`` (4, R+1, Wp) f32 planes aligned.
    Returns (R/2, Wp) coarse rows [(i-1)R/2, iR/2) on the 2s-lane grid
    (caller masks to the coarse interior)."""
    t00, t01, t10, t11 = (w4m[k] * r for k in range(4))

    def rowsum(t0, t1):
        # rows_b[c] = t1[2c] + t0[2c+1] + t0[2c+2]
        X0 = t0[0:R].reshape(R // 2, 2, Wp)
        X1 = t1[0:R].reshape(R // 2, 2, Wp)
        B0 = jnp.concatenate([X0[1:, 0], t0[R : R + 1]], axis=0)
        return X1[:, 0] + X0[:, 1] + B0

    rows0 = rowsum(t00, t10)
    rows1 = rowsum(t01, t11)
    return _roll_m(rows1, s) + rows0 + _roll_p(rows0, s)


def _guard_d(d):
    return jnp.where(jnp.abs(d) > 0.0, d, 1.0)


# ---------------------------------------------------------------------------
# Kernel 1: general sweep / residual.
# ---------------------------------------------------------------------------


def _gsweep_kernel(u_ref, f_ref, s9_ref, dst_ref, bnd_ref, u_out, rsq_ref,
                   cache, *, R, H, W, Wp, omega, s, nb, own_hi, mode):
    """Grid step i emits node rows [(i-1)R, iR).  u lags by one block
    (cache invariant: cache[0 : R+1] = u rows [(i-1)R - 1, iR)); f and the
    s9 planes ride block i (aligned to the output rows)."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    lo, hi = bnd_ref[0], bnd_ref[1]

    cache[R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        u_ref[0:1, :].astype(jnp.float32))
    u_win = cache[...]
    s9 = s9_ref[...].astype(jnp.float32)
    au = _apply_gen(u_win, s9, R + 2, s)
    r = f_ref[...].astype(jnp.float32) - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    if mode == "sweep":
        d = _guard_d(s9[4])
        u_out[...] = (u_win[1 : R + 1, :] + (omega / d) * r).astype(
            u_out.dtype)
    else:  # residual
        u_out[...] = r.astype(u_out.dtype)

    @pl.when(i > 0)
    def _():
        rq = jnp.where(_owned_rows_mask(row0 + 1, R, 0, own_hi), r, 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    cache[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                              cache[R : R + 1, :])
    cache[1 : R + 1, :] = u_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 2: fused descent leg — pre-smooth + residual + W4 restriction.
# ---------------------------------------------------------------------------


def _gswrr_kernel(u_ref, f_ref, op_ref, w4_ref, dst_ref, bnd_ref, u1_out,
                  fc_out, rsq_ref, uwin, fwin, opw, w4c, u1c, *, R, H, W, Wp,
                  a0, da, mass, omega, s, nb, own_hi, bim, dform=False):
    """Grid step i emits u1 node rows [(i-1)R, iR) AND coarse rows
    [(i-1)R/2, iR/2) of f_c = P^T (f - A u1), u1 = jacobi_sweep(u0).

    u/f/op lag by ONE block; w4 rides block i.  Cache invariants at step i:
      uwin[0 : R+2] = u0 rows [(i-1)R - 2, iR)
      fwin[0 : R+1] = f  rows [(i-1)R - 1, iR)
      bim: opw[0 : R+2] = element rows [(i-1)R - 2, iR)   (int8 phases)
      gen: opw[:, 0 : R+1] = s9 rows [(i-1)R - 1, iR)
      w4c[:, 0] = w4 row (i-1)R - 1;  u1c[0] = u1 row (i-1)R - 2.
    ``rsq`` is the free PRE-sweep residual norm^2 over rows
    [(i-1)R - 1, iR - 1) (disjoint per step, owned range [-1, own_hi])."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 2  # uwin row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    uwin[R + 2 : R + 4, :] = jnp.where(
        i == nb, jnp.zeros((2, Wp), jnp.float32),
        u_ref[0:2, :].astype(jnp.float32))
    fwin[R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        f_ref[0:1, :].astype(jnp.float32))
    if bim:
        opw[R + 2 : R + 3, :] = jnp.where(
            i == nb, jnp.zeros((1, Wp), jnp.int8), op_ref[0:1, :])
    else:
        opw[:, R + 1 : R + 2, :] = jnp.where(
            i == nb, jnp.zeros((9, 1, Wp), jnp.float32),
            op_ref[:, 0:1, :].astype(jnp.float32))

    uw = uwin[...]  # (R+4, Wp): u0 rows [row0, row0 + R + 4)
    f0 = fwin[...]  # (R+2, Wp): f rows [row0 + 1, row0 + R + 3)
    if bim:
        phin = opw[...]  # (R+3, Wp): element rows [row0, row0 + R + 3)
        au0, C4 = _apply_op(uw, phin, R + 4, a0, da, s, mass, True, dform)
        d = _diag_bim(C4, mass)
    else:
        s9w = opw[...].astype(jnp.float32)  # (9, R+2, Wp): rows of f0
        au0 = _apply_gen(uw, s9w, R + 4, s)
        d = _guard_d(s9w[4])
    r0 = f0 - au0
    r0 = jnp.where(_interior_mask(row0 + 1, R + 2, Wp, lo, hi, W, s), r0, 0.0)
    u1full = uw[1 : R + 3, :] + (omega / d) * r0  # u1 rows [(i-1)R-1, iR]
    u1_out[...] = u1full[1 : R + 1, :].astype(u1_out.dtype)

    @pl.when(i > 0)
    def _():
        rq = jnp.where(_owned_rows_mask(row0 + 1, R, -1, own_hi),
                       r0[0:R, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # residual of u1 on rows [(i-1)R - 1, iR - 1]
    u1buf = jnp.concatenate([u1c[...], u1full], axis=0)  # rows [(i-1)R-2, iR]
    if bim:
        au1, _ = _apply_op(u1buf, phin[0 : R + 2, :], R + 3, a0, da, s,
                           mass, True, dform)
    else:
        au1 = _apply_gen(u1buf, s9w[:, 0 : R + 1, :], R + 3, s)
    r1 = f0[0 : R + 1, :] - au1
    r1 = jnp.where(_interior_mask(row0 + 1, R + 1, Wp, lo, hi, W, s), r1, 0.0)
    w4m = jnp.concatenate(
        [w4c[...], w4_ref[...].astype(jnp.float32)], axis=1)  # rows of r1
    fc = _w4_restrict(r1, w4m, R, Wp, s)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    # roll caches forward
    u1c[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                            u1full[R - 1 : R, :])
    uwin[0:2, :] = jnp.where(i == 0, jnp.zeros((2, Wp), jnp.float32),
                             uwin[R : R + 2, :])
    uwin[2:4, :] = uwin[R + 2 : R + 4, :]
    uwin[4 : R + 2, :] = u_ref[2:R, :].astype(jnp.float32)
    fwin[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                             fwin[R : R + 1, :])
    fwin[1:2, :] = fwin[R + 1 : R + 2, :]
    fwin[2 : R + 1, :] = f_ref[1:R, :].astype(jnp.float32)
    if bim:
        opw[0:2, :] = jnp.where(i == 0, jnp.zeros((2, Wp), jnp.int8),
                                opw[R : R + 2, :])
        opw[2:3, :] = opw[R + 2 : R + 3, :]
        opw[3 : R + 2, :] = op_ref[1:R, :]
    else:
        opw[:, 0:1, :] = jnp.where(i == 0, jnp.zeros((9, 1, Wp), jnp.float32),
                                   opw[:, R : R + 1, :])
        opw[:, 1:2, :] = opw[:, R + 1 : R + 2, :]
        opw[:, 2 : R + 1, :] = op_ref[:, 1:R, :].astype(jnp.float32)
    w4c[:, 0:1, :] = w4_ref[:, R - 1 : R, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 3: fused ascent leg — W4 prolongation-add + post-smooth sweep.
# ---------------------------------------------------------------------------


def _gpsweep_kernel(u_ref, f_ref, op_ref, w4_ref, uc_ref, dst_ref, bnd_ref,
                    u_out, cache, opc, w4w, ucc, *, R, H, W, Wp, a0, da, mass,
                    omega, s, nb, bim, dform=False):
    """Grid step i emits node rows [(i-1)R, iR) of u3 = jacobi(u1 + P uc).

    u and w4 lag by one block; f (and bim phases / gen s9 planes) ride
    block i; uc as in the fixed-stencil psweep.  Cache invariants:
      cache[0 : R+1]   = u rows [(i-1)R - 1, iR)
      w4w[:, 0 : R+1]  = w4 rows [(i-1)R - 1, iR)
      ucc[0 : R/2+1]   = coarse rows [(i-1)R/2 - 1, iR/2)
      bim: opc[0] = element row (i-1)R - 1."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    lo, hi = bnd_ref[0], bnd_ref[1]

    cache[R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        u_ref[0:1, :].astype(jnp.float32))
    w4w[:, R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((4, 1, Wp), jnp.float32),
        w4_ref[:, 0:1, :].astype(jnp.float32))
    ucc[R // 2 + 1 : R // 2 + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        uc_ref[0:1, :].astype(jnp.float32))

    corr = _w4_corr(ucc[...], w4w[...], R, Wp, s)
    corr = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), corr, 0.0)
    u_win = cache[...] + corr

    if bim:
        ph_win = jnp.concatenate([opc[...], op_ref[...]], axis=0)
        au, C4 = _apply_op(u_win, ph_win, R + 2, a0, da, s, mass, True, dform)
        d = _diag_bim(C4, mass)
    else:
        s9 = op_ref[...].astype(jnp.float32)  # aligned to output rows
        au = _apply_gen(u_win, s9, R + 2, s)
        d = _guard_d(s9[4])
    r = f_ref[...].astype(jnp.float32) - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    u_out[...] = (u_win[1 : R + 1, :] + (omega / d) * r).astype(u_out.dtype)

    cache[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                              cache[R : R + 1, :])
    cache[1 : R + 1, :] = u_ref[...].astype(jnp.float32)
    w4w[:, 0:1, :] = jnp.where(i == 0, jnp.zeros((4, 1, Wp), jnp.float32),
                               w4w[:, R : R + 1, :])
    w4w[:, 1 : R + 1, :] = w4_ref[...].astype(jnp.float32)
    if bim:
        opc[0:1, :] = op_ref[R - 1 : R, :]
    ucc[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                            ucc[R // 2 : R // 2 + 1, :])
    ucc[1 : R // 2 + 1, :] = uc_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernels 4/5: ZERO-initial-guess general level legs.
# ---------------------------------------------------------------------------


def _zgwrr_kernel(f_ref, s9_ref, w4_ref, bnd_ref, fc_out, fwin, s9w, w4c, *,
                  R, H, W, Wp, omega, s, nb):
    """Grid step i emits coarse rows [(i-1)R/2, iR/2) of
    f_c = P^T (f - A u1), u1 = (omega/d) f at interior nodes (never stored).

    f and s9 lag by ONE block.  Cache invariants at step i:
      fwin[0 : R+2]   = f rows [(i-1)R - 2, iR)
      s9w[:, 0 : R+2] = s9 rows [(i-1)R - 2, iR)
      w4c[:, 0]       = w4 row (i-1)R - 1."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 2  # fwin row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    fwin[R + 2 : R + 3, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        f_ref[0:1, :].astype(jnp.float32))
    s9w[:, R + 2 : R + 3, :] = jnp.where(
        i == nb, jnp.zeros((9, 1, Wp), jnp.float32),
        s9_ref[:, 0:1, :].astype(jnp.float32))

    f0 = fwin[...]  # (R+3, Wp): f rows [row0, row0 + R + 3)
    s9 = s9w[...].astype(jnp.float32)  # same rows
    d = _guard_d(s9[4])
    u1 = (omega / d) * f0
    u1 = jnp.where(_interior_mask(row0, R + 3, Wp, lo, hi, W, s), u1, 0.0)
    au1 = _apply_gen(u1, s9[:, 1 : R + 2, :], R + 3, s)
    r1 = f0[1 : R + 2, :] - au1  # rows [(i-1)R - 1, iR - 1]
    r1 = jnp.where(_interior_mask(row0 + 1, R + 1, Wp, lo, hi, W, s), r1, 0.0)
    w4m = jnp.concatenate(
        [w4c[...], w4_ref[...].astype(jnp.float32)], axis=1)
    fc = _w4_restrict(r1, w4m, R, Wp, s)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    fwin[0:2, :] = jnp.where(i == 0, jnp.zeros((2, Wp), jnp.float32),
                             fwin[R : R + 2, :])
    fwin[2:3, :] = fwin[R + 2 : R + 3, :]
    fwin[3 : R + 2, :] = f_ref[1:R, :].astype(jnp.float32)
    s9w[:, 0:2, :] = jnp.where(i == 0, jnp.zeros((9, 2, Wp), jnp.float32),
                               s9w[:, R : R + 2, :])
    s9w[:, 2:3, :] = s9w[:, R + 2 : R + 3, :]
    s9w[:, 3 : R + 2, :] = s9_ref[:, 1:R, :].astype(jnp.float32)
    w4c[:, 0:1, :] = w4_ref[:, R - 1 : R, :].astype(jnp.float32)


def _zgpsweep_kernel(f_ref, s9_ref, w4_ref, uc_ref, dst_ref, bnd_ref, u_out,
                     fwin, s9w, w4w, ucc, *, R, H, W, Wp, omega, s, nb):
    """Grid step i emits rows [(i-1)R, iR) of u3 = jacobi(u2),
    u2 = (omega/d) f (interior) + P(uc).

    f, s9 and w4 lag by ONE block.  Cache invariants at step i:
      fwin[0 : R+1]   = f rows [(i-1)R - 1, iR)
      s9w[:, 0 : R+1] = s9 rows [(i-1)R - 1, iR)
      w4w[:, 0 : R+1] = w4 rows [(i-1)R - 1, iR)
      ucc[0 : R/2+1]  = coarse rows [(i-1)R/2 - 1, iR/2)."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1
    lo, hi = bnd_ref[0], bnd_ref[1]

    fwin[R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        f_ref[0:1, :].astype(jnp.float32))
    s9w[:, R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((9, 1, Wp), jnp.float32),
        s9_ref[:, 0:1, :].astype(jnp.float32))
    w4w[:, R + 1 : R + 2, :] = jnp.where(
        i == nb, jnp.zeros((4, 1, Wp), jnp.float32),
        w4_ref[:, 0:1, :].astype(jnp.float32))
    ucc[R // 2 + 1 : R // 2 + 2, :] = jnp.where(
        i == nb, jnp.zeros((1, Wp), jnp.float32),
        uc_ref[0:1, :].astype(jnp.float32))

    f0 = fwin[...]  # (R+2, Wp): f rows [row0, row0 + R + 2)
    s9 = s9w[...].astype(jnp.float32)
    d_all = _guard_d(s9[4])
    u1 = (omega / d_all) * f0
    u1 = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), u1, 0.0)
    corr = _w4_corr(ucc[...], w4w[...], R, Wp, s)
    corr = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), corr, 0.0)
    u2 = u1 + corr
    au = _apply_gen(u2, s9[:, 1 : R + 1, :], R + 2, s)
    d = d_all[1 : R + 1, :]
    r = f0[1 : R + 1, :] - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    u_out[...] = (u2[1 : R + 1, :] + (omega / d) * r).astype(u_out.dtype)

    fwin[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                             fwin[R : R + 1, :])
    fwin[1:2, :] = fwin[R + 1 : R + 2, :]
    fwin[2 : R + 1, :] = f_ref[1:R, :].astype(jnp.float32)
    s9w[:, 0:1, :] = jnp.where(i == 0, jnp.zeros((9, 1, Wp), jnp.float32),
                               s9w[:, R : R + 1, :])
    s9w[:, 1:2, :] = s9w[:, R + 1 : R + 2, :]
    s9w[:, 2 : R + 1, :] = s9_ref[:, 1:R, :].astype(jnp.float32)
    w4w[:, 0:1, :] = jnp.where(i == 0, jnp.zeros((4, 1, Wp), jnp.float32),
                               w4w[:, R : R + 1, :])
    w4w[:, 1:2, :] = w4w[:, R + 1 : R + 2, :]
    w4w[:, 2 : R + 1, :] = w4_ref[:, 1:R, :].astype(jnp.float32)
    ucc[0:1, :] = jnp.where(i == 0, jnp.zeros((1, Wp), jnp.float32),
                            ucc[R // 2 : R // 2 + 1, :])
    ucc[1 : R // 2 + 1, :] = uc_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Module-level jitted entry points.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "omega", "s", "mode", "interpret", "vmem_mb",
    "own_rows"))
def _run_gsweep(u_pad, f_pad, s9_pad, dst, bnd, *, R, H, W, Wp, omega, s,
                mode, interpret, vmem_mb=None, own_rows=None):
    nb = (u_pad.shape[0] - 2 * R) // R
    if bnd is None:
        bnd = _default_bounds(H, W)
    kern = functools.partial(
        _gsweep_kernel, R=R, H=H, W=W, Wp=Wp, omega=omega, s=s, nb=nb,
        own_hi=(own_rows if own_rows is not None else nb * R) - 1, mode=mode)
    out, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 0),
                  _plane_spec(9, R, Wp, 0),
                  pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC],
        out_specs=[
            pl.BlockSpec((R, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R + 2, Wp), jnp.float32)],
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=30 * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(3 * u_pad.dtype.itemsize
                            + 9 * s9_pad.dtype.itemsize)
            * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(u_pad, f_pad, s9_pad, dst, bnd)
    return out, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "Rc", "bim",
    "out_rows", "own_rows", "interpret", "vmem_mb", "dform"))
def _run_gswrr(u_pad, f_pad, op_pad, w4_pad, dst, bnd, *, R, H, W, Wp, a0,
               da, mass, omega, s, Rc, bim, interpret, vmem_mb=None,
               out_rows=None, own_rows=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _gswrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, mass=mass,
        omega=omega, s=s, nb=nb,
        own_hi=(own_rows if own_rows is not None else nb * R) - 2, bim=bim,
        dform=dform)
    op_spec = (_lagged_spec(R, Wp, 1) if bim else _plane_spec(9, R, Wp, 1))
    op_scratch = (pltpu.VMEM((R + 3, Wp), jnp.int8) if bim
                  else pltpu.VMEM((9, R + 2, Wp), jnp.float32))
    u1, fc, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1), op_spec,
                  _plane_spec(4, R, Wp, 0),
                  pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC],
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
            pltpu.VMEM((R + 4, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            op_scratch,
            pltpu.VMEM((4, 1, Wp), jnp.float32),
            pltpu.VMEM((1, Wp), jnp.float32),
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=(90 if bim else 70) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(
                3 * u_pad.dtype.itemsize + 2
                + (1 if bim else 9 * op_pad.dtype.itemsize)
                + 4 * w4_pad.dtype.itemsize) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(u_pad, f_pad, op_pad, w4_pad, dst, bnd)
    # Same ghost-block invariant as pallas_sweep._run_rr: fc blocks outside
    # [idx_off, nb + idx_off] are never written; consumers must where-mask.
    return u1, fc, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "R_up", "bim",
    "interpret", "vmem_mb", "dform"))
def _run_gpsweep(u_pad, f_pad, op_pad, w4_pad, uc_pad, dst, bnd, *, R, H, W,
                 Wp, a0, da, mass, omega, s, R_up, bim, interpret,
                 vmem_mb=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    kern = functools.partial(
        _gpsweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, mass=mass,
        omega=omega, s=s, nb=nb, bim=bim, dform=dform)
    op_spec = (_lagged_spec(R, Wp, 0) if bim else _plane_spec(9, R, Wp, 0))
    op_scratch = (pltpu.VMEM((1, Wp), jnp.int8) if bim
                  else pltpu.VMEM((1, Wp), jnp.int8))  # dummy when general
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 0), op_spec,
                  _plane_spec(4, R, Wp, 1),
                  _lagged_spec(R // 2, Wp, 2 * R_up // R),
                  pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC],
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            op_scratch,
            pltpu.VMEM((4, R + 2, Wp), jnp.float32),
            pltpu.VMEM((R // 2 + 2, Wp), jnp.float32),
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=(60 if bim else 45) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(
                3 * u_pad.dtype.itemsize + 2
                + (1 if bim else 9 * op_pad.dtype.itemsize)
                + 4 * w4_pad.dtype.itemsize) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(u_pad, f_pad, op_pad, w4_pad, uc_pad, dst, bnd)
    return out


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "omega", "s", "Rc", "out_rows", "interpret",
    "vmem_mb"))
def _run_zgwrr(f_pad, s9_pad, w4_pad, bnd, *, R, H, W, Wp, omega, s, Rc,
               interpret, vmem_mb=None, out_rows=None):
    nb = (f_pad.shape[0] - 2 * R) // R
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(_zgwrr_kernel, R=R, H=H, W=W, Wp=Wp, omega=omega,
                             s=s, nb=nb)
    fc = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _plane_spec(9, R, Wp, 1),
                  _plane_spec(4, R, Wp, 0), _SMEM_SPEC],
        out_specs=_lagged_spec(R // 2, Wp, idx_off),
        out_shape=jax.ShapeDtypeStruct((out_rows, Wp), f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((9, R + 3, Wp), jnp.float32),
            pltpu.VMEM((4, 1, Wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=55 * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(f_pad.dtype.itemsize + 2
                            + 9 * s9_pad.dtype.itemsize
                            + 4 * w4_pad.dtype.itemsize)
            * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(f_pad, s9_pad, w4_pad, bnd)
    return fc


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "omega", "s", "R_up", "interpret", "vmem_mb"))
def _run_zgpsweep(f_pad, s9_pad, w4_pad, uc_pad, dst, bnd, *, R, H, W, Wp,
                  omega, s, R_up, interpret, vmem_mb=None):
    nb = (f_pad.shape[0] - 2 * R) // R
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    kern = functools.partial(_zgpsweep_kernel, R=R, H=H, W=W, Wp=Wp,
                             omega=omega, s=s, nb=nb)
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=[_lagged_spec(R, Wp, 1), _plane_spec(9, R, Wp, 1),
                  _plane_spec(4, R, Wp, 1),
                  _lagged_spec(R // 2, Wp, 2 * R_up // R),
                  pl.BlockSpec(memory_space=pl.ANY), _SMEM_SPEC],
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(dst.shape, f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((9, R + 2, Wp), jnp.float32),
            pltpu.VMEM((4, R + 2, Wp), jnp.float32),
            pltpu.VMEM((R // 2 + 2, Wp), jnp.float32),
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        cost_estimate=pl.CostEstimate(
            flops=45 * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(2 * f_pad.dtype.itemsize + 2
                            + 9 * s9_pad.dtype.itemsize
                            + 4 * w4_pad.dtype.itemsize)
            * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(f_pad, s9_pad, w4_pad, uc_pad, dst, bnd)
    return out


# ---------------------------------------------------------------------------
# Host-side level wrapper.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("R", "s", "Hp", "Wp", "dtype"))
def _pad_planes(planes, R, s, Hp, Wp, dtype):
    """(K, H, W) compact planes -> (K, Hp + 2R, Wp) ghost-block stride-lane
    buffers by pure pad + reshape (a strided .at[...].set scatter at these
    shapes costs tens of seconds of XLA compile per level through the
    remote tunnel).  Out-of-grid coefficient slots are ZERO — every kernel
    guards the Jacobi diagonal in-register (_guard_d), so a zero centre
    never divides."""
    K, Hh, Ww = planes.shape
    x = planes.astype(dtype)[..., None]
    if s > 1:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, s - 1)))
    # trim the expansion past the LAST data lane ((W-1)s + 1 lanes used):
    # W*s may exceed Wp at deep strides even though the data lanes fit
    x = x.reshape(K, Hh, Ww * s)[:, :, : (Ww - 1) * s + 1]
    return jnp.pad(x, ((0, 0), (R, Hp + R - Hh),
                       (0, Wp - (Ww - 1) * s - 1)))


class GeneralPallasLevel:
    """Kernels + ghost-block stride-lane layout for one BoxMG level.

    Operator: either the exact bi-material element-phase form (``phase`` +
    ``coefficients``/``mass`` — level 0) or a general per-node stencil
    field (``s9``: compact (H, W, 3, 3) — Galerkin coarse levels, stored
    as 9 planes in ``coef_dtype``).  ``w4``: this level's compact
    (H, W, 2, 2) operator-induced transfer weights (ops/boxmg.py), stored
    as 4 planes in ``coef_dtype``; None at the coarsest Pallas level.
    """

    def __init__(self, n: int, stride: int = 1, s9=None, phase=None,
                 coefficients=(1.0, 20.0), mass=None, w4=None,
                 omega: float = 2.0 / 3.0, Wp: Optional[int] = None,
                 rows: int = 64, rows_next: Optional[int] = None,
                 interpret: Optional[bool] = None, dtype=jnp.float32,
                 coef_dtype=jnp.float32, vmem_mb: Optional[int] = 96):
        assert s9 is None or phase is None, "pass s9 OR phase, not both"
        self.n = n
        self.H = self.W = n + 1
        self.s = int(stride)
        self.R = int(rows)
        self.Rc = int(rows_next if rows_next is not None else rows)
        assert self.R % 32 == 0 and (2 * self.Rc) % self.R == 0
        self.Wp = Wp or _round_up(self.W * self.s, 128)
        assert (self.W - 1) * self.s < self.Wp
        self.Hp = _round_up(self.H, self.R)
        self.nb = self.Hp // self.R
        self.omega = float(omega)
        self.dtype = dtype
        self.mass = tuple(float(m) for m in mass) if mass is not None else None
        # difference-form level-0 stencil assembly (pallas_sweep._apply_bim_d)
        self.dform = self.mass is None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        self.vmem_mb = vmem_mb
        self.bim = s9 is None
        if self.bim:
            # exact two-phase operator: int8 element-phase stream (zeros =
            # homogeneous, so a0 carries the whole operator)
            self.a0 = float(coefficients[0])
            self.da = float(coefficients[1]) - float(coefficients[0])
            ph_np = (np.zeros((n, n), np.int8) if phase is None
                     else np.asarray(phase, np.int8))
            buf = np.zeros(self.buf_shape, np.int8)
            buf[self.R : self.R + n, 0 : n * self.s : self.s] = ph_np
            self.op_pad = jnp.asarray(buf)
        else:
            self.a0, self.da = 0.0, 0.0
            planes = jnp.transpose(s9.reshape(self.H, self.W, 9), (2, 0, 1))
            self.op_pad = _pad_planes(planes, R=self.R, s=self.s, Hp=self.Hp,
                                      Wp=self.Wp, dtype=coef_dtype)
        if w4 is not None:
            planes = jnp.transpose(w4.reshape(self.H, self.W, 4), (2, 0, 1))
            self.w4_pad = _pad_planes(planes, R=self.R, s=self.s, Hp=self.Hp,
                                      Wp=self.Wp, dtype=coef_dtype)
        else:
            self.w4_pad = None

    # ---- layout (identical to ops/pallas_sweep.PallasLevel) ----

    @property
    def buf_shape(self):
        return (self.Hp + 2 * self.R, self.Wp)

    def zeros(self):
        return jnp.zeros(self.buf_shape, self.dtype)

    def pad(self, x, dtype=None):
        dtype = dtype or self.dtype
        h, w = x.shape
        out = jnp.zeros(self.buf_shape, dtype)
        return out.at[self.R : self.R + h, 0 : w * self.s : self.s].set(
            x.astype(dtype))

    def unpad(self, x):
        return x[self.R : self.R + self.H,
                 0 : (self.W - 1) * self.s + 1 : self.s]

    def _cfg(self):
        return dict(R=self.R, H=self.H, W=self.W, Wp=self.Wp,
                    omega=self.omega, s=self.s, interpret=self.interpret)

    # ---- kernels ----

    def sweep(self, u_pad, f_pad, dst=None, bnd=None, op_pad=None):
        """Weighted-Jacobi sweep -> (u_new, pre-update rsq).  Bi-material
        levels delegate to the exact fixed-family kernel
        (pallas_sweep._run_sweep); general levels run the 9-plane kernel.

        ``op_pad``/``w4_pad`` overrides (here and in every method below):
        pass the level's plane buffers as explicit JITTED-FUNCTION
        ARGUMENTS — a closed-over multi-hundred-MB device array is inlined
        into the program as an HLO constant, which the remote-compile
        tunnel rejects outright (HTTP 413)."""
        if dst is None:
            dst = self.zeros()
        if op_pad is None:
            op_pad = self.op_pad
        if self.bim:
            from multigrid_feanet_tpu.ops.pallas_sweep import _run_sweep

            return _run_sweep(u_pad, f_pad, op_pad, None, dst, None,
                              None, bnd, a0=self.a0, da=self.da,
                              mass=self.mass, mode="sweep", R_up=0,
                              vmem_mb=self.vmem_mb, dform=self.dform,
                              **self._cfg())
        return _run_gsweep(u_pad, f_pad, op_pad, dst, bnd, mode="sweep",
                           vmem_mb=self.vmem_mb, **self._cfg())

    def residual(self, u_pad, f_pad, dst=None, bnd=None, op_pad=None):
        if dst is None:
            dst = self.zeros()
        if op_pad is None:
            op_pad = self.op_pad
        if self.bim:
            from multigrid_feanet_tpu.ops.pallas_sweep import _run_sweep

            return _run_sweep(u_pad, f_pad, op_pad, None, dst, None,
                              None, bnd, a0=self.a0, da=self.da,
                              mass=self.mass, mode="residual", R_up=0,
                              vmem_mb=self.vmem_mb, dform=self.dform,
                              **self._cfg())
        return _run_gsweep(u_pad, f_pad, op_pad, dst, bnd,
                           mode="residual", vmem_mb=self.vmem_mb,
                           **self._cfg())

    def swrr(self, u_pad, f_pad, dst=None, bnd=None,
             out_rows: Optional[int] = None, op_pad=None, w4_pad=None):
        """Fused descent leg: pre-smooth + residual + W4 restriction
        -> (u1, f_c, rsq).  rsq is the free PRE-sweep residual norm^2."""
        if dst is None:
            dst = self.zeros()
        cfg = self._cfg()
        return _run_gswrr(u_pad, f_pad,
                          self.op_pad if op_pad is None else op_pad,
                          self.w4_pad if w4_pad is None else w4_pad,
                          dst, bnd,
                          a0=self.a0, da=self.da, mass=self.mass,
                          Rc=self.Rc, bim=self.bim, vmem_mb=self.vmem_mb,
                          out_rows=out_rows, dform=self.dform, **cfg)

    def psweep(self, u_pad, f_pad, uc_pad, R_up: Optional[int] = None,
               dst=None, bnd=None, op_pad=None, w4_pad=None):
        """Fused ascent leg: W4 prolongation-add + post-smooth -> u_new."""
        if dst is None:
            dst = self.zeros()
        return _run_gpsweep(u_pad, f_pad,
                            self.op_pad if op_pad is None else op_pad,
                            self.w4_pad if w4_pad is None else w4_pad,
                            uc_pad, dst, bnd,
                            a0=self.a0, da=self.da, mass=self.mass,
                            R_up=int(R_up if R_up is not None else self.Rc),
                            bim=self.bim, vmem_mb=self.vmem_mb,
                            dform=self.dform, **self._cfg())

    def zwrr(self, f_pad, bnd=None, out_rows: Optional[int] = None,
             op_pad=None, w4_pad=None):
        """Zero-initial-guess descent leg (general operator only)."""
        assert not self.bim
        return _run_zgwrr(f_pad,
                          self.op_pad if op_pad is None else op_pad,
                          self.w4_pad if w4_pad is None else w4_pad,
                          bnd, Rc=self.Rc,
                          vmem_mb=self.vmem_mb, out_rows=out_rows,
                          **self._cfg())

    def zpsweep(self, f_pad, uc_pad, R_up: Optional[int] = None, dst=None,
                bnd=None, op_pad=None, w4_pad=None):
        """Zero-initial-guess ascent leg (general operator only)."""
        assert not self.bim
        if dst is None:
            dst = self.zeros()
        return _run_zgpsweep(f_pad,
                             self.op_pad if op_pad is None else op_pad,
                             self.w4_pad if w4_pad is None else w4_pad,
                             uc_pad, dst, bnd,
                             R_up=int(R_up if R_up is not None else self.Rc),
                             vmem_mb=self.vmem_mb, **self._cfg())
