"""Round-2 Pallas TPU kernels: lagged-pipeline element-factored stencil sweeps
with fused multigrid transfer legs.

This module supersedes the round-1 manual-DMA kernels (ops/pallas_stencil.py,
kept for the temporally-fused k-sweep path) following the memory-path
investigation in docs/kernel_notes_r2.md:

1. **Pure pipeline, no manual DMA.** Every input rides the automatic Pallas
   pipeline (BlockSpec with *static* index maps — traced maps disable
   multi-buffering).  The +-1 row halo that BlockSpecs cannot express comes
   from a persistent VMEM cache of the previous block (*lagged pipeline*):
   the u input runs one block ahead of the output, and a (R+2)-row scratch
   carries the previous block plus one row.  Measured: the pipeline path
   reaches ~935 GB/s where manual double-buffered DMA caps at ~490.

2. **Donated destination.** Each sweep takes a same-shape ``dst`` buffer
   donated via ``input_output_aliases``.  Without it, XLA inserts a
   full-buffer copy per loop iteration to pin the kernel output into the
   `while`/`scan` carry slot (measured ~2x sweep cost in-loop).  Solve
   loops ping-pong two buffers so every buffer returns to its carry slot.

3. **Element-factored operator.**  For the bi-material Q1 FEM stencil
   (reference math: FEANet/mesh.py:103-117, FEANet/model.py:22-30),

       A u(p) = sum_e Q_e * [ (5/6) u(p) - (1/6) u_opp,e - (1/6) s_e ],

   where e ranges over the 4 elements around node p, Q_e = a0 + da*phase(e),
   s_e is the sum of e's 4 corner nodes and u_opp,e the corner opposite p.
   This costs ~35 vector ops/tile vs ~82 for the 16-pattern bitplane form,
   and consumes the raw element *phase* bitmap (int8) instead of per-node
   pattern ids.  The Jacobi diagonal is d = (2/3) sum_e Q_e.

4. **Stride-lane coarse levels.**  Mosaic cannot lower lane-stride-2
   reshapes, so coarse grids are never lane-compacted: level l keeps the
   full lane width with data every ``2^l`` lanes.  Restriction emits its
   output *in place* at stride ``2s`` (full-weighting lane mixing is two
   ``pltpu.roll``s by s), prolongation reads stride-``2s`` data inside the
   fine level's kernel directly, and only the Pallas<->XLA boundary (below
   the coarse threshold) compacts lanes.  Rows stay compact at every level
   (sublane-stride reshapes do lower).

Fused V-cycle legs (cutting the round-1 ~6.6 ms/cycle at 4097^2, of which
~2/3 was pad/unpad + separate XLA transfer passes):

- ``sweep``: one weighted-Jacobi sweep; also emits the *pre-update* interior
  residual norm^2 for free (= the post-cycle residual of the previous cycle
  when called as the first smoothing step).
- ``restrict_residual``: residual + x4-scaled full-weighting restriction in
  one pass — emits the coarse-level RHS directly in the coarse level's
  stride-2s ghost-block layout (reference cycle math:
  MM_Model_convergence.ipynb cell 3 ``Restrict`` + h^2 scaling).
- ``psweep``: coarse-correction prolongation (bilinear, align-corners,
  interior-masked — the reference's ``Interpolate`` + BC reset) fused into
  the first post-smoothing sweep.

Boundary semantics: updates/corrections apply only at *globally interior*
nodes; boundary nodes keep their current value, so arbitrary Dirichlet data
is handled by initializing the boundary ring once (matches the reference's
per-sweep reset, FEANet/jacobi.py:27-47).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# In-kernel math helpers.
# ---------------------------------------------------------------------------


def _roll_p(x, s):
    """out[.., q] = x[.., q + s]."""
    return pltpu.roll(x, x.shape[-1] - s, 1)


def _roll_m(x, s):
    """out[.., q] = x[.., q - s]."""
    return pltpu.roll(x, s, 1)


def _apply_hom(u_win, L, a0, s, mass=None):
    """Homogeneous A u on node rows [1, L-1) of an (L, Wp) u window:
    A u = a0 * (3 u - (1/3) * 3x3-window sum), plus an optional
    pattern-independent per-element operator ``mass`` = (mp, ms, mo)
    contributing  sum_e [mp u_p + ms s_e + mo u_opp]  (the consistent-mass
    form: heat theta-systems pass mass = h^2/36 * (2, 2, -1))."""
    t3 = u_win + _roll_p(u_win, s) + _roll_m(u_win, s)
    s9 = t3[0 : L - 2, :] + t3[1 : L - 1, :] + t3[2:L, :]
    uc = u_win[1 : L - 1, :]
    au = (3.0 * a0) * uc - (a0 / 3.0) * s9
    if mass is not None:
        # per-node: alpha u + beta adj + gamma cor, with adj/cor expressed
        # through the already-computed row sums t3 (adj = t3_mid - u + up +
        # dn;  cor = (t3_up - up) + (t3_dn - dn)).
        mp, ms, mo = mass
        alpha, beta, gamma = 4.0 * (mp + ms), 2.0 * ms, ms + mo
        updn = u_win[0 : L - 2, :] + u_win[2:L, :]
        au = (au + (alpha - beta) * uc + beta * t3[1 : L - 1, :]
              + gamma * (t3[0 : L - 2, :] + t3[2:L, :])
              + (beta - gamma) * updn)
    return au, None


def _apply_bim(u_win, ph_win, L, a0, da, s, mass=None):
    """Bi-material element-factored A u on node rows [1, L-1) of an (L, Wp)
    u window.  ``ph_win``: (L-1, Wp) element phases; row k holds the element
    row between u rows k and k+1, each element stored at the lane of its
    *west-south* corner node.  Returns (A u, C4) with C4 the per-node sum of
    the 4 surrounding Q (the stiffness Jacobi diagonal is (2/3) C4; with
    ``mass`` the diagonal gains 4 (mp + ms) — see ``_diag_bim``).

    ``mass`` = (mp, ms, mo) adds the pattern-INDEPENDENT per-element
    operator  sum_e [mp u_p + ms s_e + mo u_opp]  — with the stiffness part
    scaled by theta*dt (fold into a0/da) this is exactly the heat
    theta-system  M + theta dt K  (ops/heat.py)."""
    Q = ph_win.astype(jnp.float32) * da + a0  # (L-1, Wp)
    ul = _roll_p(u_win, s)  # u[.., q+s]
    t = u_win + ul
    s_e = t[0 : L - 1, :] + t[1:L, :]  # per-element 4-corner sum
    P = Q * s_e
    Pc = P + _roll_m(P, s)
    sigP = Pc[0 : L - 2, :] + Pc[1 : L - 1, :]  # sum_e Q_e s_e at nodes
    Qc = Q + _roll_m(Q, s)
    C4 = Qc[0 : L - 2, :] + Qc[1 : L - 1, :]
    # opposite-corner terms: node p's SW element contributes u(p-1, q-s), SE
    # u(p-1, q+s), NW u(p+1, q-s), NE u(p+1, q+s), each weighted by its Q.
    D = Q * u_win[0 : L - 1, :]
    E2 = Q * ul[0 : L - 1, :]
    E3 = Q * u_win[1:L, :]
    E4 = Q * ul[1:L, :]
    Dr = _roll_m(D, s)
    E3r = _roll_m(E3, s)
    sigD = (Dr[0 : L - 2, :] + E2[0 : L - 2, :]) + (E3r[1 : L - 1, :] + E4[1 : L - 1, :])
    uc = u_win[1 : L - 1, :]
    au = (5.0 / 6.0) * (uc * C4) - (1.0 / 6.0) * (sigD + sigP)
    if mass is not None:
        mp, ms, mo = mass
        Sc = s_e + _roll_m(s_e, s)
        Ssum = Sc[0 : L - 2, :] + Sc[1 : L - 1, :]  # sum_e s_e at nodes
        c2 = _roll_m(u_win, s) + ul  # u(., q-s) + u(., q+s)
        cor = c2[0 : L - 2, :] + c2[2:L, :]  # the 4 diagonal corners
        au = au + (4.0 * mp) * uc + ms * Ssum + mo * cor
    return au, C4


def _apply_hom_d(u_win, L, a0, s):
    """DIFFERENCE-FORM homogeneous A u: au = -(a0/3) sum_nb (u_nb - u_p),
    assembled from adjacent-value differences (Sterbenz-near-exact for
    smooth fields).  Mathematically identical to _apply_hom (the stencil's
    row sums are zero), but the f32 rounding scales with the LOCAL
    VARIATION of u instead of its magnitude — at 4097^2 the coarse-grid
    correction amplifies rounding by ~kappa(A) ~ 1e6, and _apply_hom's
    magnitude-scaled, systematically-biased rounding destabilizes the
    V-cycle outright on hard problems (measured: the bi-material
    interface at 4097^2 diverges at q = 1.26 with the plain form and
    converges with this one).  Pure-stiffness operators only (zero row
    sums — incompatible with ``mass``)."""
    Dh = _roll_p(u_win, s) - u_win          # u(., q+s) - u(., q)
    Dhm = _roll_m(Dh, s)                    # u(., q) - u(., q-s)
    Dv = u_win[1:L, :] - u_win[0 : L - 1, :]  # u(k+1, .) - u(k, .)
    Dvp = _roll_p(Dv, s)
    Dvm = _roll_m(Dv, s)
    r = slice(1, L - 1)
    rm = slice(0, L - 2)
    d_E, d_W = Dh[r], -Dhm[r]
    d_N, d_S = Dv[r], -Dv[rm]
    d_NE = Dvp[r] + Dh[r]
    d_NW = Dvm[r] - Dhm[r]
    d_SE = Dh[r] - Dvp[rm]
    d_SW = -Dvm[rm] - Dhm[r]
    acc = (d_E + d_W) + (d_N + d_S) + ((d_NE + d_NW) + (d_SE + d_SW))
    return (-a0 / 3.0) * acc, None


def _apply_bim_d(u_win, ph_win, L, a0, da, s):
    """DIFFERENCE-FORM bi-material element-factored A u (see _apply_hom_d
    for the rationale).  Per element e containing node p with in-element
    edge neighbours a, b and diagonal opp:

        A u(p) = -(1/6) sum_e Q_e [ (u_a - u_p) + (u_b - u_p)
                                    + 2 (u_opp - u_p) ]

    — exactly _apply_bim's operator regrouped so every term is a
    difference of adjacent nodes.  Returns (A u, C4)."""
    Q = ph_win.astype(jnp.float32) * da + a0  # (L-1, Wp) element rows
    Qm = _roll_m(Q, s)
    Dh = _roll_p(u_win, s) - u_win
    Dhm = _roll_m(Dh, s)
    Dv = u_win[1:L, :] - u_win[0 : L - 1, :]
    Dvp = _roll_p(Dv, s)
    Dvm = _roll_m(Dv, s)
    r = slice(1, L - 1)
    rm = slice(0, L - 2)
    d_E, d_W = Dh[r], -Dhm[r]
    d_N, d_S = Dv[r], -Dv[rm]
    d_NE = Dvp[r] + Dh[r]
    d_NW = Dvm[r] - Dhm[r]
    d_SE = Dh[r] - Dvp[rm]
    d_SW = -Dvm[rm] - Dhm[r]
    # element quadrants of node (r, q): NE = Q[r, q], NW = Q[r, q-s],
    # SE = Q[r-1, q], SW = Q[r-1, q-s]
    Qne, Qnw = Q[r], Qm[r]
    Qse, Qsw = Q[rm], Qm[rm]
    acc = ((Qne + Qse) * d_E + (Qnw + Qsw) * d_W
           + (Qne + Qnw) * d_N + (Qse + Qsw) * d_S
           + 2.0 * (Qne * d_NE + Qnw * d_NW + Qse * d_SE + Qsw * d_SW))
    C4 = (Qne + Qnw) + (Qse + Qsw)
    return (-1.0 / 6.0) * acc, C4


def _apply_op(u_win, ph_win, L, a0, da, s, mass, bim, dform):
    """Dispatch to the plain or difference-form apply.  ``dform`` requires
    ``mass is None`` (nonzero row sums break the constant-annihilation
    the difference form relies on)."""
    if bim:
        if dform:
            return _apply_bim_d(u_win, ph_win, L, a0, da, s)
        return _apply_bim(u_win, ph_win, L, a0, da, s, mass=mass)
    if dform:
        return _apply_hom_d(u_win, L, a0, s)
    return _apply_hom(u_win, L, a0, s, mass=mass)


def _diag_bim(C4, mass):
    """Jacobi diagonal for the bi-material (+ optional mass) operator."""
    d = (2.0 / 3.0) * C4
    return d if mass is None else d + 4.0 * (mass[0] + mass[1])


def _diag_hom(a0, mass):
    """Jacobi diagonal for the homogeneous (+ optional mass) operator."""
    d = (8.0 / 3.0) * a0
    if mass is not None:
        d += 4.0 * (mass[0] + mass[1])
    return jnp.asarray(d, jnp.float32)


def _interior_mask(row0, L, Wp, lo, hi, W, s):
    """Mask of updatable nodes over L rows starting at LOCAL node row
    ``row0``: rows lo <= r <= hi (the intersection of the global interior
    with this shard, in local coordinates — single-device: lo=1, hi=H-2),
    lanes 1 <= j <= W-2 at lane j*s; off-grid lanes are masked out.

    ``lo``/``hi`` may be traced scalars (SMEM-passed shard bounds).
    Decomposed into a (L, 1) row mask x (1, Wp) lane mask so Mosaic never
    materializes (L, Wp) int32 iotas (VMEM stack pressure at large blocks)."""
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    rm = (gr >= lo) & (gr <= hi)
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    lm = (gc >= s) & (gc <= (W - 2) * s)
    if s > 1:
        lm &= (gc & (s - 1)) == 0
    return rm & lm


def _owned_rows_mask(row0, L, own_lo, own_hi):
    """Static mask of the rows whose residual THIS shard's rsq owns, so the
    shard partial sums tile the global grid exactly once under psum.  The
    restriction kernels own [-1, Hloc-2] (their step coverage overlaps one
    row; shard i's row -1 is shard i-1's row Hloc-1); the sweep kernels own
    [0, Hloc-1] (their coverage [0, HpLoc) can spill past the data into the
    in-buffer south halo row)."""
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    return (gr >= own_lo) & (gr <= own_hi)


# ---------------------------------------------------------------------------
# Kernel 1: fused Jacobi sweep / residual, optional fused prolongation-add.
# ---------------------------------------------------------------------------


def _sweep_kernel(u_ref, f_ref, ph_ref, uc_ref, dst_ref, uh_ref, uch_ref,
                  bnd_ref, u_out, rsq_ref, cache, phc, ucc, *, R, H, W, Wp,
                  a0, da, mass, omega, s, nb, own_hi, bim, mode, with_corr,
                  dform=False):
    """Grid step i emits node rows [(i-1)R, iR).

    Pipeline blocks (ghost-block layouts, data row g at buffer row g + R_lv):
      u_ref:  block i+1 -> node rows [iR, (i+1)R)         (lagged by one)
      f_ref:  block i   -> node rows [(i-1)R, iR)
      ph_ref: block i   -> element rows [(i-1)R, iR)
      uc_ref: (psweep) R/2-row coarse block -> coarse rows [iR/2, (i+1)R/2)
    Cache invariants at the start of step i:
      cache[0 : R+1]  = u node rows [(i-1)R - 1, iR)
      phc[0]          = element row (i-1)R - 1
      ucc[0 : R/2+1]  = coarse rows [(i-1)R/2 - 1, iR/2)

    Shard support: ``uh_ref``/``uch_ref`` are (8, Wp) halo strips — row 7
    holds node (coarse) row -1 and row 0 holds node row nb*R (coarse row
    nb*R/2) of a neighbouring shard; all-zero for a single device (then the
    kernel behaves exactly as before).  ``bnd_ref`` (SMEM int32[4]) carries
    the updatable row range [lo, hi] in local coordinates (single device:
    [1, H-2, ...]).
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1  # local node row of window row 0
    lo, hi = bnd_ref[0], bnd_ref[1]

    # All compute is f32; u/f/uc streams may be bf16 (halved HBM traffic —
    # the scratch caches and halo strips stay f32, so loads cast up and the
    # single store casts down).
    cache[R + 1 : R + 2, :] = jnp.where(
        i == nb, uh_ref[0:1, :], u_ref[0:1, :].astype(jnp.float32))
    u_win = cache[...]  # (R+2, Wp) = node rows [row0, row0 + R + 2)

    if with_corr:
        ucc[R // 2 + 1 : R // 2 + 2, :] = jnp.where(
            i == nb, uch_ref[0:1, :], uc_ref[0:1, :].astype(jnp.float32))
        cw = ucc[...]  # (R/2+2, Wp) = coarse rows [(i-1)R/2 - 1, iR/2]
        # rows: window row m = fine row row0 + m; row0 is odd, so even m are
        # fine-odd rows (midpoints) and odd m are injections.
        mids = 0.5 * (cw[0 : R // 2 + 1, :] + cw[1 : R // 2 + 2, :])
        inj = cw[1 : R // 2 + 2, :]
        corr_r = jnp.stack([mids, inj], axis=1).reshape(R + 2, Wp)
        # lanes: coarse data every 2s lanes; fine lanes at odd multiples of
        # s take the lane midpoint, coarse lanes inject in place.
        lane_mid = 0.5 * (_roll_m(corr_r, s) + _roll_p(corr_r, s))
        gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
        corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
        corr = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), corr, 0.0)
        u_win = u_win + corr

    if bim:
        ph_win = jnp.concatenate([phc[...], ph_ref[...]], axis=0)  # (R+1, Wp)
        au, C4 = _apply_op(u_win, ph_win, R + 2, a0, da, s, mass, bim, dform)
        d = _diag_bim(C4, mass)
    else:
        au, _ = _apply_op(u_win, None, R + 2, a0, da, s, mass, bim, dform)
        d = _diag_hom(a0, mass)

    r = f_ref[...].astype(jnp.float32) - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    if mode == "sweep":
        u_out[...] = (u_win[1 : R + 1, :] + (omega / d) * r).astype(
            u_out.dtype)
    else:  # residual
        u_out[...] = r.astype(u_out.dtype)

    @pl.when(i > 0)
    def _():
        rq = jnp.where(_owned_rows_mask(row0 + 1, R, 0, own_hi), r, 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # roll caches forward
    cache[0:1, :] = jnp.where(i == 0, uh_ref[7:8, :], cache[R : R + 1, :])
    cache[1 : R + 1, :] = u_ref[...].astype(jnp.float32)
    if bim:
        phc[0:1, :] = ph_ref[R - 1 : R, :]
    if with_corr:
        ucc[0:1, :] = jnp.where(i == 0, uch_ref[7:8, :],
                                ucc[R // 2 : R // 2 + 1, :])
        ucc[1 : R // 2 + 1, :] = uc_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 1b: fully-fused V-cycle descent leg — pre-smooth sweep + residual +
# x4 full-weighting restriction in ONE HBM pass (15 B/node vs 24 for the
# separate sweep + restrict_residual pair).
# ---------------------------------------------------------------------------


def _swrr_kernel(u_ref, f_ref, ph_ref, dst_ref, uh_ref, fh_ref, phh_ref,
                 bnd_ref, u1_out, fc_out, rsq_ref, uwin, fwin, phw, u1c, *,
                 R, H, W, Wp, a0, da, mass, omega, s, nb, own_hi, bim,
                 dform=False):
    """Grid step i emits u1 node rows [(i-1)R, iR) AND coarse rows
    [(i-1)R/2, iR/2) of f_c = 4*FW(f - A u1), where u1 = jacobi_sweep(u0).

    All inputs lag by ONE block (u/f/ph block i+1 -> rows [iR, (i+1)R)).
    Cache invariants at the start of step i:
      uwin[0 : R+2]  = u0 node rows [(i-1)R - 2, iR)
      fwin[0 : R+1]  = f  node rows [(i-1)R - 1, iR)
      phw[0 : R+2]   = element rows  [(i-1)R - 2, iR)
      u1c[0]         = u1 node row (i-1)R - 2
    The step computes u1 on rows [(i-1)R - 1, iR] (two rows of overlap
    recomputed by the next step), so the residual of u1 is available on
    rows [(i-1)R - 1, iR - 1] — exactly the FW window of this step's
    coarse rows.  ``rsq`` accumulates the PRE-sweep residual norm^2 (the
    free convergence test), disjoint rows [(i-1)R - 1, iR - 1) per step,
    clamped to this shard's owned range [-1, nb R - 2].

    Shard halos (all-zero on a single device): ``uh_ref`` rows 5..7 = u
    node rows -3..-1, rows 0..1 = u rows nbR, nbR+1; ``fh_ref`` rows 6..7 =
    f rows -2..-1, row 0 = f row nbR; ``phh_ref`` rows 5..7 = element rows
    -3..-1, row 0 = element row nbR.  ``bnd_ref`` (SMEM int32[4]):
    [row_lo, row_hi, crow_lo, crow_hi] in local coordinates.
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 2  # local node row of uwin row 0
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    uwin[R + 2 : R + 4, :] = jnp.where(
        i == nb, uh_ref[0:2, :], u_ref[0:2, :].astype(jnp.float32))
    fwin[R + 1 : R + 2, :] = jnp.where(
        i == nb, fh_ref[0:1, :], f_ref[0:1, :].astype(jnp.float32))
    if bim:
        phw[R + 2 : R + 3, :] = jnp.where(i == nb, phh_ref[0:1, :],
                                          ph_ref[0:1, :])

    uw = uwin[...]  # (R+4, Wp): u0 rows [row0, row0 + R + 4)
    if bim:
        phin = phw[...]  # (R+3, Wp): element rows [row0, row0 + R + 3)
        au0, C4 = _apply_op(uw, phin, R + 4, a0, da, s, mass, bim, dform)
        d = _diag_bim(C4, mass)
    else:
        phin = None
        au0, _ = _apply_op(uw, None, R + 4, a0, da, s, mass, bim, dform)
        d = _diag_hom(a0, mass)
    # au0 rows [(i-1)R - 1, iR + 1] -> R+2 rows, aligned with fwin
    f0 = fwin[...]
    r0 = f0 - au0
    r0 = jnp.where(_interior_mask(row0 + 1, R + 2, Wp, lo, hi, W, s), r0, 0.0)
    u1full = uw[1 : R + 3, :] + (omega / d) * r0  # u1 rows [(i-1)R-1, iR]
    u1_out[...] = u1full[1 : R + 1, :].astype(u1_out.dtype)

    @pl.when(i > 0)
    def _():
        rq = jnp.where(_owned_rows_mask(row0 + 1, R, -1, own_hi), r0[0:R, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # residual of u1 on rows [(i-1)R - 1, iR - 1]
    u1buf = jnp.concatenate([u1c[...], u1full], axis=0)  # rows [(i-1)R-2, iR]
    au1, _ = _apply_op(u1buf, phin[0 : R + 2, :] if bim else None, R + 3,
                       a0, da, s, mass, bim, dform)
    r1 = f0[0 : R + 1, :] - au1
    r1 = jnp.where(_interior_mask(row0 + 1, R + 1, Wp, lo, hi, W, s), r1, 0.0)
    # full weighting + x4 scaling (identical to _rr_kernel)
    A = r1[0:R, :].reshape(R // 2, 2, Wp)
    B = jnp.concatenate([A[1:, 0, :], r1[R : R + 1, :]], axis=0)
    rows_fw = A[:, 0, :] + 2.0 * A[:, 1, :] + B
    lanes_fw = 2.0 * rows_fw + _roll_m(rows_fw, s) + _roll_p(rows_fw, s)
    fc = lanes_fw * (4.0 / 16.0)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    # seed for the NEXT shard-local step 1: u1 at node row -2, swept from
    # the halo rows (single device: halos are zero and the row is masked,
    # reproducing the old garbage-but-masked behaviour exactly because the
    # row itself is then u0(-2) = 0).
    if bim:
        auh, C4h = _apply_op(uh_ref[5:8, :], phh_ref[5:7, :], 3, a0, da, s,
                             mass, True, dform)
        dh = _diag_bim(C4h, mass)
    else:
        auh, _ = _apply_op(uh_ref[5:8, :], None, 3, a0, da, s, mass, False,
                           dform)
        dh = _diag_hom(a0, mass)
    rh = fh_ref[6:7, :] - auh
    rh = jnp.where(_interior_mask(-2, 1, Wp, lo, hi, W, s), rh, 0.0)
    u1m2 = uh_ref[6:7, :] + (omega / dh) * rh

    # roll caches forward
    u1c[0:1, :] = jnp.where(i == 0, u1m2, u1full[R - 1 : R, :])
    uwin[0:2, :] = jnp.where(i == 0, uh_ref[6:8, :], uwin[R : R + 2, :])
    uwin[2:4, :] = uwin[R + 2 : R + 4, :]
    uwin[4 : R + 2, :] = u_ref[2:R, :].astype(jnp.float32)
    fwin[0:1, :] = jnp.where(i == 0, fh_ref[7:8, :], fwin[R : R + 1, :])
    fwin[1:2, :] = fwin[R + 1 : R + 2, :]
    fwin[2 : R + 1, :] = f_ref[1:R, :].astype(jnp.float32)
    if bim:
        phw[0:2, :] = jnp.where(i == 0, phh_ref[6:8, :], phw[R : R + 2, :])
        phw[2:3, :] = phw[R + 2 : R + 3, :]
        phw[3 : R + 2, :] = ph_ref[1:R, :]


# ---------------------------------------------------------------------------
# Kernel 1b2: CROSS-CYCLE fused fine-level leg ("pswrr") — for a V(1,1)
# solve loop, the prolongation-add + post-smoothing sweep that END cycle k
# and the pre-smoothing sweep + residual + restriction that START cycle k+1
# all touch the same fields; fusing them runs the fine level at
# 17 B/node/cycle instead of 29 (swrr + psweep) with the same 3 stencil
# applies.  The free residual ||f - A u3||^2 (u3 = the completed cycle-k
# iterate) is the solve loop's convergence test.
# ---------------------------------------------------------------------------


def _pswrr_kernel(u_ref, f_ref, ph_ref, uc_ref, dst_ref, uh_ref, fh_ref,
                  phh_ref, uch_ref, bnd_ref, u4_out, fc_out, rsq_ref,
                  uwin, fwin, phw, ucc, *, R, H, W, Wp, a0, da, mass, omega,
                  s, nb, own_hi, bim, dform=False):
    """Grid step i emits u4 node rows [(i-1)R, iR) and coarse rows
    [(i-1)R/2, iR/2) of f_c = 4 FW(f - A u4), where

        u2 = u1 + P(uc),   u3 = jacobi(u2),   u4 = jacobi(u3).

    u1/f/ph lag by ONE block; uc as in the psweep path.  Cache invariants
    at the start of step i:
      uwin[0 : R+4] = u1 rows [(i-1)R - 4, iR)
      fwin[0 : R+3] = f  rows [(i-1)R - 3, iR)
      phw[0 : R+4]  = element rows [(i-1)R - 4, iR)
      ucc[0 : R/2+2] = coarse rows [(i-1)R/2 - 2, iR/2)
    ``rsq`` accumulates ||f - A u3||^2 (free from u4's sweep) over the
    owned rows [-1, own_hi], tiling the grid exactly once across shards.
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 4  # u2-window row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    uwin[R + 4 : R + 6, :] = jnp.where(
        i == nb, uh_ref[0:2, :], u_ref[0:2, :].astype(jnp.float32))
    fwin[R + 3 : R + 5, :] = jnp.where(
        i == nb, fh_ref[0:2, :], f_ref[0:2, :].astype(jnp.float32))
    if bim:
        phw[R + 4 : R + 6, :] = jnp.where(i == nb, phh_ref[0:2, :],
                                          ph_ref[0:2, :])
    ucc[R // 2 + 2 : R // 2 + 4, :] = jnp.where(
        i == nb, uch_ref[0:2, :], uc_ref[0:2, :].astype(jnp.float32))

    # ---- u2 = u1 + P(uc) on R+7 rows [row0, row0 + R + 7) ----
    # row0 is EVEN: window row m even -> coarse injection, odd -> midpoint.
    cw = ucc[...]  # (R/2+4, Wp): coarse rows [row0/2, row0/2 + R/2 + 4)
    K = R // 2 + 4
    mids = 0.5 * (cw[0 : K - 1, :] + cw[1:K, :])
    mids = jnp.concatenate([mids, jnp.zeros((1, Wp), jnp.float32)], axis=0)
    corr_r = jnp.stack([cw, mids], axis=1).reshape(2 * K, Wp)[0 : R + 7, :]
    lane_mid = 0.5 * (_roll_m(corr_r, s) + _roll_p(corr_r, s))
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
    corr = jnp.where(_interior_mask(row0, R + 7, Wp, lo, hi, W, s), corr, 0.0)
    u1w = jnp.concatenate(
        [uwin[...], u_ref[2:3, :].astype(jnp.float32)], axis=0)  # (R+7, Wp)
    u2 = u1w + corr

    # ---- u3 = jacobi(u2) on R+5 rows [row0+1, row0+R+6) ----
    f0 = fwin[...]  # (R+5, Wp): f rows [row0 + 1, row0 + R + 6)
    if bim:
        phin = phw[...]  # (R+6, Wp): element rows [row0, row0 + R + 6)
        au2, C42 = _apply_op(u2, phin, R + 7, a0, da, s, mass, bim, dform)
        d2 = _diag_bim(C42, mass)
    else:
        phin = None
        au2, _ = _apply_op(u2, None, R + 7, a0, da, s, mass, bim, dform)
        d2 = _diag_hom(a0, mass)
    r2 = f0 - au2
    r2 = jnp.where(_interior_mask(row0 + 1, R + 5, Wp, lo, hi, W, s), r2, 0.0)
    u3 = u2[1 : R + 6, :] + (omega / d2) * r2  # rows [row0+1, row0+R+6)

    # ---- u4 = jacobi(u3) on R+3 rows [row0+2, row0+R+5) ----
    if bim:
        au3, C43 = _apply_op(u3, phin[1 : R + 5, :], R + 5, a0, da, s, mass,
                             bim, dform)
        d3 = _diag_bim(C43, mass)
    else:
        au3, _ = _apply_op(u3, None, R + 5, a0, da, s, mass, bim, dform)
        d3 = _diag_hom(a0, mass)
    r3 = f0[1 : R + 4, :] - au3
    r3 = jnp.where(_interior_mask(row0 + 2, R + 3, Wp, lo, hi, W, s), r3, 0.0)
    u4 = u3[1 : R + 4, :] + (omega / d3) * r3  # rows [row0+2, row0+R+5)
    u4_out[...] = u4[2 : R + 2, :].astype(u4_out.dtype)

    @pl.when(i > 0)
    def _():
        # disjoint per-step span rows [(i-1)R - 1, iR - 1) of r3 = f - A u3
        rq = jnp.where(_owned_rows_mask(row0 + 3, R, -1, own_hi),
                       r3[1 : R + 1, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # ---- residual of u4 on R+1 rows [(i-1)R - 1, iR - 1] + FW ----
    au4, _ = _apply_op(u4, phin[2 : R + 4, :] if bim else None, R + 3,
                       a0, da, s, mass, bim, dform)
    r4 = f0[2 : R + 3, :] - au4
    r4 = jnp.where(_interior_mask(row0 + 3, R + 1, Wp, lo, hi, W, s), r4, 0.0)
    A = r4[0:R, :].reshape(R // 2, 2, Wp)
    B = jnp.concatenate([A[1:, 0, :], r4[R : R + 1, :]], axis=0)
    rows_fw = A[:, 0, :] + 2.0 * A[:, 1, :] + B
    lanes_fw = 2.0 * rows_fw + _roll_m(rows_fw, s) + _roll_p(rows_fw, s)
    fc = lanes_fw * (4.0 / 16.0)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    # ---- roll caches forward ----
    uwin[0:4, :] = jnp.where(i == 0, uh_ref[4:8, :], uwin[R : R + 4, :])
    uwin[4:6, :] = uwin[R + 4 : R + 6, :]
    uwin[6 : R + 4, :] = u_ref[2:R, :].astype(jnp.float32)
    fwin[0:3, :] = jnp.where(i == 0, fh_ref[5:8, :], fwin[R : R + 3, :])
    fwin[3:5, :] = fwin[R + 3 : R + 5, :]
    fwin[5 : R + 3, :] = f_ref[2:R, :].astype(jnp.float32)
    if bim:
        phw[0:4, :] = jnp.where(i == 0, phh_ref[4:8, :], phw[R : R + 4, :])
        phw[4:6, :] = phw[R + 4 : R + 6, :]
        phw[6 : R + 4, :] = ph_ref[2:R, :]
    ucc[0:2, :] = jnp.where(i == 0, uch_ref[6:8, :],
                            ucc[R // 2 : R // 2 + 2, :])
    ucc[2 : R // 2 + 2, :] = uc_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernels 1c/1d: ZERO-INITIAL-GUESS level legs.  Every coarse level of a
# V-cycle solves an error equation from u = 0, so its first sweep is the
# POINTWISE update u1 = (omega/d) f (no stencil apply, no u stream):
#   - _zrr_kernel  ("zsweep_restrict"): emits f_c = 4 FW(f - A u1) directly —
#     u1 never touches HBM.  Traffic ~7 B/node vs 15 for sweep_restrict;
#     one apply instead of two.
#   - _zpsweep_kernel ("zpsweep"): recomputes u1 pointwise, adds the coarse
#     correction, and runs the post-smoothing sweep — 11 B/node vs 14, and
#     the level's pre-smoothed iterate is never stored.
# Together a V(1,1) coarse level costs 2 applies / 18 B per node instead of
# 3 applies / 29 B.
# ---------------------------------------------------------------------------


def _c4_from_q(Q, K, s):
    """Per-node sum of the 4 surrounding Q over an element window of K rows:
    returns (K-1, Wp) C4 for node rows [e0+1, e0+K)."""
    Qc = Q + _roll_m(Q, s)
    return Qc[0 : K - 1, :] + Qc[1:K, :]


def _zrr_kernel(f_ref, ph_ref, fh_ref, phh_ref, bnd_ref, fc_out,
                fwin, phw, *, R, H, W, Wp, a0, da, mass, omega, s, nb, bim):
    """Grid step i emits coarse rows [(i-1)R/2, iR/2) of
    f_c = 4 FW(f - A u1) with u1 = (omega/d) f at interior nodes, 0 else.

    f/ph lag by ONE block.  Cache invariants at the start of step i:
      fwin[0 : R+2] = f rows [(i-1)R - 2, iR);  phw[0 : R+3] = element rows
      [(i-1)R - 3, iR).  Halo strips as in _swrr_kernel."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 2  # f-window row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    fwin[R + 2 : R + 3, :] = jnp.where(
        i == nb, fh_ref[0:1, :], f_ref[0:1, :].astype(jnp.float32))
    if bim:
        phw[R + 3 : R + 4, :] = jnp.where(i == nb, phh_ref[0:1, :],
                                          ph_ref[0:1, :])

    f0 = fwin[...]  # (R+3, Wp): f rows [row0, row0 + R + 3)
    if bim:
        phin = phw[...]  # (R+4, Wp): element rows [row0 - 1, row0 + R + 3)
        Q = phin.astype(jnp.float32) * da + a0
        d = _diag_bim(_c4_from_q(Q, R + 4, s), mass)  # node rows = f0's rows
    else:
        d = _diag_hom(a0, mass)
    u1 = (omega / d) * f0
    u1 = jnp.where(_interior_mask(row0, R + 3, Wp, lo, hi, W, s), u1, 0.0)

    if bim:
        au1, _ = _apply_bim(u1, phin[1 : R + 3, :], R + 3, a0, da, s, mass=mass)
    else:
        au1, _ = _apply_hom(u1, R + 3, a0, s, mass=mass)
    # au1 rows [(i-1)R - 1, iR - 1] (R+1 rows)
    r1 = f0[1 : R + 2, :] - au1
    r1 = jnp.where(_interior_mask(row0 + 1, R + 1, Wp, lo, hi, W, s), r1, 0.0)
    A = r1[0:R, :].reshape(R // 2, 2, Wp)
    B = jnp.concatenate([A[1:, 0, :], r1[R : R + 1, :]], axis=0)
    rows_fw = A[:, 0, :] + 2.0 * A[:, 1, :] + B
    lanes_fw = 2.0 * rows_fw + _roll_m(rows_fw, s) + _roll_p(rows_fw, s)
    fc = lanes_fw * (4.0 / 16.0)
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    # roll caches forward
    fwin[0:2, :] = jnp.where(i == 0, fh_ref[6:8, :], fwin[R : R + 2, :])
    fwin[2:3, :] = fwin[R + 2 : R + 3, :]
    fwin[3 : R + 2, :] = f_ref[1:R, :].astype(jnp.float32)
    if bim:
        phw[0:3, :] = jnp.where(i == 0, phh_ref[5:8, :], phw[R : R + 3, :])
        phw[3:4, :] = phw[R + 3 : R + 4, :]
        phw[4 : R + 3, :] = ph_ref[1:R, :]


def _zpsweep_kernel(f_ref, ph_ref, uc_ref, dst_ref, fh_ref, phh_ref, uch_ref,
                    bnd_ref, u_out, fwin, phw, ucc, *, R, H, W, Wp, a0, da,
                    mass, omega, s, nb, R_up, bim):
    """Grid step i emits u3 rows [(i-1)R, iR) where
    u3 = jacobi_sweep(u2),  u2 = (omega/d) f (interior) + P(uc).

    f/ph lag by ONE block; uc as in the psweep path of _sweep_kernel.
    Cache invariants at step i:  fwin[0 : R+1] = f rows [(i-1)R - 1, iR);
    phw[0 : R+2] = element rows [(i-1)R - 2, iR);
    ucc[0 : R/2+1] = coarse rows [(i-1)R/2 - 1, iR/2)."""
    i = pl.program_id(0)
    row0 = (i - 1) * R - 1  # u2-window row 0 (node row)
    lo, hi = bnd_ref[0], bnd_ref[1]

    fwin[R + 1 : R + 2, :] = jnp.where(
        i == nb, fh_ref[0:1, :], f_ref[0:1, :].astype(jnp.float32))
    if bim:
        phw[R + 2 : R + 3, :] = jnp.where(i == nb, phh_ref[0:1, :],
                                          ph_ref[0:1, :])
    ucc[R // 2 + 1 : R // 2 + 2, :] = jnp.where(
        i == nb, uch_ref[0:1, :], uc_ref[0:1, :].astype(jnp.float32))

    f0 = fwin[...]  # (R+2, Wp): f rows [row0, row0 + R + 2)
    if bim:
        phin = phw[...]  # (R+3, Wp): element rows [row0 - 1, row0 + R + 2)
        Q = phin.astype(jnp.float32) * da + a0
        d_all = _diag_bim(_c4_from_q(Q, R + 3, s), mass)  # rows = f0's rows
    else:
        d_all = _diag_hom(a0, mass)
    u1 = (omega / d_all) * f0
    u1 = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), u1, 0.0)

    # bilinear prolongation of the coarse correction (identical to the
    # with_corr path of _sweep_kernel: window row0 is odd)
    cw = ucc[...]
    mids = 0.5 * (cw[0 : R // 2 + 1, :] + cw[1 : R // 2 + 2, :])
    inj = cw[1 : R // 2 + 2, :]
    corr_r = jnp.stack([mids, inj], axis=1).reshape(R + 2, Wp)
    lane_mid = 0.5 * (_roll_m(corr_r, s) + _roll_p(corr_r, s))
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    corr = jnp.where((gc & (2 * s - 1)) == 0, corr_r, lane_mid)
    corr = jnp.where(_interior_mask(row0, R + 2, Wp, lo, hi, W, s), corr, 0.0)
    u2 = u1 + corr

    if bim:
        au, C4 = _apply_bim(u2, phin[1 : R + 2, :], R + 2, a0, da, s, mass=mass)
        d = _diag_bim(C4, mass)
    else:
        au, _ = _apply_hom(u2, R + 2, a0, s, mass=mass)
        d = _diag_hom(a0, mass)
    r = f0[1 : R + 1, :] - au
    r = jnp.where(_interior_mask(row0 + 1, R, Wp, lo, hi, W, s), r, 0.0)
    u_out[...] = (u2[1 : R + 1, :] + (omega / d) * r).astype(u_out.dtype)

    # roll caches forward
    fwin[0:1, :] = jnp.where(i == 0, fh_ref[7:8, :], fwin[R : R + 1, :])
    fwin[1:2, :] = fwin[R + 1 : R + 2, :]
    fwin[2 : R + 1, :] = f_ref[1:R, :].astype(jnp.float32)
    if bim:
        phw[0:2, :] = jnp.where(i == 0, phh_ref[6:8, :], phw[R : R + 2, :])
        phw[2:3, :] = phw[R + 2 : R + 3, :]
        phw[3 : R + 2, :] = ph_ref[1:R, :]
    ucc[0:1, :] = jnp.where(i == 0, uch_ref[7:8, :],
                            ucc[R // 2 : R // 2 + 1, :])
    ucc[1 : R // 2 + 1, :] = uc_ref[...].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 2: fused residual + x4-scaled full-weighting restriction.
# ---------------------------------------------------------------------------


def _rr_kernel(u_ref, f_ref, ph_ref, uh_ref, bnd_ref, fc_out, rsq_ref,
               cache, fch, phc, *, R, H, W, Wp, a0, da, mass, s, nb, own_hi,
               bim, dform=False):
    """Grid step i emits coarse node rows [(i-1)R/2, iR/2) of f_c = 4*FW(r).

    Needs residual rows [(i-1)R - 1, iR - 1] (R+1 rows), hence u rows
    [(i-1)R - 2, iR] and f rows [(i-1)R - 1, iR).
    Pipeline: u block i+1 (node rows [iR, (i+1)R)); f, ph block i.
    Cache invariants at the start of step i:
      cache[0 : R+2] = u node rows [(i-1)R - 2, iR)
      fch[0]         = f node row (i-1)R - 1
      phc[0 : 2]     = element rows [(i-1)R - 2, (i-1)R)

    Shard support: ``uh_ref`` rows 6..7 = u node rows -2..-1, row 0 = u row
    nbR (all-zero single-device); f/ph halo rows ride their streamed TOP
    ghost blocks (write f row -1 at buffer row R-1 and element rows -2..-1
    at buffer rows R-2..R-1).  ``bnd_ref`` (SMEM int32[4]):
    [row_lo, row_hi, crow_lo, crow_hi] in local coordinates.
    """
    i = pl.program_id(0)
    row0 = (i - 1) * R - 2  # local node row of u-window row 0
    lo, hi = bnd_ref[0], bnd_ref[1]
    clo, chi = bnd_ref[2], bnd_ref[3]

    cache[R + 2 : R + 3, :] = jnp.where(
        i == nb, uh_ref[0:1, :], u_ref[0:1, :].astype(jnp.float32))
    u_win = cache[...]  # (R+3, Wp)

    ph_win = (jnp.concatenate([phc[...], ph_ref[...]], axis=0)
              if bim else None)  # (R+2, Wp)
    au, _ = _apply_op(u_win, ph_win, R + 3, a0, da, s, mass, bim, dform)
    # au covers node rows [(i-1)R - 1, iR]  -> R+1 rows
    f_win = jnp.concatenate(
        [fch[...], f_ref[...].astype(jnp.float32)], axis=0)  # same rows
    r = f_win - au
    r = jnp.where(_interior_mask(row0 + 1, R + 1, Wp, lo, hi, W, s), r, 0.0)

    @pl.when(i > 0)
    def _():
        # rows [(i-1)R - 1, iR - 1): disjoint across steps; the owned-rows
        # clamp makes shard partial sums tile the global grid exactly once
        rq = jnp.where(_owned_rows_mask(row0 + 1, R, -1, own_hi), r[0:R, :], 0.0)
        rsq_ref[i - 1, 0] = jnp.sum(rq * rq)

    # row full-weighting: coarse row I <- fine rows 2I-1, 2I, 2I+1 with
    # weights (1, 2, 1).  Window row m = fine row (i-1)R - 1 + m, so local
    # coarse c in [0, R/2) uses window rows 2c, 2c+1, 2c+2.
    A = r[0:R, :].reshape(R // 2, 2, Wp)
    B = jnp.concatenate([A[1:, 0, :], r[R : R + 1, :]], axis=0)
    rows_fw = A[:, 0, :] + 2.0 * A[:, 1, :] + B  # (R/2, Wp)
    # lane full-weighting at stride s; output lands on the 2s lane grid
    lanes_fw = 2.0 * rows_fw + _roll_m(rows_fw, s) + _roll_p(rows_fw, s)
    fc = lanes_fw * (4.0 / 16.0)  # FW/16 then the reference's x4 h^2 scaling
    Wc = (W - 1) // 2 + 1
    crow0 = (i - 1) * (R // 2)
    fc_out[...] = jnp.where(
        _interior_mask(crow0, R // 2, Wp, clo, chi, Wc, 2 * s), fc,
        0.0).astype(fc_out.dtype)

    # roll caches forward
    cache[0:2, :] = jnp.where(i == 0, uh_ref[6:8, :], cache[R : R + 2, :])
    cache[2 : R + 2, :] = u_ref[...].astype(jnp.float32)
    fch[0:1, :] = f_ref[R - 1 : R, :].astype(jnp.float32)
    if bim:
        phc[0:2, :] = ph_ref[R - 2 : R, :]


# ---------------------------------------------------------------------------
# Module-level jitted entry points (static config via hashable kwargs).
# ---------------------------------------------------------------------------

_DUMMY_SPEC = pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _lagged_spec(R, Wp, off):
    return pl.BlockSpec((R, Wp), lambda i, o=off: (i + o, 0),
                        memory_space=pltpu.VMEM)


def _halo_spec(Wp):
    return pl.BlockSpec((8, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM)


_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _default_bounds(H, W):
    """Single-device updatable ranges: the global interior."""
    Hc = (H - 1) // 2 + 1
    return jnp.array([1, H - 2, 1, Hc - 2], jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "mode", "R_up", "interpret",
    "vmem_mb", "own_rows", "dform"))
def _run_sweep(u_pad, f_pad, ph_pad, uc_pad, dst, uh, uch, bnd, *, R, H, W,
               Wp, a0, da, omega, s, mode, R_up, interpret, vmem_mb=None,
               own_rows=None, mass=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    with_corr = uc_pad is not None
    # Halo strips are always f32 (8-row blocks are below the bf16 sublane
    # tile; the kernel's caches are f32 anyway)
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    uch = (jnp.zeros((8, Wp), jnp.float32) if uch is None
           else uch.astype(jnp.float32))
    if bnd is None:
        bnd = _default_bounds(H, W)
    kern = functools.partial(
        _sweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, mass=mass,
        omega=omega,
        s=s, nb=nb, own_hi=(own_rows if own_rows is not None else nb * R) - 1,
        bim=bim, mode=("sweep" if with_corr else mode),
        with_corr=with_corr, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 0)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 0))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    scratch = [
        pltpu.VMEM((R + 2, Wp), jnp.float32),
        pltpu.VMEM((1, Wp), jnp.int8),
    ]
    if with_corr:
        # coarse buffer: ghost R_up rows; need coarse rows [iR/2, (i+1)R/2)
        # = buffer rows [iR/2 + R_up, ...): block index i + 2 R_up / R.
        assert (2 * R_up) % R == 0
        in_specs.append(_lagged_spec(R // 2, Wp, 2 * R_up // R))
        args.append(uc_pad)
        scratch.append(pltpu.VMEM((R // 2 + 2, Wp), jnp.float32))
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.float32))
        scratch.append(pltpu.VMEM((8, 128), jnp.float32))
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 _halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC]
    args += [dst, uh, uch, bnd]
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
        scratch_shapes=scratch,
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes_accessed is BYTES per node: u in + f in + u out (3 fields at
        # the storage itemsize — 12 B f32 / 6 B bf16) plus the int8
        # element-phase stream (+1 B) when bi-material.
        cost_estimate=pl.CostEstimate(
            flops=(35 if bim else 12) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(3 * u_pad.dtype.itemsize + (1 if bim else 0))
            * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    return out, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "Rc", "out_rows",
    "own_rows", "interpret", "vmem_mb", "dform"))
def _run_swrr(u_pad, f_pad, ph_pad, dst, uh, fh, phh, bnd, *, R, H, W, Wp,
              a0, da, omega, s, Rc, interpret, vmem_mb=None, out_rows=None,
              own_rows=None, mass=None, dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(_swrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0,
                             da=da, mass=mass, omega=omega, s=s, nb=nb,
                             own_hi=(own_rows if own_rows is not None
                                     else nb * R) - 2, bim=bim, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [pl.BlockSpec(memory_space=pl.ANY), _halo_spec(Wp),
                 _halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC]
    args += [dst, uh, fh, phh, bnd]
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
            pltpu.VMEM((R + 4, Wp), jnp.float32),
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.int8),
            pltpu.VMEM((1, Wp), jnp.float32),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes_accessed is BYTES per fine node: u + f + u1 out (12 B) +
        # int8 phase (1 B) + coarse output at 1/2 row count (2 B).
        cost_estimate=pl.CostEstimate(
            flops=(76 if bim else 30) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(15 if bim else 14) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    # Same ghost-block invariant as _run_rr: fc blocks outside
    # [idx_off, nb + idx_off] are never written (block idx_off IS written —
    # with zeros, at i=0).  Consumers must jnp.where-mask.
    return u1, fc, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "Rc", "R_up", "out_rows",
    "own_rows", "interpret", "vmem_mb", "dform"))
def _run_pswrr(u_pad, f_pad, ph_pad, uc_pad, dst, uh, fh, phh, uch, bnd, *,
               R, H, W, Wp, a0, da, omega, s, Rc, R_up, interpret,
               vmem_mb=None, out_rows=None, own_rows=None, mass=None,
               dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    uch = (jnp.zeros((8, Wp), jnp.float32) if uch is None
           else uch.astype(jnp.float32))
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0 and (2 * R_up) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(
        _pswrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da, mass=mass,
        omega=omega, s=s,
        nb=nb, own_hi=(own_rows if own_rows is not None else nb * R) - 2,
        bim=bim, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 1)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_lagged_spec(R // 2, Wp, 2 * R_up // R),
                 pl.BlockSpec(memory_space=pl.ANY), _halo_spec(Wp),
                 _halo_spec(Wp), _halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC]
    args += [uc_pad, dst, uh, fh, phh, uch, bnd]
    u4, fc, rsq = pl.pallas_call(
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
            pltpu.VMEM((R + 6, Wp), jnp.float32),
            pltpu.VMEM((R + 5, Wp), jnp.float32),
            pltpu.VMEM((R + 6, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + 4, Wp), jnp.float32),
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes: u1 + f (8) + phase (1) + uc at 1/2 rows (2) + u4 out (4) +
        # coarse out at 1/2 rows (2)
        cost_estimate=pl.CostEstimate(
            flops=(120 if bim else 48) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(17 if bim else 16) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    return u4, fc, jnp.sum(rsq)


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "Rc", "out_rows",
    "interpret", "vmem_mb"))
def _run_zrr(f_pad, ph_pad, fh, phh, bnd, *, R, H, W, Wp, a0, da, omega, s,
             Rc, interpret, vmem_mb=None, out_rows=None, mass=None):
    nb = (f_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(_zrr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da,
                             mass=mass, omega=omega, s=s, nb=nb, bim=bim)
    in_specs = [_lagged_spec(R, Wp, 1)]
    args = [f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC]
    args += [fh, phh, bnd]
    fc = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=_lagged_spec(R // 2, Wp, idx_off),
        out_shape=jax.ShapeDtypeStruct((out_rows, Wp), f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((R + 4, Wp), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes: f in (4) + int8 phase (1) + coarse out at 1/2 rows (2)
        cost_estimate=pl.CostEstimate(
            flops=(45 if bim else 20) * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(7 if bim else 6) * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    # Same ghost-block invariant as _run_rr.
    return fc


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "omega", "s", "R_up", "interpret",
    "vmem_mb"))
def _run_zpsweep(f_pad, ph_pad, uc_pad, dst, fh, phh, uch, bnd, *, R, H, W,
                 Wp, a0, da, omega, s, R_up, interpret, vmem_mb=None,
                 mass=None):
    nb = (f_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    fh = (jnp.zeros((8, Wp), jnp.float32) if fh is None
          else fh.astype(jnp.float32))
    if phh is None:
        phh = jnp.zeros((8, Wp), jnp.int8)
    uch = (jnp.zeros((8, Wp), jnp.float32) if uch is None
           else uch.astype(jnp.float32))
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * R_up) % R == 0
    kern = functools.partial(_zpsweep_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0,
                             da=da, mass=mass, omega=omega, s=s, nb=nb,
                             R_up=R_up, bim=bim)
    in_specs = [_lagged_spec(R, Wp, 1)]
    args = [f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 1))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_lagged_spec(R // 2, Wp, 2 * R_up // R),
                 pl.BlockSpec(memory_space=pl.ANY),
                 _halo_spec(Wp), _halo_spec(Wp), _halo_spec(Wp), _SMEM_SPEC]
    args += [uc_pad, dst, fh, phh, uch, bnd]
    out = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(dst.shape, f_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp), jnp.float32),
            pltpu.VMEM((R + 3, Wp), jnp.int8),
            pltpu.VMEM((R // 2 + 2, Wp), jnp.float32),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes: f in (4) + phase (1) + coarse uc at 1/2 rows (2) + out (4)
        cost_estimate=pl.CostEstimate(
            flops=(50 if bim else 25) * (f_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(11 if bim else 10) * (f_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=(
    "R", "H", "W", "Wp", "a0", "da", "mass", "s", "Rc", "out_rows", "own_rows",
    "interpret", "vmem_mb", "dform"))
def _run_rr(u_pad, f_pad, ph_pad, uh, bnd, *, R, H, W, Wp, a0, da, s, Rc,
            interpret, vmem_mb=None, out_rows=None, own_rows=None, mass=None,
            dform=False):
    nb = (u_pad.shape[0] - 2 * R) // R
    bim = ph_pad is not None
    if out_rows is None:
        Hc = (H - 1) // 2 + 1
        out_rows = _round_up(Hc, Rc) + 2 * Rc
    uh = (jnp.zeros((8, Wp), jnp.float32) if uh is None
          else uh.astype(jnp.float32))
    if bnd is None:
        bnd = _default_bounds(H, W)
    assert (2 * Rc) % R == 0
    idx_off = 2 * Rc // R - 1
    assert (nb + idx_off + 1) * (R // 2) <= out_rows, "coarse buffer too small"
    kern = functools.partial(_rr_kernel, R=R, H=H, W=W, Wp=Wp, a0=a0, da=da,
                             mass=mass, s=s, nb=nb,
                             own_hi=(own_rows if own_rows is not None
                                     else nb * R) - 2, bim=bim, dform=dform)
    in_specs = [_lagged_spec(R, Wp, 1), _lagged_spec(R, Wp, 0)]
    args = [u_pad, f_pad]
    if bim:
        in_specs.append(_lagged_spec(R, Wp, 0))
        args.append(ph_pad)
    else:
        in_specs.append(_DUMMY_SPEC)
        args.append(jnp.zeros((32, 128), jnp.int8))
    in_specs += [_halo_spec(Wp), _SMEM_SPEC]
    args += [uh, bnd]
    fc, rsq = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=[
            _lagged_spec(R // 2, Wp, idx_off),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, Wp), u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 3, Wp), jnp.float32),
            pltpu.VMEM((1, Wp), jnp.float32),
            pltpu.VMEM((2, Wp), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=(None if vmem_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) << 20)),
        # bytes_accessed is BYTES per fine node: u in + f in (8 B) + int8
        # phase (1 B) + coarse f32 output at 1/2 the row count (2 B).
        cost_estimate=pl.CostEstimate(
            flops=(40 if bim else 16) * (u_pad.shape[0] - 2 * R) * Wp,
            bytes_accessed=(11 if bim else 10) * (u_pad.shape[0] - 2 * R) * Wp,
            transcendentals=0,
        ),
    )(*args)
    # INVARIANT: output blocks outside [idx_off, nb + idx_off] (the top
    # ghost half-block and any trailing slack) are never written and hold
    # uninitialized memory.  Every in-tree consumer (the coarse level's
    # sweep/restrict kernels and unpad) selects away from those rows with
    # jnp.where interior masks before use — never reduce over or
    # multiplicatively mask the raw buffer.
    return fc, jnp.sum(rsq)


# ---------------------------------------------------------------------------
# Host-side level wrapper.
# ---------------------------------------------------------------------------


class PallasLevel:
    """Kernels plus the ghost-block stride-lane layout for one level.

    Level fields live on ``(Hp + 2R, Wp)`` buffers: node row g at buffer row
    ``g + R``, node col j at lane ``j * stride``.  ``phase`` is this level's
    (n, n) element phase bitmap (None = homogeneous), padded once with
    element (p, q) at buffer row p + R, lane q*stride.
    """

    def __init__(self, n: int, stride: int = 1, phase=None,
                 coefficients=(1.0, 20.0), omega: float = 2.0 / 3.0,
                 Wp: Optional[int] = None, rows: int = 64,
                 rows_next: Optional[int] = None,
                 interpret: Optional[bool] = None, dtype=jnp.float32,
                 vmem_mb: Optional[int] = 64,
                 mass: Optional[tuple] = None,
                 dform: Optional[bool] = None):
        self.n = n
        self.H = self.W = n + 1
        self.s = int(stride)
        self.R = int(rows)
        self.Rc = int(rows_next if rows_next is not None else rows)
        assert self.R % 32 == 0, "row blocks must be int8-tile aligned"
        assert (2 * self.Rc) % self.R == 0, "coarse ghost must align to R/2"
        self.Wp = Wp or _round_up(self.W * self.s, 128)
        assert (self.W - 1) * self.s < self.Wp
        self.Hp = _round_up(self.H, self.R)
        self.nb = self.Hp // self.R
        self.a0 = float(coefficients[0])
        self.da = (float(coefficients[1]) - float(coefficients[0])
                   if phase is not None else 0.0)
        # Optional pattern-independent per-element operator (mp, ms, mo):
        # adds sum_e [mp u_p + ms s_e + mo u_opp] to the stiffness apply and
        # 4 (mp + ms) to the Jacobi diagonal.  The heat theta-system
        # M + theta dt K is coefficients=(theta dt a0, theta dt a1) with
        # mass = h^2/36 * (2, 2, -1) (ops/heat.py pallas_heat_hierarchy).
        self.mass = (tuple(float(m) for m in mass)
                     if mass is not None else None)
        # difference-form stencil assembly (see _apply_hom_d): the default
        # for pure-stiffness operators — at production sizes the plain
        # form's magnitude-scaled rounding bias, kappa-amplified by the
        # coarse correction, destabilizes V-cycles (measured divergence at
        # 4097^2 bi-material).  ``mass`` operators keep the plain form
        # (nonzero row sums; they are also far better conditioned).
        self.dform = (self.mass is None) if dform is None else bool(dform)
        assert not (self.dform and self.mass is not None)
        self.omega = float(omega)
        self.dtype = dtype
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        # Mosaic scoped-VMEM limit for every kernel at this level.  The
        # 16 MB default is marginal at rows=64 (the bim sweep sits at
        # ~16.5 MB depending on surrounding-code scheduling); v5e has
        # 128 MB of VMEM, so 64 MB is safely clear of both.
        self.vmem_mb = vmem_mb
        self.bim = phase is not None
        if self.bim:
            # padded host-side: an eager strided scatter at this level's
            # unique buffer shape costs an XLA compile per level on a
            # remote TPU (see core/problem.py::build_level)
            ph_np = np.asarray(phase)
            buf = np.zeros(self.buf_shape, np.int8)
            buf[self.R : self.R + ph_np.shape[0],
                0 : ph_np.shape[1] * self.s : self.s] = ph_np
            self.ph_pad = jnp.asarray(buf)
        else:
            self.ph_pad = None

    # ---- layout ----

    @property
    def buf_shape(self):
        return (self.Hp + 2 * self.R, self.Wp)

    def zeros(self):
        return jnp.zeros(self.buf_shape, self.dtype)

    def pad(self, x, dtype=None):
        """Logical (H|n, W|n) field -> ghost-block stride-lane buffer."""
        dtype = dtype or self.dtype
        h, w = x.shape
        out = jnp.zeros(self.buf_shape, dtype)
        return out.at[self.R : self.R + h, 0 : w * self.s : self.s].set(
            x.astype(dtype))

    def unpad(self, x):
        return x[self.R : self.R + self.H, 0 : (self.W - 1) * self.s + 1 : self.s]

    # ---- kernels ----

    def _cfg(self):
        return dict(R=self.R, H=self.H, W=self.W, Wp=self.Wp, a0=self.a0,
                    da=self.da, mass=self.mass, omega=self.omega, s=self.s,
                    interpret=self.interpret)

    def sweep(self, u_pad, f_pad, dst=None, uh=None, uch=None, bnd=None,
              ph_pad=None, own_rows=None):
        """One fused weighted-Jacobi sweep -> (u_new, rsq).  ``rsq`` is the
        *pre-update* interior squared residual norm.  ``dst`` is a donated
        same-shape buffer (pass the solve loop's ping-pong spare).

        ``uh``/``bnd`` support sharded execution (see ShardedPallasHierarchy):
        an (8, Wp) u halo strip (row 7 = node row -1, row 0 = node row Hp)
        and int32[4] local updatable-row bounds; None = single device."""
        if dst is None:
            dst = self.zeros()
        return _run_sweep(u_pad, f_pad,
                          self.ph_pad if ph_pad is None else ph_pad,
                          None, dst, uh, uch, bnd,
                          mode="sweep", R_up=0, vmem_mb=self.vmem_mb,
                          own_rows=own_rows, dform=self.dform, **self._cfg())

    def residual(self, u_pad, f_pad, dst=None, uh=None, bnd=None):
        """Interior-masked residual f - A u (+ its norm^2)."""
        if dst is None:
            dst = self.zeros()
        return _run_sweep(u_pad, f_pad, self.ph_pad, None, dst, uh, None, bnd,
                          mode="residual", R_up=0, vmem_mb=self.vmem_mb,
                          dform=self.dform, **self._cfg())

    def psweep(self, u_pad, f_pad, uc_pad, R_up: Optional[int] = None, dst=None,
               vmem_mb: Optional[int] = None, uh=None, uch=None, bnd=None,
               ph_pad=None, own_rows=None, omega: Optional[float] = None):
        """Fused (u += prolong(u_c); one Jacobi sweep) -> (u_new, rsq).
        ``uc_pad``: the coarse level's buffer (stride 2s, ghost R_up rows).
        ``uch``: (8, Wp) coarse halo strip (row 7 = coarse row -1, row 0 =
        coarse row Hp/2) for sharded execution.  ``omega`` overrides the
        level's damping; ``omega=0.0`` makes the trailing sweep the
        identity, i.e. a pure masked prolongation-add (used by solvers
        whose post-smoother is not plain Jacobi, e.g. H-MG)."""
        if dst is None:
            dst = self.zeros()
        cfg = self._cfg()
        if omega is not None:
            cfg["omega"] = float(omega)
        return _run_sweep(u_pad, f_pad,
                          self.ph_pad if ph_pad is None else ph_pad,
                          uc_pad, dst, uh, uch, bnd,
                          mode="sweep", R_up=int(R_up if R_up is not None else self.Rc),
                          vmem_mb=(vmem_mb if vmem_mb is not None else self.vmem_mb),
                          own_rows=own_rows, dform=self.dform, **cfg)

    def sweep_restrict(self, u_pad, f_pad, dst=None, uh=None, fh=None,
                       phh=None, bnd=None, out_rows: Optional[int] = None,
                       own_rows: Optional[int] = None, ph_pad=None):
        """Fully-fused V-cycle descent leg: one pre-smoothing Jacobi sweep +
        residual of the swept iterate + x4 full-weighting restriction, in a
        single HBM pass -> (u1, f_c, rsq).  ``rsq`` is the PRE-sweep interior
        residual norm^2 (identical to ``sweep``'s); ``f_c`` is the coarse RHS
        in the coarse level's layout.  Equivalent to
        ``u1, rsq = sweep(u, f); f_c, _ = restrict_residual(u1, f)``.
        Same ghost-block caveat on ``f_c`` as ``restrict_residual``.

        Sharded execution: ``uh`` rows 5..7 = u rows -3..-1, rows 0..1 = u
        rows Hp, Hp+1; ``fh`` rows 6..7 = f rows -2..-1, row 0 = f row Hp;
        ``phh`` rows 5..7 = element rows -3..-1, row 0 = element row Hp;
        ``bnd`` int32[4] local bounds; ``out_rows`` overrides the coarse
        buffer row count (local coarse Hp/2 + 2 Rc)."""
        if dst is None:
            dst = self.zeros()
        if phh is None and self.bim:
            phh = jnp.zeros((8, self.Wp), jnp.int8)
        return _run_swrr(u_pad, f_pad,
                         self.ph_pad if ph_pad is None else ph_pad,
                         dst, uh, fh, phh,
                         bnd, Rc=self.Rc, vmem_mb=self.vmem_mb,
                         out_rows=out_rows, own_rows=own_rows,
                         dform=self.dform, **self._cfg())

    def pswrr(self, u1_pad, f_pad, uc_pad, R_up: Optional[int] = None,
              dst=None, bnd=None, own_rows: Optional[int] = None,
              out_rows: Optional[int] = None):
        """Cross-cycle fused fine-level leg -> (u4, f_c, rsq):

            u2 = u1 + P(uc);  u3 = jacobi(u2);  u4 = jacobi(u3);
            f_c = 4 FW(f - A u4);  rsq = ||f - A u3||^2  (interior)

        i.e. the prolongation-add + post-smooth that COMPLETE a V(1,1)
        cycle fused with the pre-smooth + restriction that START the next
        one; ``rsq`` is the completed cycle's residual (the solve loop's
        free convergence test).  Equivalent to
        ``u3, _ = psweep(u1, f, uc); u4, f_c, rsq = sweep_restrict(u3, f)``.
        SINGLE-DEVICE only (its 4-deep halos exceed the shard strips —
        the sharded path keeps psweep + sweep_restrict)."""
        if dst is None:
            dst = self.zeros()
        return _run_pswrr(u1_pad, f_pad, self.ph_pad, uc_pad, dst,
                          None, None, None, None, bnd, Rc=self.Rc,
                          R_up=int(R_up if R_up is not None else self.Rc),
                          vmem_mb=self.vmem_mb, out_rows=out_rows,
                          own_rows=own_rows, dform=self.dform, **self._cfg())

    def zsweep_restrict(self, f_pad, fh=None, phh=None, bnd=None,
                        out_rows: Optional[int] = None, ph_pad=None):
        """ZERO-initial-guess descent leg: with u1 = (omega/d) f (the first
        sweep from u = 0, computed pointwise in-register), emit
        f_c = 4 FW(f - A u1) -> coarse RHS buffer.  u1 never touches HBM.
        Equivalent to ``u1, _ = sweep(zeros(), f); f_c, _ =
        restrict_residual(u1, f)``.  Same ghost-block caveat on ``f_c``."""
        if phh is None and self.bim:
            phh = jnp.zeros((8, self.Wp), jnp.int8)
        cfg = self._cfg()
        return _run_zrr(f_pad, self.ph_pad if ph_pad is None else ph_pad,
                        fh, phh, bnd, Rc=self.Rc, vmem_mb=self.vmem_mb,
                        out_rows=out_rows, **cfg)

    def zpsweep(self, f_pad, uc_pad, R_up: Optional[int] = None, dst=None,
                fh=None, phh=None, uch=None, bnd=None, ph_pad=None):
        """ZERO-initial-guess ascent leg: recompute u1 = (omega/d) f
        pointwise, add the bilinear coarse correction, and run the
        post-smoothing sweep -> u3.  Equivalent to
        ``u1, _ = sweep(zeros(), f); u3, _ = psweep(u1, f, uc)`` without
        ever storing u1."""
        if dst is None:
            dst = self.zeros()
        if phh is None and self.bim:
            phh = jnp.zeros((8, self.Wp), jnp.int8)
        return _run_zpsweep(f_pad,
                            self.ph_pad if ph_pad is None else ph_pad,
                            uc_pad, dst, fh, phh, uch, bnd,
                            R_up=int(R_up if R_up is not None else self.Rc),
                            vmem_mb=self.vmem_mb, **self._cfg())

    def restrict_residual(self, u_pad, f_pad, uh=None, bnd=None,
                          out_rows: Optional[int] = None):
        """Fused residual + x4 full-weighting restriction -> (f_c, rsq).
        ``f_c`` is a fresh buffer in the coarse level's layout (stride 2s,
        ghost Rc rows); ``rsq`` is this level's squared residual norm.

        Sharded execution: ``uh`` rows 6..7 = u rows -2..-1, row 0 = u row
        Hp; the f (row -1) and element (rows -2..-1) halos must be written
        into the top ghost blocks of ``f_pad``/``ph_pad`` (buffer rows
        R-1 / R-2..R-1), which this kernel streams.

        WARNING: ``f_c``'s top ghost half-block and trailing slack rows are
        uninitialized (see the invariant note in ``_run_rr``); mask with
        ``jnp.where`` before any whole-buffer reduction or copy."""
        cfg = self._cfg()
        cfg.pop("omega")
        return _run_rr(u_pad, f_pad, self.ph_pad, uh, bnd, Rc=self.Rc,
                       vmem_mb=self.vmem_mb, out_rows=out_rows,
                       dform=self.dform, **cfg)
