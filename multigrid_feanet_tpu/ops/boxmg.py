"""Industrial BoxMG setup: device-resident operator-induced transfers and
Galerkin coarsening (round 5 — VERDICT r4 "industrialize BoxMG" item).

The research-scale module (ops/adaptive_transfer.py) computes Dendy/BoxMG
transfer weights in host numpy from a fully materialized (H, W, 3, 3)
stencil field and probes the Galerkin product with nine separately
dispatched programs per level — ~77 s of setup at n=1024 through the
remote-TPU tunnel, dominated by the device->host stencil pull (600 MB at
4097^2) and per-probe dispatch.  This module keeps the whole setup ON
DEVICE inside one jitted program per hierarchy:

- **W4 composed weights.**  The class-structured weights (Fx edge pairs,
  Fy edge pairs, Fc 8-neighbour rows) are composed once into a uniform
  per-fine-node (2, 2) tensor ``W4`` with

      (P u_c)[i, j] = sum_{a,b in {0,1}} W4[i, j, a, b] * u_c[i//2 + a, j//2 + b]

  (for even i the a=1 weights are identically zero, likewise b; a C node
  carries the single injection weight 1).  Restriction is the exact
  transpose, which in W4 form is a uniform 3x3-window reduction — no
  per-class branching, so both transfers map directly onto the stride-lane
  Pallas kernels (ops/pallas_general.py) AND onto 4-plane XLA FMAs.
  The fine interior mask (geo_f) and the coarse interior mask (geo_c) are
  FOLDED INTO W4 (rows of boundary fine nodes and columns targeting
  boundary coarse nodes are zeroed), so P masks like ``prolong * geo_f``
  and P^T masks like ``geo_c * restrict(geo_f * r)`` with no extra passes.
  Contract: u_c must carry a zero Dirichlet ring (true for every coarse
  field in a correction scheme), since ring values are unreachable
  through the folded weights.

- **Galerkin R A P by nine 3-strided probes inside ONE jit** (same math as
  adaptive_transfer.galerkin_stencils, validated against it in
  tests/test_boxmg_setup.py), with the coarse-stencil assembly done on
  device via iota masks — no host round-trip at any size.

- **Per-node fine stencils in bitplane form** (no 16-entry gather): the
  two-phase stencil field is affine in the 4 surrounding element-phase
  bits, S = a0 * S9 + (a1 - a0) * sum_e bit_e .* S4_e (ops/stencil.py
  UNIT_S4), evaluated as 4 elementwise FMAs per tap.

Math reference (Dendy black-box multigrid for 9-point stencils):
ops/adaptive_transfer.py module docstring.  Capability anchor in the
reference: Utils/pacnet/pac.py:690,740 (vendored-unused content-adaptive
convolutions); problem anchor: MM_Interface_error.ipynb cells 14/20.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import stencil as stencil_mod


def _guard(den, eps=1e-30):
    return jnp.where(jnp.abs(den) > eps, den, 1.0)


def node_stencil_planes(level, dtype=None) -> jax.Array:
    """Per-node (H, W, 3, 3) stencil field of a hierarchy Level, computed
    with bitplane FMAs (no gather) — jit-friendly at any size.

    Handles the three Level operator forms (core/problem.py::Level.apply):
    homogeneous (3,3) table, two-phase (a0, a1), and phase-affine
    (base + bit_scale * bitplanes)."""
    H = level.n + 1
    dtype = dtype or level.geo.dtype
    if level.pid is None:
        table = level.table if level.table.ndim == 2 else level.table[0]
        return jnp.broadcast_to(table.astype(dtype), (H, H, 3, 3))
    p = level.pid.astype(jnp.int32)
    if level.base is not None:
        base = jnp.asarray(level.base, dtype)
        scale = float(level.bit_scale)
    else:
        base = float(level.a0) * jnp.asarray(
            [[stencil_mod.UNIT_S9.get((dr, dc), 0.0) for dc in (-1, 0, 1)]
             for dr in (-1, 0, 1)], dtype)
        scale = float(level.a1) - float(level.a0)
    S = jnp.broadcast_to(base, (H, H, 3, 3))
    for e, taps in enumerate(stencil_mod.UNIT_S4):
        bit = ((p >> e) & 1).astype(dtype)  # (H, W)
        t = jnp.asarray([[taps.get((dr, dc), 0.0) for dc in (-1, 0, 1)]
                         for dr in (-1, 0, 1)], dtype)
        S = S + (scale * bit)[..., None, None] * t
    return S


def _shift(x, dr, dc):
    """x[i + dr, j + dc] with zero ghosts (|dr|, |dc| <= 1)."""
    H, W = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)))
    return xp[1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]


def transfer_weights(S: jax.Array, geo_f, geo_c) -> jax.Array:
    """Composed (H, W, 2, 2) W4 weights from a per-node stencil field.

    Dendy collapse (ops/adaptive_transfer.py::AdaptiveTransfer) computed on
    the FULL grid (off-class values are discarded by the parity masks —
    4x redundant flops, but no 2-D strided slices and one fused program):

      Fx (even row, odd col): collapse stencil rows; w = -sum_dr S[., dr, c]
        / sum_dr S[., dr, 1] for c in {W, E}.
      Fy: collapse columns.
      Fc (odd, odd): own stencil row over the 8 neighbours, composed with
        the already-known Fx/Fy weights of those neighbours and the C
        injections.

    geo_f zeroes boundary fine rows; geo_c zeroes weights that target
    boundary coarse nodes."""
    dtype = S.dtype
    H = S.shape[0]
    sx = S.sum(axis=2)  # (H, W, 3): row-collapsed [W, C, E]
    wxW = -sx[..., 0] / _guard(sx[..., 1])
    wxE = -sx[..., 2] / _guard(sx[..., 1])
    sy = S.sum(axis=3)  # (H, W, 3): col-collapsed [N, C, S]
    wyN = -sy[..., 0] / _guard(sy[..., 1])
    wyS = -sy[..., 2] / _guard(sy[..., 1])
    wc = -S / _guard(S[..., 1:2, 1:2])  # (H, W, 3, 3), centre unused

    i = jnp.arange(H)
    re = (i[:, None] % 2 == 0)  # row-even
    ce = (i[None, :] % 2 == 0)  # col-even
    C, Fx, Fy, Fc = re & ce, re & ~ce, ~re & ce, ~re & ~ce

    # Fc composition: neighbours' own interpolation weights.  shift(x, d)
    # reads the neighbour's full-grid weight plane at the neighbour's
    # position (valid there by construction).
    fc00 = (wc[..., 0, 0] + wc[..., 0, 1] * _shift(wxW, -1, 0)
            + wc[..., 1, 0] * _shift(wyN, 0, -1))
    fc01 = (wc[..., 0, 2] + wc[..., 0, 1] * _shift(wxE, -1, 0)
            + wc[..., 1, 2] * _shift(wyN, 0, 1))
    fc10 = (wc[..., 2, 0] + wc[..., 2, 1] * _shift(wxW, 1, 0)
            + wc[..., 1, 0] * _shift(wyS, 0, -1))
    fc11 = (wc[..., 2, 2] + wc[..., 2, 1] * _shift(wxE, 1, 0)
            + wc[..., 1, 2] * _shift(wyS, 0, 1))

    zero = jnp.zeros_like(wxW)
    one = jnp.ones_like(wxW)
    w00 = jnp.where(C, one, jnp.where(Fx, wxW, jnp.where(Fy, wyN, fc00)))
    w01 = jnp.where(Fx, wxE, jnp.where(Fc, fc01, zero))
    w10 = jnp.where(Fy, wyS, jnp.where(Fc, fc10, zero))
    w11 = jnp.where(Fc, fc11, zero)
    W4 = jnp.stack([jnp.stack([w00, w01], axis=-1),
                    jnp.stack([w10, w11], axis=-1)], axis=-2)  # (H, W, 2, 2)
    if geo_f is not None:
        W4 = W4 * geo_f.astype(dtype)[..., None, None]
    if geo_c is not None:
        gc = geo_c.astype(dtype)
        for a in (0, 1):
            for b in (0, 1):
                W4 = W4.at[..., a, b].mul(_up_sample(gc, a, b))
    return W4


def _up_rows(x, a):
    """(m, W) -> (2m-1, W): out[i] = x[i//2 + a] (zero past the edge)."""
    m = x.shape[0]
    if a == 1:
        x = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    return jnp.stack([x, x], axis=1).reshape(2 * m, *x.shape[1:])[: 2 * m - 1]


def _up_cols(x, b):
    """(H, m) -> (H, 2m-1): out[., j] = x[., j//2 + b]."""
    m = x.shape[1]
    if b == 1:
        x = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    return jnp.stack([x, x], axis=2).reshape(x.shape[0], 2 * m)[:, : 2 * m - 1]


def _up_sample(xc, a, b):
    """(m, m) coarse plane -> (H, H) fine plane sampled at (i//2+a, j//2+b)."""
    return _up_cols(_up_rows(xc, a), b)


def prolong_w4(uc: jax.Array, W4: jax.Array) -> jax.Array:
    """(m, m) coarse -> (2m-1, 2m-1) fine via the composed weights (masks
    included — W4 carries the geo folds)."""
    out = None
    for a in (0, 1):
        for b in (0, 1):
            t = W4[..., a, b] * _up_sample(uc, a, b)
            out = t if out is None else out + t
    return out


def restrict_w4(r: jax.Array, W4: jax.Array) -> jax.Array:
    """(H, H) fine -> (m, m) coarse, the exact transpose of prolong_w4:

        (P^T r)[I, J] = sum_{dr, dc in {-1,0,1}}
            W4[2I+dr, 2J+dc, a*(dr), b*(dc)] * r[2I+dr, 2J+dc]

    with a*(-1) = 1, a*(0) = a*(1) = 0 (a fine node at row 2I-1 reaches
    coarse row I through its a=1 weight)."""
    t = [W4[..., a, 0] * r for a in (0, 1)]  # b=0 planes after row stage
    tb = [W4[..., a, 1] * r for a in (0, 1)]

    def row_stage(t0, t1):
        # rows_b[I] = t1[2I-1] + t0[2I] + t0[2I+1]
        even = t0[0::2]  # (m, W)
        odd0 = t0[1::2]  # rows 2I+1, I = 0..m-2
        odd1 = t1[1::2]  # rows 2I+1 -> shift to 2I-1 for I+1
        up = jnp.concatenate([jnp.zeros_like(odd1[:1]), odd1], axis=0)
        dn = jnp.concatenate([odd0, jnp.zeros_like(odd0[:1])], axis=0)
        return up + even + dn  # (m, W)

    rows_0 = row_stage(t[0], t[1])
    rows_1 = row_stage(tb[0], tb[1])
    even = rows_0[:, 0::2]
    odd0 = rows_0[:, 1::2]
    odd1 = rows_1[:, 1::2]
    up = jnp.concatenate([jnp.zeros_like(odd1[:, :1]), odd1], axis=1)
    dn = jnp.concatenate([odd0, jnp.zeros_like(odd0[:, :1])], axis=1)
    return up + even + dn


def apply_s9(S: jax.Array, u: jax.Array) -> jax.Array:
    """A u for a per-node (H, W, 3, 3) stencil field (9 shifted FMAs)."""
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    out = None
    for dr in range(3):
        for dc in range(3):
            t = S[..., dr, dc] * up[..., dr : dr + H, dc : dc + W]
            out = t if out is None else out + t
    return out


def galerkin_rap(S: jax.Array, W4: jax.Array) -> jax.Array:
    """Coarse per-node stencils S_c = P^T A P via nine 3-strided lattice
    probes, assembled on device (same probe math as
    adaptive_transfer.galerkin_stencils; within any coarse 3x3 window each
    offset is hit by exactly one lattice)."""
    m = (S.shape[0] - 1) // 2 + 1
    dtype = W4.dtype
    I = jnp.arange(m)

    # all nine probes through ONE traced R A P body (a 9x smaller traced
    # program than nine sequential traces — XLA compile time at deep
    # hierarchies is the setup cost) — but SEQUENTIALLY via lax.map, with
    # each probe lattice built in-body from its index: the vmapped form
    # materialized four (9, H, H) f32 temps in a 1.8x-padded layout and
    # ran out of HBM at 8193^2 (20.6 GB against 15.75).
    def one_probe(k):
        a, b = k // 3, k % 3
        e = ((I[:, None] % 3 == a) & (I[None, :] % 3 == b)).astype(dtype)
        return restrict_w4(apply_s9(S, prolong_w4(e, W4)), W4)

    ys_all = jax.lax.map(one_probe, jnp.arange(9))
    ys = {(a, b): ys_all[3 * a + b] for a in range(3) for b in range(3)}
    cols = []
    for dr in range(3):
        row_entries = []
        for dc in range(3):
            acc = None
            for a in range(3):
                ra = ((I + dr - 1) % 3 == a).astype(dtype)[:, None]
                for b in range(3):
                    cb = ((I + dc - 1) % 3 == b).astype(dtype)[None, :]
                    t = (ra * cb) * ys[(a, b)]
                    acc = t if acc is None else acc + t
            row_entries.append(acc)
        cols.append(jnp.stack(row_entries, axis=-1))
    return jnp.stack(cols, axis=-2)  # (m, m, 3, 3)


def _ring_mask(m: int, dtype) -> jax.Array:
    g = jnp.zeros((m, m), dtype)
    return g.at[1:-1, 1:-1].set(1.0)


@functools.partial(jax.jit, static_argnames=("L", "dtype"))
def _setup_jit(fine, geos, L, dtype):
    """(W4_l, S_{l+1}) for l = 0..L-2 in ONE traced program (the fine-level
    stencil-field materialization included — eager device ops pay an XLA
    compile + dispatch per op through the remote-TPU tunnel).  ``fine`` is
    the finest Level (a flax.struct pytree); ``geos`` per-level interior
    masks (finest first, length >= L)."""
    S = node_stencil_planes(fine, dtype)
    outs = []
    for l in range(L - 1):
        W4 = transfer_weights(S, geos[l], geos[l + 1])
        Sc = galerkin_rap(S, W4)
        # guard the (identically zero) Dirichlet-ring rows: unit diagonal
        # so Jacobi's omega/d never divides by zero; ring values stay 0
        # because every kernel masks updates to the interior.
        d = Sc[..., 1, 1]
        Sc = Sc.at[..., 1, 1].set(jnp.where(jnp.abs(d) > 0, d, 1.0))
        outs.append((W4, Sc))
        S = Sc
    return tuple(outs)


def boxmg_setup(hier, num_levels: Optional[int] = None, dtype=None):
    """Device-resident BoxMG hierarchy setup from a GridHierarchy: returns
    ``[(W4_0, Sc_1), (W4_1, Sc_2), ...]`` — transfers for every level pair
    and Galerkin stencil fields for every coarse level — computed in ONE
    jitted program (compile once per hierarchy shape, no host round-trips).
    """
    L = num_levels if num_levels is not None else hier.num_levels
    fine = hier.levels[0]
    dtype = dtype or fine.geo.dtype
    geos = []
    for l in range(L):
        if l < hier.num_levels:
            geos.append(hier.levels[l].geo.astype(dtype))
        else:
            geos.append(_ring_mask((fine.n >> l) + 1, dtype))
    return list(_setup_jit(fine, tuple(geos), L, jnp.dtype(dtype)))
