"""Pallas TPU kernels for the 3x3 stencil operator and fused Jacobi sweep.

Design (see /opt/skills/guides/pallas_guide.md):

- Row-blocked pipeline: the grid iterates over row blocks of the (padded)
  field; ``f``/``pid``/outputs ride the automatic Pallas pipeline while ``u``
  stays in HBM and each step manually DMAs its (BR+2, W) halo slice into a
  double-buffered VMEM scratch (the +-1 row halo overlaps block boundaries,
  which BlockSpecs cannot express).
- Column neighbours are realized with two whole-tile lane rolls shared
  across all taps; the wrap-around columns land only in masked
  (boundary / padding) lanes.
- The bi-material operator is evaluated in *bitplane form*: the per-node
  3x3 stencil is affine in the 4 surrounding element-phase bits,

      A u = a0 * S9(u) + (a1 - a0) * sum_e bit_e(pid) .* S4_e(u)

  (S9 = unit 9-point FEM Laplace stencil, S4_e = element e's 4-tap unit-Ke
  contribution), i.e. 25 FMA taps total instead of a 16-way vector select.
  The Jacobi diagonal is likewise affine in the bits: d = (2/3) * sum_e a_e.
- The fused sweep computes  u_new = where(interior, u + omega/d * (f - A u), u)
  — boundary (and padding) nodes keep their current value, so arbitrary
  Dirichlet data is handled by initializing u's boundary ring once (the
  math matches the reference's per-sweep reset, FEANet/jacobi.py:39-47).
- HBM traffic per fused sweep: u(4) + f(4) + pid(1) + u_out(4) = 13 B/node
  (+1 row of halo re-read per block), vs. the reference's two 16-channel
  convolutions.  A per-block partial sum of the masked squared residual is
  emitted for free, so solve loops get residual norms without a second pass.

All shapes are padded to (8, 128)-aligned tiles by the host-side wrappers;
masks are derived from broadcasted iota against the *logical* (H, W), which
are compile-time constants.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Unit-Ke tap tables (see ops/stencil.py for the derivation; these are the
# per-element contributions of a coefficient-1 element to the center node's
# row).  Quadrant order matches the pid bit order: SW, SE, NW, NE.
_CENTER = 2.0 / 3.0
_EDGE = -1.0 / 6.0
_CORNER = -1.0 / 3.0

# S4_e: {(dr, dc): tap} for each element quadrant e (dr, dc in {-1, 0, 1})
_S4 = (
    {(0, 0): _CENTER, (-1, 0): _EDGE, (0, -1): _EDGE, (-1, -1): _CORNER},  # SW
    {(0, 0): _CENTER, (-1, 0): _EDGE, (0, 1): _EDGE, (-1, 1): _CORNER},  # SE
    {(0, 0): _CENTER, (1, 0): _EDGE, (0, -1): _EDGE, (1, -1): _CORNER},  # NW
    {(0, 0): _CENTER, (1, 0): _EDGE, (0, 1): _EDGE, (1, 1): _CORNER},  # NE
)

# S9 = sum of the four S4_e: the homogeneous 9-point FEM Laplace stencil.
_S9 = {}
for _t in _S4:
    for _k, _v in _t.items():
        _S9[_k] = _S9.get(_k, 0.0) + _v


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shifted_views(tile, rows: int):
    """tile: (rows+16, Wp) with the block's data at local rows 8..8+rows.
    Returns views[(dr, dc)] -> (rows, Wp) holding u[i+dr, j+dc] at local
    (i, j).  Row halo is explicit sublane slicing; the column neighbours come
    from just TWO whole-tile lane rolls (wrap lands in masked lanes only),
    shared across all row offsets."""
    Wp = tile.shape[1]
    # out[j] = x[j + dc]: roll by (-dc) mod Wp
    rolled = {0: tile, 1: pltpu.roll(tile, Wp - 1, 1), -1: pltpu.roll(tile, 1, 1)}
    views = {}
    for dc in (-1, 0, 1):
        for dr in (-1, 0, 1):
            views[(dr, dc)] = rolled[dc][8 + dr : 8 + dr + rows, :]
    return views


def _apply_taps(tile, pid_blk, rows: int, a0: float, da: float, bimaterial: bool):
    """A u for one block. tile: (rows+16, Wp) f32; pid_blk: (rows, Wp) int."""
    v = _shifted_views(tile, rows)
    acc = None
    for (dr, dc), w in _S9.items():
        term = (a0 * w) * v[(dr, dc)]
        acc = term if acc is None else acc + term
    if bimaterial:
        p = pid_blk.astype(jnp.int32)
        for e, taps in enumerate(_S4):
            bit = ((p >> e) & 1).astype(tile.dtype)
            t4 = None
            for (dr, dc), w in taps.items():
                term = w * v[(dr, dc)]
                t4 = term if t4 is None else t4 + term
            acc = acc + (da * bit) * t4
    return acc


def _diag(pid_blk, a0: float, da: float, bimaterial: bool, dtype):
    if not bimaterial:
        return jnp.asarray(4.0 * _CENTER * a0, dtype=dtype)
    p = pid_blk.astype(jnp.int32)
    nbits = (p & 1) + ((p >> 1) & 1) + ((p >> 2) & 1) + ((p >> 3) & 1)
    return _CENTER * (4.0 * a0 + da * nbits.astype(dtype))


def _interior_mask(i, rows: int, Wp: int, H: int, W: int):
    """Bool mask of logical-interior nodes of this block."""
    gr = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
    return (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)


def _sweep_kernel(u_hbm, f_ref, pid_ref, u_out, rsq_ref, scratch, sems, *,
                  rows, H, W, Wp, a0, da, omega, bimaterial, mode):
    """mode: 'sweep' (fused Jacobi) or 'residual' (r = masked(f - A u))."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(block, slot):
        # u_hbm is ghost-block padded: global row g lives at buffer row
        # g + rows.  The tile needs buffer rows [(block+1)*rows - 1,
        # (block+2)*rows + 1); HBM slices must be 8-row aligned, so fetch
        # [(block+1)*rows - 8, ...) with size rows+16 (data at local row 8).
        start = pl.multiple_of((block + 1) * rows - 8, 8)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(start, rows + 16)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    tile = scratch[i % 2]  # (rows+16, Wp), data at local rows 8..8+rows

    pid_blk = pid_ref[...] if bimaterial else None
    au = _apply_taps(tile, pid_blk, rows, a0, da, bimaterial)
    r = f_ref[...] - au
    # select, not multiply: ghost-block taps can carry uninitialized values
    # (even NaN) into masked lanes, and NaN * 0 would leak back in
    r = jnp.where(_interior_mask(i, rows, Wp, H, W), r, 0.0)
    if mode == "sweep":
        d = _diag(pid_blk, a0, da, bimaterial, r.dtype)
        u_out[...] = tile[8 : 8 + rows, :] + (omega / d) * r
    else:
        u_out[...] = r
    rsq_ref[i, 0] = jnp.sum(r * r)


def _pick_rows(H: int, Wp: int, vmem_budget: int = 12 * 2 ** 20) -> int:
    """Row-block size: multiple of 32 (int8 sublane tiling), rounded DOWN so
    the VMEM estimate is an upper bound.

    VMEM per block-row: 26 B/node of double-buffered tiles (2x f32 scratch,
    f, out; 2x int8 pid), two whole-tile rolled copies (8 B/node), and
    Mosaic vector-stack intermediates for the 25-tap bitplane evaluation —
    budget ~68 B/node against the 16 MB scoped-VMEM limit.
    """
    target = vmem_budget // (68 * Wp)  # incl. 2 whole-tile rolled copies
    return max(32, (min(target, H + 16) // 32) * 32)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "a0", "da", "omega", "mode", "interpret", "rows"),
)
def _run(u_pad, f_pad, pid_pad, *, H, W, a0, da, omega, mode, interpret, rows):
    HpG, Wp = u_pad.shape
    Hp = HpG - 2 * rows  # ghost block above and below
    nb = Hp // rows
    bimaterial = pid_pad is not None
    kernel = functools.partial(
        _sweep_kernel,
        rows=rows, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        bimaterial=bimaterial, mode=mode,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # u (manual DMA)
        pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
    ]
    args = [u_pad, f_pad]
    if bimaterial:
        in_specs.append(pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM))
        args.append(pid_pad)
    else:
        # placeholder so the kernel signature is uniform (never read)
        in_specs.append(pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.zeros((32, 128), dtype=jnp.int8))
    out, rsq = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            # per-block residual partials: one persistent SMEM buffer, each
            # grid step writes its own row
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((HpG, Wp), u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), u_pad.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows + 16, Wp), u_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # NOTE: raising CompilerParams.vmem_limit_bytes above the default
        # 16 MB lets bigger blocks compile but measurably SLOWS the kernel
        # (~523 -> ~690 us at 4097^2) — keep the default and small blocks.
        cost_estimate=pl.CostEstimate(
            flops=(50 if bimaterial else 18) * Hp * Wp,
            bytes_accessed=(13 if bimaterial else 12) * Hp * Wp,
            transcendentals=0,
        ),
    )(*args)
    return out, jnp.sum(rsq)


class PallasStencil:
    """Host-side wrapper owning the padded operator fields for one level.

    Pads the (H, W) = (n+1, n+1) node grid to lane/sublane-aligned (Hp, Wp)
    once; ``pad``/``unpad`` move fields in and out, and sweeps/residuals run
    entirely on padded buffers (pad once per solve, not per sweep).
    """

    def __init__(self, n: int, pid=None, coefficients=(1.0, 20.0), omega: float = 2.0 / 3.0,
                 dtype=jnp.float32, interpret: bool | None = None, rows: int | None = None):
        self.n = n
        self.H = self.W = n + 1
        self.Wp = _round_up(self.W, 128)
        self.rows = rows or _pick_rows(self.H, self.Wp)
        self.Hp = _round_up(self.H, self.rows)
        self.a0 = float(coefficients[0])
        self.da = float(coefficients[1]) - float(coefficients[0]) if pid is not None else 0.0
        self.omega = float(omega)
        self.dtype = dtype
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # Ghost-block layout: every padded buffer is (Hp + 2*rows, Wp) with
        # global row g at buffer row g + rows.  Output blocks then stay
        # block-aligned while halo DMAs start at 8-aligned offsets, and
        # sweeps ping-pong with no per-sweep re-padding.  Ghost blocks are
        # never written by the kernel (their stale contents only feed taps
        # of masked boundary/padding rows).
        if pid is not None:
            self.pid_pad = self.pad(jnp.asarray(pid), dtype=jnp.int8)
        else:
            self.pid_pad = None

    @property
    def ghost(self) -> int:
        return self.rows

    def pad(self, x, dtype=None):
        """(H, W) -> ghost-block padded (Hp + 2*rows, Wp)."""
        dtype = dtype or self.dtype
        G = self.rows
        out = jnp.zeros((self.Hp + 2 * G, self.Wp), dtype=dtype)
        return out.at[G : G + self.H, : self.W].set(x.astype(dtype))

    def unpad(self, x):
        G = self.rows
        return x[G : G + self.H, : self.W]

    def _call(self, u_pad, f_pad, mode):
        return _run(
            u_pad, f_pad, self.pid_pad,
            H=self.H, W=self.W, a0=self.a0, da=self.da, omega=self.omega,
            mode=mode, interpret=self.interpret, rows=self.rows,
        )

    def sweep_padded(self, u_pad, f_pad):
        """One fused Jacobi sweep on ghost-padded buffers -> (u_new, rsq)
        where rsq is the pre-update interior squared residual norm."""
        return self._call(u_pad, f_pad, "sweep")

    def sweep_k_padded(self, u_pad, f_pad, k: int):
        """k temporally-fused Jacobi sweeps in one HBM pass (k <= 8).
        Returns (u_new, rsq) with rsq the pre-update residual of the LAST
        sweep (lags k-1 sweeps behind the final iterate)."""
        assert 1 <= k <= 8
        pid = self.pid_pad
        return _run_fused(
            u_pad, f_pad, pid,
            H=self.H, W=self.W, a0=self.a0, da=self.da, omega=self.omega,
            interpret=self.interpret, rows=self.rows, k=k,
        )

    def residual_padded(self, u_pad, f_pad):
        """Interior-masked residual f - A u on ghost-padded buffers + norm^2."""
        return self._call(u_pad, f_pad, "residual")

    # ---- unpadded convenience API (pads per call; fine for tests) ----

    def sweep(self, u, f):
        u_new, rsq = self.sweep_padded(self.pad(u), self.pad(f))
        return self.unpad(u_new), rsq

    def residual(self, u, f):
        r, rsq = self.residual_padded(self.pad(u), self.pad(f))
        return self.unpad(r), rsq


# ---- temporally fused multi-sweep kernel ----
#
# k weighted-Jacobi sweeps per HBM pass (k <= 8): the block's u/f tiles carry
# +-8 rows of halo (the aligned DMA lead-in), pid +-32, and each sweep s
# computes its iterate on rows extended by (k-1-s) per side, shrinking to the
# block's rows for the final write-back.  HBM traffic per k sweeps is one
# read of u/f/pid + one write of u — amortized ~(13/k + 8(k-1)/k) B/node —
# instead of 13 B/node per sweep.  Column halos remain free (lane rolls with
# wrap landing in masked lanes; the boundary mask stops lateral garbage
# propagation, so any k is column-safe).


def _views_ext(tile, base: int, length: int):
    """views[(dr, dc)] -> (length, Wp) of u[i+dr, j+dc] for a row window
    starting at tile-local ``base``."""
    Wp = tile.shape[1]
    rolled = {0: tile, 1: pltpu.roll(tile, Wp - 1, 1), -1: pltpu.roll(tile, 1, 1)}
    return {
        (dr, dc): rolled[dc][base + dr : base + dr + length, :]
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }


def _apply_taps_ext(tile, base, length, pid_win, a0, da, bimaterial):
    v = _views_ext(tile, base, length)
    acc = None
    for (dr, dc), w in _S9.items():
        term = (a0 * w) * v[(dr, dc)]
        acc = term if acc is None else acc + term
    if bimaterial:
        p = pid_win.astype(jnp.int32)
        for e, taps in enumerate(_S4):
            bit = ((p >> e) & 1).astype(tile.dtype)
            t4 = None
            for (dr, dc), w in taps.items():
                term = w * v[(dr, dc)]
                t4 = term if t4 is None else t4 + term
            acc = acc + (da * bit) * t4
    return acc


def _fused_sweeps_kernel(u_hbm, f_hbm, pid_hbm, u_out, rsq_ref, us, fs, ps_, sems, *,
                         rows, H, W, Wp, a0, da, omega, bimaterial, k):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma3(block, slot):
        s8 = pl.multiple_of((block + 1) * rows - 8, 8)
        s32 = pl.multiple_of((block + 1) * rows - 32, 8)
        return (
            pltpu.make_async_copy(u_hbm.at[pl.ds(s8, rows + 16)], us.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(f_hbm.at[pl.ds(s8, rows + 16)], fs.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(pid_hbm.at[pl.ds(s32, rows + 64)], ps_.at[slot], sems.at[slot, 2]),
        )

    @pl.when(i == 0)
    def _():
        for d in dma3(0, 0):
            d.start()

    @pl.when(i + 1 < nb)
    def _():
        for d in dma3(i + 1, (i + 1) % 2):
            d.start()

    for d in dma3(i, i % 2):
        d.wait()
    u_tile = us[i % 2]  # (rows+16, Wp), data at 8..8+rows
    f_tile = fs[i % 2]
    p_tile = ps_[i % 2]  # (rows+64, Wp), data at 32..32+rows

    def win_mask(ext):
        gr = (i * rows - ext) + jax.lax.broadcasted_iota(jnp.int32, (rows + 2 * ext, Wp), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows + 2 * ext, Wp), 1)
        return (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)

    cur = u_tile  # iterate s reads `cur` with data at `cur_base`
    cur_base = 8
    r_last = None
    ext_last = 0
    for s in range(k):
        ext = k - 1 - s
        length = rows + 2 * ext
        pid_win = p_tile[32 - ext : 32 - ext + length, :] if bimaterial else None
        au = _apply_taps_ext(cur, cur_base - ext, length, pid_win, a0, da, bimaterial)
        r = f_tile[8 - ext : 8 - ext + length, :] - au
        r = jnp.where(win_mask(ext), r, 0.0)
        d = _diag(pid_win, a0, da, bimaterial, r.dtype)
        cur = cur[cur_base - ext : cur_base - ext + length, :] + (omega / d) * r
        cur_base = ext  # data row 0 now sits `ext` rows into the shrunk tile
        r_last, ext_last = r, ext
    u_out[...] = cur
    rc = r_last if ext_last == 0 else r_last[ext_last:-ext_last, :]
    rsq_ref[i, 0] = jnp.sum(rc * rc)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "a0", "da", "omega", "interpret", "rows", "k")
)
def _run_fused(u_pad, f_pad, pid_pad, *, H, W, a0, da, omega, interpret, rows, k):
    HpG, Wp = u_pad.shape
    Hp = HpG - 2 * rows
    nb = Hp // rows
    bimaterial = pid_pad is not None
    if pid_pad is None:
        pid_pad = jnp.zeros_like(u_pad, dtype=jnp.int8)  # placeholder (never read)
    kernel = functools.partial(
        _fused_sweeps_kernel,
        rows=rows, H=H, W=W, Wp=Wp, a0=a0, da=da, omega=omega,
        bimaterial=bimaterial, k=k,
    )
    out, rsq = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rows, Wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((HpG, Wp), u_pad.dtype),
            jax.ShapeDtypeStruct((nb, 1), u_pad.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows + 16, Wp), u_pad.dtype),
            pltpu.VMEM((2, rows + 16, Wp), u_pad.dtype),
            pltpu.VMEM((2, rows + 64, Wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=k * (50 if bimaterial else 18) * Hp * Wp,
            bytes_accessed=13 * Hp * Wp,
            transcendentals=0,
        ),
    )(u_pad, f_pad, pid_pad)
    return out, jnp.sum(rsq)
