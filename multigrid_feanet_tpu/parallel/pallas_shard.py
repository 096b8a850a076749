"""Sharded execution of the fused Pallas V-cycle (round-3).

The round-2 kernels (ops/pallas_sweep.py) run the hot path on one chip; this
module distributes them over a device mesh axis with EXPLICIT communication
(shard_map + ppermute), the performance-controlled counterpart of the GSPMD
path in parallel/sharding.py:

- **Row partition.**  Each level's node rows are split into ``nx`` equal
  shards of ``Hloc`` rows; every shard holds a ghost-block stride-lane
  buffer ``(HpLoc + 2R, Wp)`` exactly like the single-device layout.  Lanes
  stay unsharded: the kernels' lane mixing is ``pltpu.roll`` over the full
  register row, which a lane split would break; on a 2D mesh, combine this
  axis with dp/batch on the other axes.
- **Halos land where the zeros used to be.**  The kernels read their
  row -1/-2/-3 neighbourhood from (8, Wp) halo strips at grid step 0 and
  their row Hloc(+1) neighbourhood from the buffer rows just past the data
  (written in place) or from the strips at the last grid step — the same
  positions that hold zeros on a single device, so shard-local kernel
  results are BITWISE equal to the single-device kernel on the same rows.
- **Exact norms.**  Each kernel's rsq is clamped to the shard's owned rows
  ([-1, Hloc-2] for the restriction kernels, whose coverage overlaps one
  row), so ``psum`` over the axis reproduces the single-device norm up to
  summation order.
- **Restriction/prolongation are shard-local.**  ``Hloc`` halves with the
  level (coarse shard boundaries sit exactly under fine ones), so the fused
  restriction emits the coarse shard directly and only the 1-row halos ride
  ICI.  Levels below ``shard_below`` are agglomerated: one all_gather
  rebuilds the full coarse RHS and the single-device subtree
  (PallasHierarchyV2._coarse_correction — replicated Pallas levels, XLA
  tail, dense direct coarse solve) runs redundantly on every shard; the
  ascent re-slices without communication.

Comm volume per V(1,1) cycle and level: 3 exchanges x ~5 rows x Wp x 4 B
(two u exchanges + the coarse RHS/uc strips) ~ 0.5 MB at 4097^2 vs 850 MB
of HBM traffic — ICI is nowhere near the bottleneck until Hloc approaches R.

The reference has no distributed code (grep-verified); the parallel design
follows SURVEY.md §2.6 and BASELINE.md's weak-scaling target.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.solvers.common import trim_history
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedPallasHierarchyV2:
    """PallasHierarchyV2 distributed over one mesh axis by node rows.

    ``shard_below``: levels with fewer than this many nodes per edge are
    agglomerated (replicated).  Defaults to ``nx * rows`` so the coarsest
    sharded level still has ~one row block per shard.
    """

    def __init__(self, problem: Problem, mesh: Mesh, axis: str = "x",
                 num_levels: Optional[int] = None, omega: float = DEFAULT_OMEGA,
                 pallas_threshold: int = 256, rows: int = 64,
                 rows_coarse: Optional[int] = 32, coarse_rows_below: int = 1024,
                 interpret: Optional[bool] = None, direct_coarse: bool = True,
                 shard_below: Optional[int] = None, base=None,
                 dform: Optional[bool] = None):
        """``base`` injects a prebuilt single-device hierarchy solver with
        the V2 layout contract (.pl PallasLevels, .K, .hier) — used by
        ShardedPallasHMG to share all layout/exchange machinery."""
        self.problem = problem
        self.mesh = mesh
        self.axis = axis
        self.nx = mesh.shape[axis]
        self.base = base if base is not None else PallasHierarchyV2(
            problem, num_levels=num_levels, omega=omega,
            pallas_threshold=pallas_threshold, rows=rows,
            rows_coarse=rows_coarse, coarse_rows_below=coarse_rows_below,
            interpret=interpret, direct_coarse=direct_coarse, dform=dform)
        base = self.base
        levels = base.hier.levels
        if shard_below is None:
            shard_below = self.nx * rows
        # sharded levels 0..S-1 (must be Pallas levels)
        S = 0
        while S < base.K and levels[S].n >= shard_below:
            S += 1
        assert S >= 1, (
            f"finest level n={levels[0].n} below shard_below={shard_below} - "
            "use PallasHierarchyV2 (single device) instead")
        self.S = S
        H0 = levels[0].n_nodes
        # Hloc halves per level => divisible by 2^(S-1); keep it 8-aligned
        # at the coarsest sharded level for clean sublane strips.
        self.Hloc0 = _round_up(-(-H0 // self.nx), 8 << (S - 1))
        self.Wp = base.pl[0].Wp
        # per-level geometry (index l in [0, S]; S = handoff child level)
        self.Hloc, self.HpLoc, self.B = [], [], []
        for l in range(S + 1):
            R = base.pl[l].R
            Hloc = self.Hloc0 >> l
            HpLoc = _round_up(Hloc, R)
            self.Hloc.append(Hloc)
            self.HpLoc.append(HpLoc)
            self.B.append(HpLoc + 2 * R)
        # static per-level bi-material phase stacks (with real ghost rows)
        self.ph_stack = [None] * S
        self.phh_stack = [None] * S
        for l in range(S):
            lv = levels[l]
            if lv.pid is None:
                continue
            phase = np.asarray(problem.phase(lv.n), np.int8)
            self.ph_stack[l] = jnp.asarray(self._stack_elements(l, phase))
            self.phh_stack[l] = jnp.asarray(self._strip_elements(l, phase))
        self._compiled = {}

    # ---- host-side layout builders ----

    def _stack_elements(self, l: int, ph: np.ndarray) -> np.ndarray:
        """(n, n) element bitmap -> (nx*B_l, Wp) stacked local buffers with
        REAL neighbour element rows in the ghost areas."""
        n = ph.shape[0]
        s = self.base.pl[l].s
        R = self.base.pl[l].R
        Hloc, B = self.Hloc[l], self.B[l]
        G = np.zeros((R + self.nx * Hloc + B, self.Wp), np.int8)
        G[R : R + n, 0 : n * s : s] = ph
        out = np.zeros((self.nx * B, self.Wp), np.int8)
        for i in range(self.nx):
            out[i * B : (i + 1) * B] = G[i * Hloc : i * Hloc + B]
        return out

    def _strip_elements(self, l: int, ph: np.ndarray) -> np.ndarray:
        """(nx*8, Wp) stacked phh strips: rows 4..7 = element rows
        g0-4..g0-1, rows 0..2 = element rows g0+Hloc..g0+Hloc+2 (supersets
        of the round-3 rows-5..7 / row-0 convention; the deep rows serve
        the L=1 H-relax legs)."""
        n = ph.shape[0]
        s = self.base.pl[l].s
        Hloc = self.Hloc[l]
        G = np.zeros((4 + self.nx * Hloc + 3, self.Wp), np.int8)
        G[4 : 4 + n, 0 : n * s : s] = ph
        out = np.zeros((self.nx * 8, self.Wp), np.int8)
        for i in range(self.nx):
            g0 = i * Hloc
            out[i * 8 + 4 : i * 8 + 8] = G[g0 : g0 + 4]
            out[i * 8 + 0 : i * 8 + 3] = G[g0 + 4 + Hloc : g0 + 7 + Hloc]
        return out

    def _stack_field(self, l: int, x):
        """Logical (H, W) field -> (nx*B_l, Wp) stacked stride-lane ghost
        buffers (inside jit)."""
        p = self.base.pl[l]
        H = p.H
        Hloc, HpLoc, B = self.Hloc[l], self.HpLoc[l], self.B[l]
        xp = jnp.zeros((self.nx * Hloc, self.Wp), p.dtype)
        xp = xp.at[:H, 0 : p.W * p.s : p.s].set(x.astype(p.dtype))
        xp = xp.reshape(self.nx, Hloc, self.Wp)
        xp = jnp.pad(xp, ((0, 0), (p.R, B - Hloc - p.R), (0, 0)))
        return xp.reshape(self.nx * B, self.Wp)

    def _unstack_field(self, l: int, xs):
        p = self.base.pl[l]
        Hloc, B = self.Hloc[l], self.B[l]
        x = xs.reshape(self.nx, B, self.Wp)[:, p.R : p.R + Hloc, :]
        x = x.reshape(self.nx * Hloc, self.Wp)
        return x[: p.H, 0 : (p.W - 1) * p.s + 1 : p.s]

    # ---- shard-local building blocks (run inside shard_map) ----

    def _exchange(self, buf, l: int):
        """ppermute the 4-row north / 4-row south halos of a level-l local
        buffer.  Returns (buf with the 4 south-halo rows written just past
        the data, (8, Wp) strip with rows 4..7 = north's last 4 rows and
        rows 0..3 = south's first 4 rows); global edges get zeros.

        Depth 4 serves every kernel family: the plain V-cycle legs read
        rows 5..7 / 0..1 (a subset — round-3 behaviour unchanged), the
        L=1 H-relax legs read rows 4..7 / 0..3 (hswrr's D+2 = 4-deep
        windows)."""
        ax = self.axis
        R = self.base.pl[l].R
        Hloc = self.Hloc[l]
        nx = jax.lax.axis_size(ax)
        ix = jax.lax.axis_index(ax)

        def pperm(x, shift):
            perm = [(i, (i + shift) % nx) for i in range(nx)]
            return jax.lax.ppermute(x, ax, perm)

        north = pperm(jax.lax.dynamic_slice(
            buf, (R + Hloc - 4, 0), (4, self.Wp)), 1)
        south = pperm(jax.lax.dynamic_slice(buf, (R, 0), (4, self.Wp)), -1)
        north = jnp.where(ix == 0, 0.0, north)
        south = jnp.where(ix == nx - 1, 0.0, south)
        strip = jnp.zeros((8, self.Wp), buf.dtype)
        strip = jax.lax.dynamic_update_slice(strip, south, (0, 0))
        strip = jax.lax.dynamic_update_slice(strip, north, (4, 0))
        buf = jax.lax.dynamic_update_slice(buf, south, (R + Hloc, 0))
        return buf, strip

    def _bounds(self, l: int, ix):
        lv = self.base.hier.levels[l]
        H = lv.n_nodes
        Hc = (H - 1) // 2 + 1
        Hloc = self.Hloc[l]
        Hloc_c = Hloc // 2
        g0 = ix * Hloc
        g0c = ix * Hloc_c
        return jnp.stack([
            1 - g0, jnp.minimum(H - 2 - g0, Hloc),
            1 - g0c, jnp.minimum(Hc - 2 - g0c, Hloc_c),
        ]).astype(jnp.int32)

    def _zeros_loc(self, l: int):
        return jnp.zeros((self.B[l], self.Wp), self.base.pl[0].dtype)

    def _coarse_correction(self, l: int, fcb, nu1: int, nu2: int, ix):
        """Distributed analogue of PallasHierarchyV2._coarse_correction.
        ``fcb`` is this level's LOCAL RHS buffer.  Returns (uc_local,
        uc_strip) ready for the PARENT's psweep."""
        base = self.base
        if l < self.S:
            p = base.pl[l]
            bnd = self._bounds(l, ix)
            ph = self.ph_stack[l]
            phh = self.phh_stack[l]
            fcb, fstrip = self._exchange(fcb, l)
            if nu1 == 1:
                # zero-initial-guess fast path (same kernels as the
                # single-device V2 — u1 recomputed pointwise, never stored,
                # and NO u halo exchanges at all on this level)
                fcc = p.zsweep_restrict(fcb, fh=fstrip, phh=phh, bnd=bnd,
                                        out_rows=self.B[l + 1], ph_pad=ph)
                uc, ucstrip = self._coarse_correction(l + 1, fcc, nu1, nu2, ix)
                cur = p.zpsweep(fcb, uc, dst=self._zeros_loc(l), fh=fstrip,
                                phh=phh, uch=ucstrip, bnd=bnd, ph_pad=ph)
                spare = None
                for _ in range(nu2 - 1):
                    cb, uh = self._exchange(cur, l)
                    spare = self._zeros_loc(l) if spare is None else spare
                    cur, spare = p.sweep(cb, fcb, dst=spare, uh=uh, bnd=bnd,
                                         ph_pad=ph, own_rows=self.Hloc[l])[0], cb
                return self._exchange_uc(cur, l)
            cur, spare = self._zeros_loc(l), self._zeros_loc(l)
            fresh = True  # zero iterate: halos are zeros, skip the exchange
            for _ in range(nu1 - 1):
                cb, uh = (cur, None) if fresh else self._exchange(cur, l)
                fresh = False
                cur, spare = p.sweep(cb, fcb, dst=spare, uh=uh, bnd=bnd,
                                     ph_pad=ph, own_rows=self.Hloc[l])[0], cb
            cb, uh = (cur, None) if fresh else self._exchange(cur, l)
            out, fcc, _ = p.sweep_restrict(
                cb, fcb, dst=spare, uh=uh, fh=fstrip, phh=phh, bnd=bnd,
                out_rows=self.B[l + 1], own_rows=self.Hloc[l], ph_pad=ph)
            cur, spare = out, cb
            # HALO/COMPUTE OVERLAP: issue the psweep's u-halo exchange NOW —
            # it depends only on the pre-smoothed iterate, not on the coarse
            # correction, so the ppermutes ride ICI underneath the entire
            # coarse subtree below this level.
            cb, uh = self._exchange(cur, l)
            uc, ucstrip = self._coarse_correction(l + 1, fcc, nu1, nu2, ix)
            out, _ = p.psweep(cb, fcb, uc, dst=spare, uh=uh, uch=ucstrip,
                              bnd=bnd, ph_pad=ph, own_rows=self.Hloc[l])
            cur, spare = out, cb
            for _ in range(nu2 - 1):
                cb, uh = self._exchange(cur, l)
                cur, spare = p.sweep(cb, fcb, dst=spare, uh=uh, bnd=bnd,
                                     ph_pad=ph, own_rows=self.Hloc[l])[0], cb
            return self._exchange_uc(cur, l)
        return self._agglomerate(
            l, fcb, lambda buf: base._coarse_correction(l, buf, nu1, nu2),
            ix)

    def _agglomerate(self, l: int, fcb, solve_fn, ix):
        """Gather the full coarse RHS, run the single-device subtree
        redundantly via ``solve_fn(buf) -> uc_full``, re-slice without
        communication."""
        base = self.base
        pS = base.pl[l]
        R = pS.R
        Hloc = self.Hloc[l]
        data = jax.lax.dynamic_slice(fcb, (R, 0), (Hloc, self.Wp))
        full = jax.lax.all_gather(data, self.axis, axis=0, tiled=True)
        HS = base.hier.levels[l].n_nodes
        buf = jnp.zeros(pS.buf_shape, fcb.dtype)
        buf = jax.lax.dynamic_update_slice(buf, full[:HS], (R, 0))
        uc_full = solve_fn(buf)
        # slice this shard's rows [-3, Hloc+2) out of the replicated result
        # (bottom padding sized so the LAST shard's window stays in bounds
        # even when nx*Hloc overshoots the global padded row count)
        nx_tot = self.nx
        pad_bot = max(8, nx_tot * Hloc + R + 16 - uc_full.shape[0])
        padded = jnp.pad(uc_full, ((8, pad_bot), (0, 0)))
        ix_ = (ix * Hloc + R + 8 - 3).astype(jnp.int32)
        win = jax.lax.dynamic_slice(padded, (ix_, jnp.int32(0)),
                                    (Hloc + 5, self.Wp))
        north = jnp.where(ix == 0, 0.0, win[0:3])
        south = win[Hloc + 3 : Hloc + 5]
        strip = jnp.zeros((8, self.Wp), fcb.dtype)
        strip = jax.lax.dynamic_update_slice(strip, south, (0, 0))
        strip = jax.lax.dynamic_update_slice(strip, north, (5, 0))
        uc_loc = jnp.zeros((self.B[l], self.Wp), fcb.dtype)
        uc_loc = jax.lax.dynamic_update_slice(uc_loc, win[3:], (R, 0))
        uc_loc = jax.lax.dynamic_update_slice(uc_loc, north, (R - 3, 0))
        return uc_loc, strip

    def _exchange_uc(self, uc, l: int):
        """Exchange a finished level-l correction for the parent's psweep."""
        return self._exchange(uc, l)

    def _cycle0(self, u, sp, fb, fstrip, nu1: int, nu2: int, ix):
        base = self.base
        p = base.pl[0]
        bnd = self._bounds(0, ix)
        ph = self.ph_stack[0]
        phh = self.phh_stack[0]
        cur, spare, rsq = u, sp, None
        for _ in range(nu1 - 1):
            cb, uh = self._exchange(cur, 0)
            out, r = p.sweep(cb, fb, dst=spare, uh=uh, bnd=bnd, ph_pad=ph,
                             own_rows=self.Hloc[0])
            rsq = r if rsq is None else rsq
            cur, spare = out, cb
        cb, uh = self._exchange(cur, 0)
        out, fc, r = p.sweep_restrict(
            cb, fb, dst=spare, uh=uh, fh=fstrip, phh=phh, bnd=bnd,
            out_rows=self.B[1], own_rows=self.Hloc[0], ph_pad=ph)
        rsq = r if rsq is None else rsq
        cur, spare = out, cb
        # overlap: the psweep's u-halo exchange is independent of the coarse
        # correction — issue it before recursing so it hides under the
        # whole coarse subtree (see _coarse_correction)
        cb, uh = self._exchange(cur, 0)
        uc, ucstrip = self._coarse_correction(1, fc, nu1, nu2, ix)
        out, _ = p.psweep(cb, fb, uc, dst=spare, uh=uh, uch=ucstrip,
                          bnd=bnd, ph_pad=ph, own_rows=self.Hloc[0])
        cur, spare = out, cb
        for _ in range(nu2 - 1):
            cb, uh = self._exchange(cur, 0)
            cur, spare = p.sweep(cb, fb, dst=spare, uh=uh, bnd=bnd,
                                 ph_pad=ph, own_rows=self.Hloc[0])[0], cb
        return cur, spare, jax.lax.psum(rsq, self.axis)

    # ---- solve entry point ----

    def solve(self, f, u0=None, bc_value=None, nu1: int = 1, nu2: int = 1,
              eps: float = 1e-6, max_cycles: int = 100):
        """Distributed V-cycle solve; same protocol/semantics as
        PallasHierarchyV2.solve (one compiled call, free-residual history,
        one host fetch)."""
        base = self.base
        lv0 = base.hier.finest
        H = lv0.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), base.pl[0].dtype)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        key = ("solve", nu1, nu2, float(eps), max_cycles)
        if key not in self._compiled:
            ax = self.axis
            ph_ins = [x for x in (self.ph_stack + self.phh_stack)
                      if x is not None]
            n_ph = len(ph_ins)

            def shard_body(ub, fb, *phs):
                # rebind the static phase stacks to their shard-local views
                it = iter(phs)
                ph_loc = [next(it) if x is not None else None
                          for x in self.ph_stack]
                phh_loc = [next(it) if x is not None else None
                           for x in self.phh_stack]
                saved = (self.ph_stack, self.phh_stack)
                self.ph_stack, self.phh_stack = ph_loc, phh_loc
                try:
                    ix = jax.lax.axis_index(ax)
                    fb, fstrip = self._exchange(fb, 0)
                    hist0 = jnp.full((max_cycles + 1,), -1.0, jnp.float32)

                    def cond(c):
                        u, sp, k, res, hist = c
                        return (res > eps) & (k < max_cycles)

                    def body(c):
                        u, sp, k, res, hist = c
                        u, sp, rsq = self._cycle0(u, sp, fb, fstrip,
                                                  nu1, nu2, ix)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                        return (u, sp, k + 1, res, hist.at[k].set(res))

                    u, sp, k, res, hist = jax.lax.while_loop(
                        cond, body,
                        (ub, jnp.zeros_like(ub), jnp.int32(0),
                         jnp.float32(jnp.inf), hist0))
                    return u, hist
                finally:
                    self.ph_stack, self.phh_stack = saved

            sharded = shard_map(
                shard_body, mesh=self.mesh,
                in_specs=(P(ax, None), P(ax, None)) + (P(ax, None),) * n_ph,
                out_specs=(P(ax, None), P()),
                check_vma=False)

            @jax.jit
            def run(u0_plain, f_plain):
                ub = self._stack_field(0, u0_plain)
                fb = self._stack_field(0, f_plain)
                u, hist = sharded(ub, fb, *ph_ins)
                return self._unstack_field(0, u), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f)
        return u, trim_history(hist, eps)


class ShardedPallasHMG(ShardedPallasHierarchyV2):
    """H-MG (learned H-Net smoother) distributed over one mesh axis by node
    rows (round 5; VERDICT r4 item #7 — the H-relax legs were single-device
    only in round 4).

    Cycle structure per level: hswrr (fused H-relax + residual + x4 FW
    restriction, 4-deep halo windows riding the depth-4 exchange strips) +
    phrelax (prolongation-add + H-relax).  Coarse H levels run the
    from-zero hswrr + phrelax pair (the coarse_zero_legs=False flavour —
    measured FASTER than the z-legs on chip, docs/kernel_notes_r4.md
    finding 2 — and the only pair with shard halo support).  Levels below
    ``shard_below`` agglomerate into the single-device PallasHMG subtree
    exactly like the plain sharded path.

    L=1 H-Net chains only (the production config since round 4): deeper
    chains need halo windows beyond the 8-row strips."""

    def __init__(self, problem: Problem, mesh: Mesh, axis: str = "x",
                 num_levels: Optional[int] = None, omega=None,
                 pallas_threshold: int = 256, rows: int = 64,
                 rows_coarse: Optional[int] = 32,
                 coarse_rows_below: int = 1024,
                 interpret: Optional[bool] = None,
                 direct_coarse: bool = False,
                 shard_below: Optional[int] = None):
        from multigrid_feanet_tpu.solvers.hmg import PallasHMG

        base = PallasHMG(problem, num_levels=num_levels,
                         pallas_threshold=pallas_threshold, rows=rows,
                         rows_coarse=rows_coarse,
                         coarse_rows_below=coarse_rows_below, omega=omega,
                         interpret=interpret, direct_coarse=direct_coarse,
                         coarse_zero_legs=False)
        super().__init__(problem, mesh, axis=axis, num_levels=num_levels,
                         pallas_threshold=pallas_threshold, rows=rows,
                         rows_coarse=rows_coarse,
                         coarse_rows_below=coarse_rows_below,
                         interpret=interpret, shard_below=shard_below,
                         base=base)

    def _bounds_h(self, l: int, ix, L: int = 1):
        """V2 bounds with the fine updatable-row cap extended by the conv
        chain depth: the H-chain consumes NEIGHBOURS' jac increments, so a
        shard must compute jac/corr on +L overlap rows past its own seam
        (the mask would otherwise zero corr(Hloc+1), poisoning the chain
        at the last owned row).  The depth-4 halo strips carry exactly the
        rows this needs for L = 1."""
        lv = self.base.hier.levels[l]
        b = self._bounds(l, ix)
        g0 = ix * self.Hloc[l]
        hi = jnp.minimum(lv.n_nodes - 2 - g0, self.Hloc[l] + L)
        return b.at[1].set(hi.astype(jnp.int32))

    def _h_coarse_correction(self, l: int, fcb, params, ix):
        """Distributed H-MG error-equation solve from zero at level l;
        returns (uc_local, uc_strip) for the parent's phrelax."""
        from multigrid_feanet_tpu.ops.pallas_hrelax import hswrr, phrelax

        base = self.base
        if l < self.S:
            p = base.pl[l]
            bnd = self._bounds_h(l, ix)
            ph = self.ph_stack[l]
            phh = self.phh_stack[l]
            fcb, fstrip = self._exchange(fcb, l)
            # from-zero descent: the zero iterate needs no u exchange
            cur, spare = self._zeros_loc(l), self._zeros_loc(l)
            out, fcc, _ = hswrr(p, cur, fcb, params, dst=spare, bnd=bnd,
                                uh=None, fh=fstrip, phh=phh,
                                out_rows=self.B[l + 1],
                                own_rows=self.Hloc[l], ph_pad=ph)
            cur, spare = out, cur
            # overlap: u1's halo exchange rides under the coarse subtree
            cb, uh = self._exchange(cur, l)
            uc, ucstrip = self._h_coarse_correction(l + 1, fcc, params, ix)
            u3 = phrelax(p, cb, fcb, uc, params, dst=spare, bnd=bnd, uh=uh,
                         fh=fstrip, phh=phh, uch=ucstrip, ph_pad=ph)
            return self._exchange(u3, l)
        return self._agglomerate(
            l, fcb, lambda buf: self.base._coarse_correction(l, buf, params),
            ix)

    def _h_cycle0(self, u, sp, fb, fstrip, params, ix):
        from multigrid_feanet_tpu.ops.pallas_hrelax import hswrr, phrelax

        base = self.base
        p = base.pl[0]
        bnd = self._bounds_h(0, ix)
        ph = self.ph_stack[0]
        phh = self.phh_stack[0]
        cb, uh = self._exchange(u, 0)
        out, fc, rsq = hswrr(p, cb, fb, params, dst=sp, bnd=bnd, uh=uh,
                             fh=fstrip, phh=phh, out_rows=self.B[1],
                             own_rows=self.Hloc[0], ph_pad=ph)
        cur, spare = out, cb
        # overlap: phrelax's u1 exchange is independent of the coarse
        # correction — issue it before recursing
        cb2, uh2 = self._exchange(cur, 0)
        uc, ucstrip = self._h_coarse_correction(1, fc, params, ix)
        u3 = phrelax(p, cb2, fb, uc, params, dst=spare, bnd=bnd, uh=uh2,
                     fh=fstrip, phh=phh, uch=ucstrip, ph_pad=ph)
        return u3, cb2, jax.lax.psum(rsq, self.axis)

    def solve(self, params, f, u0=None, bc_value=0.0, eps: float = 5e-5,
              max_cycles: int = 100):
        """Distributed H-MG solve; same protocol as PallasHMG.solve (free
        pre-relax residual history, one compiled call, one host fetch)."""
        base = self.base
        lv0 = base.hier.finest
        H = lv0.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), base.pl[0].dtype)
        u0 = reset_boundary(u0, lv0.geo, bc_value)

        key = ("hsolve", float(eps), max_cycles, f.shape)
        if key not in self._compiled:
            ax = self.axis
            ph_ins = [x for x in (self.ph_stack + self.phh_stack)
                      if x is not None]

            def shard_body(ub, fb, params, *phs):
                it = iter(phs)
                ph_loc = [next(it) if x is not None else None
                          for x in self.ph_stack]
                phh_loc = [next(it) if x is not None else None
                           for x in self.phh_stack]
                saved = (self.ph_stack, self.phh_stack)
                self.ph_stack, self.phh_stack = ph_loc, phh_loc
                try:
                    ix = jax.lax.axis_index(ax)
                    fb, fstrip = self._exchange(fb, 0)
                    hist0 = jnp.full((max_cycles + 1,), -1.0, jnp.float32)

                    def cond(c):
                        u, sp, k, res, hist = c
                        return (res > eps) & (k < max_cycles)

                    def body(c):
                        u, sp, k, res, hist = c
                        u, sp, rsq = self._h_cycle0(u, sp, fb, fstrip,
                                                    params, ix)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                        return (u, sp, k + 1, res, hist.at[k].set(res))

                    u, sp, k, res, hist = jax.lax.while_loop(
                        cond, body,
                        (ub, jnp.zeros_like(ub), jnp.int32(0),
                         jnp.float32(jnp.inf), hist0))
                    return u, hist
                finally:
                    self.ph_stack, self.phh_stack = saved

            n_ph = len(ph_ins)
            sharded = shard_map(
                shard_body, mesh=self.mesh,
                in_specs=(P(ax, None), P(ax, None), P())
                + (P(ax, None),) * n_ph,
                out_specs=(P(ax, None), P()),
                check_vma=False)

            @jax.jit
            def run(u0_plain, f_plain, params):
                ub = self._stack_field(0, u0_plain)
                fb = self._stack_field(0, f_plain)
                u, hist = sharded(ub, fb, params, *ph_ins)
                return self._unstack_field(0, u), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f, jnp.asarray(params))
        return u, trim_history(hist, eps)
