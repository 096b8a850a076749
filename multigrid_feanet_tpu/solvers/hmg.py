"""Fused whole-solve multigrid with the learned H-Net smoother.

The reference's headline capability (M-FEANet-mg_test.ipynb cells 21-24):
V-cycles whose smoother is the H-corrected Jacobi iteration, 9 -> 5 cycles
on IsoPoisson 129^2.  experiments/mg_test.py originally dispatched one jit
per cycle (~30 ms tunnel latency each — dispatch-dominated at any size);
this module compiles the ENTIRE solve into one while_loop with the same
free-residual history/one-host-fetch structure as
solvers/pallas_mg2.PallasHierarchyV2.solve.

Smoother and cycle math are identical to experiments/mg_test.py::mg_solve
(reference mg_test cell 19 MultiGrid): classical 1-channel transfers,
relax-per-level = one Jacobi or H-Jacobi sweep.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import GridHierarchy
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi
from multigrid_feanet_tpu.solvers.common import instance_cache, trim_history


def _cycle(hier, params, u, f, bc_value, mode, nu1, nu2, level=0):
    lv = hier.levels[level]
    bc = bc_value if level == 0 else 0.0

    def relax(u, k):
        if mode == "hjac":
            return hnet.h_relax(lv, params, u, f, k, bc)
        for _ in range(k):
            u = jacobi.jacobi_step(lv, u, f, bc)
        return u

    u = relax(u, nu1)
    if level < hier.num_levels - 1:
        # NOTE: unmasked residual, matching the original mg_test cycle
        # (reference mg_test cell 19) exactly
        r = f - lv.apply(u)
        f_c = 4.0 * restrict_full_weighting(r)
        u_c = _cycle(hier, params, jnp.zeros_like(f_c), f_c, 0.0, mode,
                     nu1, nu2, level + 1)
        u = u + prolong_bilinear(u_c, lv.geo)
    return relax(u, nu2)


def solve(hier: GridHierarchy, params, f, u0=None, bc_value=0.0,
          nu1: int = 1, nu2: int = 1, eps: float = 5e-5,
          max_cycles: int = 100, mode: str = "hjac"):
    """H-MG (or plain MG) solve as ONE compiled while_loop.

    Returns (u, history) with history[j] = interior residual norm after
    cycle j+1 and len(history) = cycles to reach eps (the reference's
    convention).  One device dispatch, one host fetch.
    """
    lv0 = hier.finest
    if u0 is None:
        u0 = jnp.zeros_like(f)

    compiled = instance_cache(hier)
    key = (mode, nu1, nu2, float(eps), max_cycles, f.shape)
    if key not in compiled:

        @jax.jit
        def run(u, params, f, bc_value):
            hist0 = jnp.full((max_cycles,), -1.0, jnp.float32)

            def cond(c):
                u, k, res, hist = c
                return (res > eps) & (k < max_cycles)

            def body(c):
                u, k, res, hist = c
                u = _cycle(hier, params, u, f, bc_value, mode, nu1, nu2)
                res = jacobi.interior_norm(f - lv0.apply(u)).astype(jnp.float32)
                return (u, k + 1, res, hist.at[k].set(res))

            u, k, res, hist = jax.lax.while_loop(
                cond, body, (u, jnp.int32(0), jnp.float32(jnp.inf), hist0))
            return u, hist

        compiled[key] = run
    u, hist = compiled[key](u0, params, f, jnp.asarray(bc_value, f.dtype))
    # POST-cycle residuals here (no free-residual lag): hist[k] = residual
    # after cycle k+1 directly, so the trim is a plain sentinel cut and the
    # returned u has exactly len(history) cycles (no extra).
    vals = np.asarray(hist)
    k = int(np.sum(vals >= 0.0))
    return u, vals[:k]


class PallasHMG:
    """H-MG with the fused Pallas H-relax smoother at every level with
    n >= pallas_threshold (ops/pallas_hrelax.py): hrelax -> fused
    residual+restriction -> recurse -> prolongation-add (psweep with
    omega=0, i.e. no trailing Jacobi) -> hrelax.  Below the threshold the
    XLA subtree runs the same cycle with hnet.h_relax and interior-masked
    residual transfers; the coarsest level is relax-only (the reference's
    treatment) unless ``direct_coarse``.

    NOTE the transfer convention: residuals are interior-masked, the
    library-wide convention (core solvers, PallasHierarchyV2) — hmg.solve
    above instead reproduces the reference notebook's unmasked-residual
    quirk exactly (mg_test cell 19).  Cycle counts may differ by ~1.
    Convergence test: the free pre-relax residual norm from each cycle's
    first hrelax (same protocol as PallasHierarchyV2.solve, including the
    one-extra-cycle semantics on the returned u)."""

    def __init__(self, problem, num_levels=None, pallas_threshold: int = 256,
                 rows: int = 64, rows_coarse: int = 32,
                 coarse_rows_below: int = 1024, omega=None,
                 interpret=None, direct_coarse: bool = False,
                 h_levels=None, coarse_zero_legs: bool = True,
                 dform: bool = False):
        """``h_levels``: apply the H-relax smoother on levels < h_levels and
        plain weighted Jacobi below (None = every level; params must be
        trained for the chosen prefix — learn/train_hnet.make_decay_step
        ``h_levels``).  ``coarse_zero_legs=False`` routes H coarse levels
        through hswrr-from-zero + phrelax instead of the zero-guess
        zhswrr/zphrelax: more HBM traffic but one conv chain fewer per
        ascent, which measures FASTER on chip (docs/kernel_notes_r4.md
        finding 2 — the deep-window z-legs are compute-bound)."""
        from multigrid_feanet_tpu.core.problem import GridHierarchy
        from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel

        self.hier = GridHierarchy.create(problem, num_levels)
        self.h_levels = (self.hier.num_levels if h_levels is None
                         else int(h_levels))
        self.coarse_zero_legs = bool(coarse_zero_legs)
        # opt-in difference-form residuals for the H legs (round 5; see
        # pallas_sweep._apply_bim_d) — needed for interface problems at
        # 4097^2+ where plain-form rounding destabilizes the cycle; OFF by
        # default (the homogeneous benchmark protocol is plain-form).
        self.dform = bool(dform)
        self.omega = float(omega if omega is not None else jacobi.DEFAULT_OMEGA)
        levels = self.hier.levels
        L = len(levels)
        K = 0
        while K < L - 1 and levels[K].n >= pallas_threshold:
            K += 1
        assert K >= 1
        self.K = K

        def _rows_for(n_level):
            return rows if n_level >= coarse_rows_below else rows_coarse

        Wp = None
        self.pl = []
        for l in range(min(K + 1, L)):
            lv = levels[l]
            phase = problem.phase(lv.n) if lv.pid is not None else None
            p = PallasLevel(lv.n, stride=1 << l, phase=phase,
                            coefficients=problem.coefficients,
                            omega=self.omega, Wp=Wp, rows=_rows_for(lv.n),
                            rows_next=_rows_for(levels[l + 1].n)
                            if l + 1 < L else _rows_for(lv.n),
                            interpret=interpret)
            Wp = p.Wp
            self.pl.append(p)
        self.coarse_inv = None
        if direct_coarse and L > 1:
            from multigrid_feanet_tpu.solvers import coarse as _coarse

            self.coarse_inv = _coarse.coarse_inverse(levels[-1])
        self._compiled = {}

    def _xla_hcycle(self, l, u, f, params):
        levels = self.hier.levels
        L = len(levels)
        lv = levels[l]
        if l == L - 1 and l > 0 and self.coarse_inv is not None:
            from multigrid_feanet_tpu.solvers.coarse import coarse_solve

            return coarse_solve(self.coarse_inv, f).astype(f.dtype)

        def rel(u):
            if l < self.h_levels:
                return hnet.h_relax(lv, params, u, f, 1, 0.0, self.omega)
            return jacobi.jacobi_step(lv, u, f, 0.0, self.omega)

        u = rel(u)
        if l < L - 1:
            r = (f - lv.apply(u)) * lv.geo
            f_c = 4.0 * restrict_full_weighting(r)
            u_c = self._xla_hcycle(l + 1, jnp.zeros_like(f_c), f_c, params)
            u = u + prolong_bilinear(u_c, lv.geo)
        return rel(u)

    def _coarse_correction(self, l, fcb, params):
        """Level-l error-equation solve from zero: zero-initial-guess fused
        descent (zhswrr, 7 B/node) + recurse + zero-initial-guess fused
        ascent (zphrelax, 11 B/node) — plain-MG coarse-leg traffic with the
        learned smoother riding for free in the bandwidth-bound kernels."""
        from multigrid_feanet_tpu.ops.pallas_hrelax import (
            hswrr, phrelax, zhswrr, zphrelax)

        if l < self.K:
            p = self.pl[l]
            if l >= self.h_levels:
                # plain-Jacobi zero-guess legs below the H prefix
                fcc = p.zsweep_restrict(fcb)
                uc = self._coarse_correction(l + 1, fcc, params)
                return p.zpsweep(fcb, uc)
            if self.coarse_zero_legs:
                fcc = zhswrr(p, fcb, params, dform=self.dform)
                uc = self._coarse_correction(l + 1, fcc, params)
                return zphrelax(p, fcb, uc, params, dform=self.dform)
            u1, fcc, _ = hswrr(p, p.zeros(), fcb, params, dst=p.zeros(),
                               dform=self.dform)
            uc = self._coarse_correction(l + 1, fcc, params)
            return phrelax(p, u1, fcb, uc, params, dform=self.dform)
        p = self.pl[l]
        f_plain = p.unpad(fcb)
        u_plain = self._xla_hcycle(l, jnp.zeros_like(f_plain), f_plain, params)
        return p.pad(u_plain)

    def _cycle0(self, u, sp, fb, params):
        """TWO fused kernel passes at level 0 per V(1,1) cycle (was four in
        round 3): hswrr (hrelax + residual + restriction) and phrelax
        (prolongation-add + hrelax).  Even pass count -> the donation
        ping-pong returns both buffers to their while-carry slots."""
        from multigrid_feanet_tpu.ops.pallas_hrelax import hswrr, phrelax

        p = self.pl[0]
        u1, fc, rsq = hswrr(p, u, fb, params, dst=sp, dform=self.dform)
        uc = self._coarse_correction(1, fc, params)
        u3 = phrelax(p, u1, fb, uc, params, dst=u, dform=self.dform)
        return u3, u1, rsq

    def solve(self, params, f, u0=None, bc_value=0.0, eps: float = 5e-5,
              max_cycles: int = 100):
        """One-dispatch H-MG solve; returns (u, history) with the same
        free-residual conventions as PallasHierarchyV2.solve."""
        from multigrid_feanet_tpu.core.geometry import reset_boundary

        lv0, p0 = self.hier.finest, self.pl[0]
        H = lv0.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), p0.dtype)
        u0 = reset_boundary(u0, lv0.geo, bc_value)
        params = jnp.asarray(params, jnp.float32)

        key = (float(eps), max_cycles)
        if key not in self._compiled:

            @jax.jit
            def run(u0_plain, f_plain, params):
                u = p0.pad(u0_plain)
                sp = p0.zeros()
                fb = p0.pad(f_plain)
                hist0 = jnp.full((max_cycles,), -1.0, jnp.float32)

                def cond(c):
                    u, sp, k, res, hist = c
                    return (res > eps) & (k < max_cycles)

                def body(c):
                    u, sp, k, res, hist = c
                    u, sp, rsq = self._cycle0(u, sp, fb, params)
                    res = jnp.sqrt(rsq).astype(jnp.float32)
                    return (u, sp, k + 1, res, hist.at[k].set(res))

                u, sp, k, res, hist = jax.lax.while_loop(
                    cond, body,
                    (u, sp, jnp.int32(0), jnp.float32(jnp.inf), hist0))
                return p0.unpad(u), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f, params)
        return u, trim_history(hist, eps)
