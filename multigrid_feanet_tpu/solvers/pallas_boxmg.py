"""Fully-fused Pallas BoxMG solver — operator-induced transfers + Galerkin
coarse operators at production scale (round 5; VERDICT r4 "industrialize
BoxMG" item #1).

The hierarchy: level 0 keeps the EXACT bi-material element-phase operator
(int8 stream, pallas_sweep kernels for plain sweeps); every coarse level
is a Galerkin product P^T A P with a spatially-varying 9-point stencil
(9-plane stream); all transfers are the operator-induced W4 pairs.  Setup
(ops/boxmg.py) runs in ONE jitted device program — no probe dispatch
storm, no host round-trips; kernels are ops/pallas_general.py.

Cycle structure mirrors solvers/pallas_mg2.PallasHierarchyV2 exactly
(donation ping-pong, free pre-sweep residual as the convergence test, one
compiled while_loop per solve, chunked eps tests, XLA handoff below
``pallas_threshold`` with a dense direct coarse solve), so the two
solvers are drop-in interchangeable; only the transfer/coarse-operator
math differs.  Convergence anchor: the bi-material interface problem,
where bilinear transfers kink across the 20:1 jump (plain V(1,1) tail
q = 0.61 at 2049^2, measured on chip) and the operator-induced hierarchy
restores homogeneous-problem factors (q ~ 0.30-0.32 at research scale —
ops/adaptive_transfer.py, results/adaptive_transfer/summary.json).

``coef_dtype=jnp.bfloat16`` stores the S9/W4 coefficient streams (the
dominant HBM traffic of general levels) in bfloat16: transfers and coarse
operators are preconditioner-side, so storage rounding perturbs the cycle
but NOT the fixed point — the convergence test rides level 0's exact
f32 residual.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import boxmg
from multigrid_feanet_tpu.ops.pallas_general import GeneralPallasLevel
from multigrid_feanet_tpu.solvers.common import trim_history
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA


class PallasBoxMG:
    """BoxMG hierarchy on the fused general-stencil Pallas kernels.

    ``setup`` optionally injects precomputed ``boxmg.boxmg_setup`` output
    (e.g. f64-computed weights cast down, or to reuse across solvers).
    """

    def __init__(self, problem: Problem, num_levels: Optional[int] = None,
                 omega: float = DEFAULT_OMEGA, pallas_threshold: int = 256,
                 rows: int = 64, rows_coarse: Optional[int] = 32,
                 coarse_rows_below: int = 1024,
                 interpret: Optional[bool] = None, direct_coarse: bool = True,
                 dtype=jnp.float32, coef_dtype=jnp.float32,
                 hier: Optional[GridHierarchy] = None, setup=None):
        self.problem = problem
        self.hier = hier if hier is not None else GridHierarchy.create(
            problem, num_levels)
        self.omega = float(omega)
        levels = self.hier.levels
        L = self.hier.num_levels if num_levels is None else num_levels
        self.L = L
        self.setup = (setup if setup is not None
                      else boxmg.boxmg_setup(self.hier, L, dtype=jnp.float32))
        assert len(self.setup) == L - 1
        K = 0
        while K < L - 1 and levels[K].n >= pallas_threshold:
            K += 1
        assert K >= 1, "finest level below pallas_threshold — use the XLA BoxMG"
        self.K = K

        def _rows_for(n_level: int) -> int:
            if rows_coarse is None or n_level >= coarse_rows_below:
                return rows
            return rows_coarse

        Wp = None
        self.pl = []
        for l in range(min(K + 1, L)):
            lv = levels[l]
            R_l = _rows_for(lv.n)
            R_next = _rows_for(levels[l + 1].n) if l + 1 < L else R_l
            w4 = self.setup[l][0] if l < L - 1 else None
            if l == 0:
                p = GeneralPallasLevel(
                    lv.n, stride=1, phase=problem.phase(lv.n),
                    coefficients=problem.coefficients, w4=w4, omega=omega,
                    Wp=Wp, rows=R_l, rows_next=R_next, interpret=interpret,
                    dtype=dtype, coef_dtype=coef_dtype)
            else:
                p = GeneralPallasLevel(
                    lv.n, stride=1 << l, s9=self.setup[l - 1][1], w4=w4,
                    omega=omega, Wp=Wp, rows=R_l, rows_next=R_next,
                    interpret=interpret, dtype=dtype, coef_dtype=coef_dtype)
            Wp = p.Wp
            self.pl.append(p)

        # XLA subtree state (compact): per-level stencil fields + masks
        self._S = [None] + [self.setup[l][1] for l in range(L - 1)]
        self._geo = [levels[l].geo if l < self.hier.num_levels else None
                     for l in range(L)]
        self.coarse_inv = None
        if direct_coarse and L > 1:
            from multigrid_feanet_tpu.ops.adaptive_transfer import (
                GeneralLevel, general_coarse_inverse)

            cl = GeneralLevel(np.asarray(jax.device_get(self._S[L - 1]),
                                         np.float64), self._geo[L - 1])
            if cl.n >= 2:
                self.coarse_inv = general_coarse_inverse(cl, jnp.float32)
        # Every large device array the compiled solves touch is threaded
        # through the jitted programs as an ARGUMENT pytree — closed-over
        # arrays become inline HLO constants, and at 4097^2 the plane
        # stacks total ~1 GB (the remote-compile tunnel rejects such
        # programs with HTTP 413; constants also ship per program).
        self._bufs = (tuple(p.op_pad for p in self.pl),
                      tuple(p.w4_pad for p in self.pl),
                      tuple(self.setup))
        self._compiled = {}

    # ---- XLA subtree (compact layout, levels K..L-1) ----

    def _xla_relax(self, l: int, u, f, steps: int, xst):
        S, geo = xst[l - 1][1], self._geo[l]
        d = S[..., 1, 1]
        for _ in range(steps):
            r = (f - boxmg.apply_s9(S, u)) * geo
            u = u + (self.omega / d) * r
        return u

    def _xla_vcycle(self, l: int, u, f, nu1: int, nu2: int, xst):
        """``xst`` = the setup list ((W4_l, Sc_{l+1}) per level) threaded
        as a jit argument (see _bufs).  Only called with l >= 1 (level 0
        is always a Pallas level)."""
        L = self.L
        if l == L - 1 and l > 0 and self.coarse_inv is not None:
            from multigrid_feanet_tpu.solvers.coarse import coarse_solve

            return coarse_solve(self.coarse_inv, f).astype(f.dtype)
        u = self._xla_relax(l, u, f, nu1, xst)
        if l < L - 1:
            W4 = xst[l][0]
            r = (f - boxmg.apply_s9(xst[l - 1][1], u)) * self._geo[l]
            f_c = boxmg.restrict_w4(r, W4)
            u_c = self._xla_vcycle(l + 1, jnp.zeros_like(f_c), f_c, nu1,
                                   nu2, xst)
            u = u + boxmg.prolong_w4(u_c, W4)
        return self._xla_relax(l, u, f, nu2, xst)

    # ---- fused Pallas V-cycle over buffers ----

    def _coarse_correction(self, l: int, fcb, nu1: int, nu2: int, bufs):
        """Solve the level-l error equation from a zero initial guess.
        ``bufs`` = (op_pads, w4_pads, xst) — the plane buffers as traced
        arguments."""
        ops, w4s, xst = bufs
        if l < self.K:
            p = self.pl[l]
            kw = dict(op_pad=ops[l], w4_pad=w4s[l])
            skw = dict(op_pad=ops[l])
            if nu1 == 1 and not p.bim:
                fcc = p.zwrr(fcb, **kw)
                uc = self._coarse_correction(l + 1, fcc, nu1, nu2, bufs)
                cur = p.zpsweep(fcb, uc, **kw)
                spare = None
                for _ in range(nu2 - 1):
                    spare = p.zeros() if spare is None else spare
                    cur, spare = p.sweep(cur, fcb, dst=spare, **skw)[0], cur
                return cur
            cur, spare = p.zeros(), p.zeros()
            for _ in range(nu1 - 1):
                cur, spare = p.sweep(cur, fcb, dst=spare, **skw)[0], cur
            out, fcc, _ = p.swrr(cur, fcb, dst=spare, **kw)
            cur, spare = out, cur
            uc = self._coarse_correction(l + 1, fcc, nu1, nu2, bufs)
            out = p.psweep(cur, fcb, uc, dst=spare, **kw)
            cur, spare = out, cur
            for _ in range(nu2 - 1):
                cur, spare = p.sweep(cur, fcb, dst=spare, **skw)[0], cur
            return cur
        p = self.pl[l]
        f_plain = p.unpad(fcb).astype(jnp.float32)
        u_plain = self._xla_vcycle(l, jnp.zeros_like(f_plain), f_plain,
                                   nu1, nu2, xst)
        return p.pad(u_plain)

    def _cycle0(self, u, sp, fb, nu1: int, nu2: int, bufs):
        """One V(nu1, nu2) cycle at level 0; returns (u', spare', rsq_pre)
        with ``rsq_pre`` the free squared residual of the INCOMING u."""
        ops, w4s, _ = bufs
        p = self.pl[0]
        kw = dict(op_pad=ops[0], w4_pad=w4s[0])
        skw = dict(op_pad=ops[0])
        cur, spare, rsq = u, sp, None
        for _ in range(nu1 - 1):
            out, r = p.sweep(cur, fb, dst=spare, **skw)
            rsq = r if rsq is None else rsq
            cur, spare = out, cur
        out, fc, r = p.swrr(cur, fb, dst=spare, **kw)
        rsq = r if rsq is None else rsq
        cur, spare = out, cur
        uc = self._coarse_correction(1, fc, nu1, nu2, bufs)
        out = p.psweep(cur, fb, uc, dst=spare, **kw)
        cur, spare = out, cur
        for _ in range(nu2 - 1):
            cur, spare = p.sweep(cur, fb, dst=spare, **skw)[0], cur
        return cur, spare, rsq

    # ---- solve entry points (one dispatch, one host sync) ----

    def solve(self, f, u0=None, bc_value=None, nu1: int = 1, nu2: int = 1,
              eps: float = 1e-6, max_cycles: int = 100, chunk: int = 1):
        """V-cycle solve to interior residual ``eps``; identical history
        and extra-cycle semantics to PallasHierarchyV2.solve (the free
        pre-sweep residual detects convergence one cycle late)."""
        lv0, p0 = self.hier.finest, self.pl[0]
        H = lv0.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), p0.dtype)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        key = ("solve", nu1, nu2, float(eps), max_cycles, chunk)
        if key not in self._compiled:

            @jax.jit
            def run(u0_plain, f_plain, bufs):
                u = p0.pad(u0_plain)
                sp = p0.zeros()
                fb = p0.pad(f_plain)
                hist0 = jnp.full((max_cycles + chunk,), -1.0, jnp.float32)

                def cond(c):
                    u, sp, k, res, hist = c
                    return (res > eps) & (k < max_cycles)

                def body(c):
                    u, sp, k, res, hist = c
                    for _ in range(chunk):
                        u, sp, rsq = self._cycle0(u, sp, fb, nu1, nu2, bufs)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                        hist = hist.at[k].set(res)
                        k = k + 1
                    return (u, sp, k, res, hist)

                u, sp, k, res, hist = jax.lax.while_loop(
                    cond, body,
                    (u, sp, jnp.int32(0), jnp.float32(jnp.inf), hist0))
                return p0.unpad(u), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f, self._bufs)
        return u, trim_history(hist, eps)

    def solve_pcg(self, f, u0=None, bc_value=None, nu1: int = 1,
                  nu2: int = 1, eps: float = 1e-6, max_iters: int = 60):
        """Flexible-CG accelerated solve with one BoxMG V(nu1, nu2) cycle as
        the preconditioner — PR+ beta, residual replacement, and breakdown
        guards, all identical to pallas_mg2.solve_pcg (the plain-MG twin)."""
        lv0, p0 = self.hier.finest, self.pl[0]
        if u0 is None:
            u0 = jnp.zeros_like(f)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        key = ("pcg", nu1, nu2, float(eps), max_iters)
        if key not in self._compiled:

            def dot(a, b):
                return jnp.sum(a * b)

            @jax.jit
            def run(u0_plain, f_plain, bufs):
                ub = p0.pad(u0_plain)
                fb = p0.pad(f_plain)
                rb, rsq0 = p0.residual(ub, fb, op_pad=bufs[0][0])
                zb = self._coarse_correction(0, rb, nu1, nu2, bufs)
                pb = zb
                rz = dot(p0.unpad(zb), p0.unpad(rb))
                hist0 = jnp.full((max_iters,), -1.0, jnp.float32)

                def cond(c):
                    ub, rb, pb, rz, k, res, best, hist = c
                    return ((res > eps) & (k < max_iters) & (rz > 0.0)
                            & (res < 4.0 * best))

                def body(c):
                    ub, rb, pb, rz, k, res, best, hist = c
                    apb, _ = p0.residual(pb, p0.zeros(), op_pad=bufs[0][0])
                    apb = -apb
                    pap = dot(p0.unpad(pb), p0.unpad(apb))
                    alpha = rz / pap
                    ub = ub + alpha * pb
                    r_old = p0.unpad(rb)
                    rb, rsq = p0.residual(ub, fb, op_pad=bufs[0][0])
                    res = jnp.sqrt(rsq).astype(jnp.float32)
                    zb = self._coarse_correction(0, rb, nu1, nu2, bufs)
                    z_pl = p0.unpad(zb)
                    rz_new = dot(z_pl, p0.unpad(rb))
                    beta = jnp.maximum((rz_new - dot(z_pl, r_old)) / rz, 0.0)
                    pb = zb + beta * pb
                    return (ub, rb, pb, rz_new, k + 1, res,
                            jnp.minimum(best, res), hist.at[k].set(res))

                ub, rb, pb, rz, k, res, best, hist = jax.lax.while_loop(
                    cond, body,
                    (ub, rb, pb, rz, jnp.int32(0),
                     jnp.sqrt(rsq0).astype(jnp.float32),
                     jnp.float32(jnp.inf), hist0))
                return p0.unpad(ub), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f, self._bufs)
        vals = np.asarray(hist)
        return u, vals[: int(np.sum(vals >= 0.0))]
