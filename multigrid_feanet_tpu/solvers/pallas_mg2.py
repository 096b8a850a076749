"""Fully-fused Pallas V-cycle solver (round 2).

The round-1 ``PallasHierarchy`` (solvers/pallas_mg.py) spends ~2/3 of each
4097^2 cycle outside the smoother: a separate residual pass, unpad -> XLA
restriction -> re-pad between every pair of Pallas levels, and an XLA
prolongation pass, plus a hidden full-buffer copy per ``while_loop``
iteration that pins each kernel output into its carry slot.  This module
rebuilds the cycle on the round-2 kernels (ops/pallas_sweep.py):

- Every fine level runs three fused kernels per V(1,1) cycle — ``sweep``,
  ``restrict_residual`` (residual + x4 full-weighting emitted directly in
  the coarse level's layout), and ``psweep`` (bilinear prolongation-add
  fused into the first post-smoothing sweep).  No pad/unpad between Pallas
  levels: coarse levels keep the finest level's lane width with data every
  2^l lanes (stride-lane layout), so transfers are in-register lane rolls.
- Carry copies are eliminated by donation ping-pong: each sweep writes into
  a donated spare buffer (``input_output_aliases``), and a V(1,1) cycle
  performs an even number of level-0 sweeps so both buffers return to their
  ``while_loop`` carry slots.
- The convergence test rides the pre-update residual norm emitted free by
  the first pre-smoothing sweep (= the post-cycle residual of the previous
  cycle), so a solve is ONE compiled while_loop with zero extra residual
  passes; the host syncs once per solve.

Below ``pallas_threshold`` the hierarchy hands off to the XLA bitplane ops
(compact layout) with an optional dense-inverse direct solve at the
coarsest level; the handoff pad/unpad uses single-axis strided slices on a
small grid (cheap — see ops/transfer.py notes).

Cycle math is identical to solvers/multigrid.py and hence the reference's
``rec_V_cycle`` (MM_Model_convergence.ipynb cell 3): relax nu1 ->
f_c = 4*FW(residual) -> recurse (zero initial guess) -> add BC-reset
bilinear prolongation -> relax nu2; coarsest level relax-only or direct.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi as jac
from multigrid_feanet_tpu.solvers.common import trim_history
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA


class PallasHierarchyV2:
    """Grid hierarchy whose levels with ``n >= pallas_threshold`` run the
    fused round-2 Pallas kernels in the shared stride-lane layout; smaller
    levels run the XLA bitplane ops in compact layout.

    ``rows`` is the kernel row-block size (ghost-block layout unit) shared
    by all Pallas levels.  Every kernel runs with the PallasLevel-wide
    64 MB scoped-VMEM limit (the Mosaic 16 MB default is marginal at
    rows=64); ``psweep_vmem_mb`` optionally overrides it for the
    prolongation-fused sweep only.
    """

    def __init__(self, problem: Problem, num_levels: Optional[int] = None,
                 omega: float = DEFAULT_OMEGA, pallas_threshold: int = 256,
                 rows: int = 64, interpret: Optional[bool] = None,
                 direct_coarse: bool = True, psweep_vmem_mb: Optional[int] = None,
                 rows_coarse: Optional[int] = 32, coarse_rows_below: int = 1024,
                 hier: Optional[GridHierarchy] = None, coefficients=None,
                 mass_fn=None, dtype=jnp.float32,
                 dform: Optional[bool] = None):
        """``hier``/``coefficients``/``mass_fn`` generalize the solver to any
        phase-affine operator of the form  c * K + M  (stiffness scaled by a
        constant plus a pattern-independent per-element operator): pass the
        prebuilt system hierarchy (drives the XLA subtree + direct coarse
        solve), the scaled ``(c a0, c a1)`` coefficient pair, and a
        ``mass_fn(level) -> (mp, ms, mo) | None`` evaluated per level.  The
        heat theta-system wrapper is ops/heat.py::pallas_heat_hierarchy.

        ``dtype=jnp.bfloat16`` stores the Pallas-level field buffers in
        bfloat16 (compute stays f32 in-kernel; the XLA subtree and the
        direct coarse solve run f32): halves the HBM stream of every fused
        leg — a measured ~1.6x on the homogeneous sweep.  Per-cycle
        rounding injects ~1e-3 relative noise, so use it for the f=0 decay
        protocol (error and iterate shrink together: q degrades only
        ~0.19 -> ~0.20) or as the correction solver inside
        pallas_mg.solve_ir for nonzero f."""
        self.problem = problem
        self.hier = hier if hier is not None else GridHierarchy.create(
            problem, num_levels)
        self.omega = float(omega)
        self.psweep_vmem_mb = psweep_vmem_mb
        levels = self.hier.levels
        L = len(levels)
        # Pallas levels 0..K-1; level K exists as layout-only (handoff).
        K = 0
        while K < L - 1 and levels[K].n >= pallas_threshold:
            K += 1
        assert K >= 1, (
            "finest level is below pallas_threshold - use solvers/multigrid.py "
            "or solvers/pallas_mg.py for small problems")
        self.K = K

        # Row-block schedule: fine levels use ``rows``; levels with
        # n < coarse_rows_below drop to ``rows_coarse`` (their padded row
        # counts round up to the block size, so large blocks waste an
        # increasing fraction of each small level's traffic).
        def _rows_for(n_level: int) -> int:
            if rows_coarse is None or n_level >= coarse_rows_below:
                return rows
            return rows_coarse

        coeffs = (tuple(coefficients) if coefficients is not None
                  else problem.coefficients)
        Wp = None
        self.pl = []
        for l in range(min(K + 1, L)):
            lv = levels[l]
            phase = problem.phase(lv.n) if lv.pid is not None else None
            R_l = _rows_for(lv.n)
            R_next = _rows_for(levels[l + 1].n) if l + 1 < L else R_l
            p = PallasLevel(lv.n, stride=1 << l, phase=phase,
                            coefficients=coeffs, omega=omega,
                            Wp=Wp, rows=R_l, rows_next=R_next,
                            interpret=interpret, dtype=dtype,
                            mass=(mass_fn(lv) if mass_fn is not None else None),
                            dform=dform)
            Wp = p.Wp
            self.pl.append(p)
        self.coarse_inv = None
        if direct_coarse and L > 1:
            from multigrid_feanet_tpu.solvers import coarse as _coarse

            self.coarse_inv = _coarse.coarse_inverse(levels[-1])
        self._compiled = {}

    # ---- XLA subtree (compact layout, levels K..L-1) ----

    def _xla_vcycle(self, l: int, u, f, nu1: int, nu2: int):
        levels = self.hier.levels
        L = len(levels)
        lv = levels[l]
        if l == L - 1 and l > 0 and self.coarse_inv is not None:
            from multigrid_feanet_tpu.solvers.coarse import coarse_solve

            return coarse_solve(self.coarse_inv, f).astype(f.dtype)
        for _ in range(nu1):
            u = jac.jacobi_step(lv, u, f, 0.0, self.omega)
        if l < L - 1:
            r = (f - lv.apply(u)) * lv.geo
            f_c = 4.0 * restrict_full_weighting(r)
            u_c = self._xla_vcycle(l + 1, jnp.zeros_like(f_c), f_c, nu1, nu2)
            u = u + prolong_bilinear(u_c, lv.geo)
        for _ in range(nu2):
            u = jac.jacobi_step(lv, u, f, 0.0, self.omega)
        return u

    # ---- fused Pallas V-cycle over buffers ----

    def _coarse_correction(self, l: int, fcb, nu1: int, nu2: int):
        """Solve the level-(l) error equation from a zero initial guess;
        ``fcb`` is the level-l RHS buffer.  Returns the level-l solution
        buffer (for the parent's psweep)."""
        if l < self.K:
            p = self.pl[l]
            if nu1 == 1:
                # zero-initial-guess fast path: the pre-smoothed iterate
                # u1 = (omega/d) f_c is recomputed pointwise inside both
                # kernels and NEVER stored — 2 applies / 18 B per node for
                # the whole V(1,1) level instead of 3 / 29.
                fcc = p.zsweep_restrict(fcb)
                uc = self._coarse_correction(l + 1, fcc, nu1, nu2)
                cur = p.zpsweep(fcb, uc)
                spare = None
                for _ in range(nu2 - 1):
                    spare = p.zeros() if spare is None else spare
                    cur, spare = p.sweep(cur, fcb, dst=spare)[0], cur
                return cur
            cur, spare = p.zeros(), p.zeros()
            for _ in range(nu1 - 1):
                cur, spare = p.sweep(cur, fcb, dst=spare)[0], cur
            # last pre-smooth fused with residual + restriction
            out, fcc, _ = p.sweep_restrict(cur, fcb, dst=spare)
            cur, spare = out, cur
            uc = self._coarse_correction(l + 1, fcc, nu1, nu2)
            out, _ = p.psweep(cur, fcb, uc, dst=spare,
                              vmem_mb=self.psweep_vmem_mb)
            cur, spare = out, cur
            for _ in range(nu2 - 1):
                cur, spare = p.sweep(cur, fcb, dst=spare)[0], cur
            return cur
        # handoff: compact, run the XLA subtree in f32, re-pad (pad casts
        # back to the hierarchy's storage dtype)
        p = self.pl[l]
        f_plain = p.unpad(fcb).astype(jnp.float32)
        u_plain = self._xla_vcycle(l, jnp.zeros_like(f_plain), f_plain, nu1, nu2)
        return p.pad(u_plain)

    def _cycle0(self, u, sp, fb, nu1: int, nu2: int):
        """One V(nu1, nu2) cycle at level 0 with donation ping-pong.
        Returns (u_new, spare_new, rsq_pre) where ``rsq_pre`` is the squared
        interior residual norm of the INCOMING ``u`` (free from the first
        sweep).  When nu1 + nu2 is even, the returned buffers occupy the
        same storage slots as the inputs (no while-carry copies)."""
        p = self.pl[0]
        cur, spare, rsq = u, sp, None
        for _ in range(nu1 - 1):
            out, r = p.sweep(cur, fb, dst=spare)
            rsq = r if rsq is None else rsq
            cur, spare = out, cur
        # last pre-smooth fused with residual + restriction (one HBM pass)
        out, fc, r = p.sweep_restrict(cur, fb, dst=spare)
        rsq = r if rsq is None else rsq
        cur, spare = out, cur
        uc = self._coarse_correction(1, fc, nu1, nu2)
        out, _ = p.psweep(cur, fb, uc, dst=spare, vmem_mb=self.psweep_vmem_mb)
        cur, spare = out, cur
        for _ in range(nu2 - 1):
            cur, spare = p.sweep(cur, fb, dst=spare)[0], cur
        return cur, spare, rsq

    # ---- solve entry point (one device dispatch, one host sync) ----

    def solve(self, f, u0=None, bc_value=None, nu1: int = 1, nu2: int = 1,
              eps: float = 1e-6, max_cycles: int = 100, chunk: int = 1,
              use_pswrr: bool = False):
        """V-cycle solve to interior residual ``eps``.

        ``f`` is the mass-convolved RHS as a plain (n+1, n+1) field.
        Returns ``(u, history)`` with ``history[j]`` = interior residual
        norm after cycle j+1 (reference convention) and ``len(history)`` =
        cycles to reach ``eps``.  The returned ``u`` includes ONE extra
        cycle beyond ``history`` (the cycle whose free pre-sweep residual
        detected convergence), so it is at least as converged as
        ``history[-1]``.  This lag is inherent to the free residual: the
        norm of cycle k's output is only known once cycle k+1's first sweep
        has run.  Consequently at least one cycle is always applied (even
        when ``u0`` already satisfies ``eps``), and at the ``max_cycles``
        cap the returned ``u`` has ``max_cycles`` cycles while ``history``
        covers the first ``max_cycles - 1``.

        NOTE (donation ping-pong): when ``nu1 + nu2`` is odd, the cycle's
        buffers land in swapped carry slots and XLA reinstates one
        full-buffer copy per level per cycle (~2x fine-sweep cost).  Even
        schedules — V(1,1), V(2,2) — run copy-free; V(2,1)/V(1,2) are
        correct but pay the copy.

        ``chunk`` > 1 runs that many cycles per while-loop iteration and
        tests ``eps`` once per chunk (cheaper loop plumbing); the returned
        ``u`` may then include up to ``chunk - 1`` further extra cycles,
        but ``history`` is still trimmed to the first cycle whose residual
        met ``eps`` (identical to ``chunk=1``).
        """
        lv0, p0 = self.hier.finest, self.pl[0]
        H = lv0.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), p0.dtype)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        # V(1,1) cross-cycle fused fine level (pswrr): the prolongation-add
        # + post-smooth of cycle k and the pre-smooth + restriction of cycle
        # k+1 run as ONE kernel (17 B/node/cycle at the fine level instead
        # of 29).  chunk is forced even so the donation ping-pong returns
        # buffers to their carry slots.  OFF by default since round 4: the
        # deep-window kernel is VPU-bound and measures ~4% SLOWER end-to-end
        # than the split swrr+psweep path (docs/kernel_notes_r4.md finding 2);
        # kept for study.
        if nu1 == 1 and nu2 == 1 and use_pswrr:
            chunk = chunk + (chunk & 1)
            key = ("solve_pswrr", float(eps), max_cycles, chunk)
            if key not in self._compiled:
                p0_ = self.pl[0]

                @jax.jit
                def run_ps(u0_plain, f_plain):
                    u = p0_.pad(u0_plain)
                    sp = p0_.zeros()
                    fb = p0_.pad(f_plain)
                    hist0 = jnp.full((max_cycles + chunk,), -1.0, jnp.float32)
                    # peeled first descent (exact V(1,1) sequence)
                    u1, fc, rsq0 = p0_.sweep_restrict(u, fb, dst=sp)
                    free = u
                    uc = self._coarse_correction(1, fc, 1, 1)
                    hist0 = hist0.at[0].set(jnp.sqrt(rsq0).astype(jnp.float32))

                    def cond(c):
                        u1, free, uc, k, res, hist = c
                        return (res > eps) & (k < max_cycles - 1)

                    def body(c):
                        u1, free, uc, k, res, hist = c
                        for _ in range(chunk):
                            u4, fc, rsq = p0_.pswrr(u1, fb, uc, dst=free)
                            u1, free = u4, u1
                            uc = self._coarse_correction(1, fc, 1, 1)
                            res = jnp.sqrt(rsq).astype(jnp.float32)
                            hist = hist.at[k].set(res)
                            k = k + 1
                        return (u1, free, uc, k, res, hist)

                    u1, free, uc, k, res, hist = jax.lax.while_loop(
                        cond, body,
                        (u1, free, uc, jnp.int32(1), jnp.float32(jnp.inf),
                         hist0))
                    u_fin, _ = p0_.psweep(u1, fb, uc, dst=free)
                    return p0_.unpad(u_fin), hist

                self._compiled[key] = run_ps
            u, hist = self._compiled[key](u0, f)
            return u, trim_history(hist, eps)

        key = ("solve", nu1, nu2, float(eps), max_cycles, chunk)
        return self._solve_plain(key, f, u0, nu1, nu2, eps, max_cycles, chunk)

    def _solve_plain(self, key, f, u0, nu1, nu2, eps, max_cycles, chunk):
        p0 = self.pl[0]
        if key not in self._compiled:

            @jax.jit
            def run(u0_plain, f_plain):
                u = p0.pad(u0_plain)
                sp = p0.zeros()
                fb = p0.pad(f_plain)
                # -1 sentinel marks never-written entries (norms are >= 0)
                hist0 = jnp.full((max_cycles + chunk,), -1.0, dtype=jnp.float32)

                def cond(c):
                    u, sp, k, res, hist = c
                    return (res > eps) & (k < max_cycles)

                def body(c):
                    u, sp, k, res, hist = c
                    for _ in range(chunk):
                        u, sp, rsq = self._cycle0(u, sp, fb, nu1, nu2)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                        # rsq is the residual of the state ENTERING this
                        # cycle, i.e. after k completed cycles.
                        hist = hist.at[k].set(res)
                        k = k + 1
                    return (u, sp, k, res, hist)

                u, sp, k, res, hist = jax.lax.while_loop(
                    cond, body, (u, sp, jnp.int32(0), jnp.float32(jnp.inf), hist0)
                )
                return p0.unpad(u), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f)
        # ONE host fetch: derive the cycle count from the history itself.
        # hist[i] = residual after i cycles (hist[0] = initial residual).
        return u, trim_history(hist, eps)

    def solve_pcg(self, f, u0=None, bc_value=None, nu1: int = 1,
                  nu2: int = 1, eps: float = 1e-6, max_iters: int = 60):
        """Flexible-CG accelerated solve with one fused V(nu1, nu2) cycle
        (from zero — the zero-guess legs) as the preconditioner; the scalar
        twin of solvers/elastic.py::solve_pcg.

        On the bi-material interface problem the V-cycle factor degrades
        with n (bilinear transfers kink across the 20:1 jump; the
        operator-induced BoxMG hierarchy, solvers/pallas_boxmg.py, is the
        production fix), and the operator is SPD, so Krylov acceleration contracts
        ~sqrt of the cycle's error factor per iteration at ~1.4 cycles of
        cost (one V-cycle + one fused A-apply + one fused true-residual
        pass — residual replacement every iteration, so the returned u's
        residual IS history[-1]).  Whole solve = ONE jitted while_loop.

        Returns (u, history), history[j] = interior residual norm after
        iteration j+1 (post-iteration; no free-residual lag)."""
        lv0, p0 = self.hier.finest, self.pl[0]
        if u0 is None:
            u0 = jnp.zeros_like(f)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        key = ("pcg", nu1, nu2, float(eps), max_iters)
        if key not in self._compiled:

            def dot(a, b):
                return jnp.sum(a * b)

            @jax.jit
            def run(u0_plain, f_plain):
                ub = p0.pad(u0_plain)
                fb = p0.pad(f_plain)
                rb, rsq0 = p0.residual(ub, fb)
                zb = self._coarse_correction(0, rb, nu1, nu2)
                pb = zb
                rz = dot(p0.unpad(zb), p0.unpad(rb))
                hist0 = jnp.full((max_iters,), -1.0, jnp.float32)

                def cond(c):
                    ub, rb, pb, rz, k, res, best, hist = c
                    # breakdown guards: once the true residual hits the f32
                    # floor the Krylov recurrences turn to noise and CG
                    # DIVERGES (unlike the monotone V-cycle) — stop when the
                    # residual has grown 4x above the best seen, or when the
                    # preconditioned inner product loses positivity.
                    return ((res > eps) & (k < max_iters) & (rz > 0.0)
                            & (res < 4.0 * best))

                def body(c):
                    ub, rb, pb, rz, k, res, best, hist = c
                    # A p via the fused residual kernel with f = 0
                    apb, _ = p0.residual(pb, p0.zeros())
                    apb = -apb
                    pap = dot(p0.unpad(pb), p0.unpad(apb))
                    alpha = rz / pap
                    ub = ub + alpha * pb
                    r_old = p0.unpad(rb)
                    # residual replacement: recompute the true r (and its
                    # norm, free) with the fused kernel each iteration
                    rb, rsq = p0.residual(ub, fb)
                    res = jnp.sqrt(rsq).astype(jnp.float32)
                    zb = self._coarse_correction(0, rb, nu1, nu2)
                    z_pl = p0.unpad(zb)
                    rz_new = dot(z_pl, p0.unpad(rb))
                    # flexible (Polak-Ribiere) beta, clipped at zero: PR+ —
                    # the library-wide convention (negative beta = lost
                    # conjugacy under the varying preconditioner; restart
                    # with p = z).  Shared with elastic.solve_pcg.
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
        u, hist = self._compiled[key](u0, f)
        vals = np.asarray(hist)
        return u, vals[: int(np.sum(vals >= 0.0))]
