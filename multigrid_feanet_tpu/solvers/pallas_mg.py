"""Fused Pallas-backed multigrid and Jacobi solvers.

Two performance rules drive this module's shape:

1. Host->device dispatch is expensive (tens of ms through the TPU tunnel),
   so a *whole solve* — V-cycles + convergence test + residual history —
   compiles to ONE XLA program with a `lax.while_loop`; the host syncs once.
   (The reference syncs `.item()` every iteration.)
2. Fine levels run the fused Pallas stencil kernels (ops/pallas_stencil.py,
   13 B/node/sweep); coarse levels (n < threshold) use the XLA bitplane ops,
   which fuse well at small sizes and avoid per-kernel launch overhead.

Cycle math is identical to solvers/multigrid.py (and hence the reference's
rec_V_cycle, MM_Model_convergence.ipynb cell 3): relax nu1 -> residual ->
f_c = 4*FW-restrict -> recurse -> add BC-reset bilinear prolongation ->
relax nu2, coarsest level relax-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import GridHierarchy
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi as jac
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA


class PallasHierarchy:
    """A GridHierarchy plus per-level Pallas kernel wrappers.

    Levels with ``n >= pallas_threshold`` get a :class:`PallasStencil`;
    smaller levels use the XLA ops.  Solve entry points are compiled once
    per (nu1, nu2, eps, max_cycles) signature and cached on the instance.
    """

    def __init__(self, hier: GridHierarchy, coefficients=None, omega: float = DEFAULT_OMEGA,
                 pallas_threshold: int = 256, interpret: Optional[bool] = None,
                 direct_coarse: bool = False):
        self.hier = hier
        self.omega = float(omega)
        # optional exact coarsest-level solve (dense-inverse matmul,
        # solvers/coarse.py) — enables truncated hierarchies
        self.coarse_inv = None
        if direct_coarse and hier.num_levels > 1:
            from multigrid_feanet_tpu.solvers import coarse as _coarse

            self.coarse_inv = _coarse.coarse_inverse(hier.levels[-1])
        self.ps = []
        for lv in hier.levels:
            if lv.n >= pallas_threshold:
                if lv.pid is not None:
                    coeffs = (lv.a0, lv.a1)
                    self.ps.append(
                        PallasStencil(lv.n, pid=lv.pid, coefficients=coeffs, omega=omega,
                                      interpret=interpret)
                    )
                else:
                    self.ps.append(PallasStencil(lv.n, pid=None, omega=omega, interpret=interpret))
            else:
                self.ps.append(None)
        self._compiled = {}

    # ---- level-local ops in each level's native representation ----

    def _sweep(self, l: int, u, f):
        lv, ps = self.hier.levels[l], self.ps[l]
        if ps is not None:
            u_new, _ = ps.sweep_padded(u, f)
            return u_new
        return jac.jacobi_step(lv, u, f, 0.0, self.omega)

    def _relax(self, l: int, u, f, nu: int):
        """nu sweeps; pallas levels use the temporally-fused kernel for
        nu > 1 (bitwise-identical to chained sweeps, one HBM pass)."""
        if nu == 0:
            return u
        ps = self.ps[l]
        if ps is not None and nu > 1:
            u, _ = ps.sweep_k_padded(u, f, nu)
            return u
        for _ in range(nu):
            u = self._sweep(l, u, f)
        return u

    def _residual_plain(self, l: int, u, f):
        """Residual as a plain (n+1, n+1) field (for restriction)."""
        lv, ps = self.hier.levels[l], self.ps[l]
        if ps is not None:
            r_pad, _ = ps.residual_padded(u, f)
            return ps.unpad(r_pad)
        return f - lv.apply(u)

    def _zeros(self, l: int):
        lv, ps = self.hier.levels[l], self.ps[l]
        if ps is not None:
            G = ps.rows
            return jnp.zeros((ps.Hp + 2 * G, ps.Wp), dtype=ps.dtype)
        return jnp.zeros((lv.n_nodes, lv.n_nodes), dtype=lv.geo.dtype)

    def _to_level(self, l: int, x_plain):
        ps = self.ps[l]
        return ps.pad(x_plain) if ps is not None else x_plain

    def _add_plain(self, l: int, u, delta_plain):
        ps = self.ps[l]
        if ps is not None:
            G = ps.rows
            H = ps.H
            return u.at[G : G + H, : ps.W].add(delta_plain.astype(u.dtype))
        return u + delta_plain

    def _as_plain(self, l: int, u):
        ps = self.ps[l]
        return ps.unpad(u) if ps is not None else u

    def v_cycle(self, u, f_lv, nu1: int, nu2: int, level: int = 0):
        """One recursive V(nu1, nu2) cycle; ``u`` and ``f_lv`` in the level's
        native (padded or plain) representation."""
        L = self.hier.num_levels
        lv = self.hier.levels[level]
        if level == L - 1 and level > 0 and self.coarse_inv is not None:
            from multigrid_feanet_tpu.solvers.coarse import coarse_solve

            f_plain = self._as_plain(level, f_lv)
            u_plain = coarse_solve(self.coarse_inv, f_plain).astype(f_plain.dtype)
            return self._to_level(level, u_plain)
        u = self._relax(level, u, f_lv, nu1)
        if level < L - 1:
            r = self._residual_plain(level, u, f_lv)
            f_c = self._to_level(level + 1, 4.0 * restrict_full_weighting(r))
            u_c = self.v_cycle(self._zeros(level + 1), f_c, nu1, nu2, level + 1)
            corr = prolong_bilinear(self._as_plain(level + 1, u_c), lv.geo)
            u = self._add_plain(level, u, corr)
        return self._relax(level, u, f_lv, nu2)

    # ---- fused solve entry points (one device dispatch per solve) ----

    def _finest_res_norm(self, u, f):
        ps = self.ps[0]
        if ps is not None:
            _, rsq = ps.residual_padded(u, f)
            return jnp.sqrt(rsq)
        r = f - self.hier.finest.apply(u)
        return jac.interior_norm(r)

    def solve(self, f, u0=None, bc_value=None, nu1: int = 1, nu2: int = 1,
              eps: float = 1e-6, max_cycles: int = 100):
        """V-cycle solve to ``eps`` inside a single on-device while loop.

        ``f`` is the mass-convolved RHS as a plain (n+1, n+1) field.
        Returns (u, res_history[:n_cycles]); history convention matches the
        reference (entry k = residual after cycle k+1).
        """
        lv0, ps0 = self.hier.finest, self.ps[0]
        H = lv0.n_nodes
        dtype = ps0.dtype if ps0 is not None else lv0.geo.dtype
        if u0 is None:
            u0 = jnp.zeros((H, H), dtype=dtype)
        if bc_value is not None:
            u0 = reset_boundary(u0, lv0.geo, bc_value)
        else:
            u0 = reset_boundary(u0, lv0.geo, 0.0)

        key = ("solve", nu1, nu2, float(eps), max_cycles)
        if key not in self._compiled:

            @jax.jit
            def run(u0_plain, f_plain):
                u = self._to_level(0, u0_plain)
                f_lv = self._to_level(0, f_plain)
                hist0 = jnp.full((max_cycles,), jnp.inf, dtype=jnp.float32)

                def cond(c):
                    u, k, res, hist = c
                    return (res > eps) & (k < max_cycles)

                def body(c):
                    u, k, res, hist = c
                    u = self.v_cycle(u, f_lv, nu1, nu2)
                    res = self._finest_res_norm(u, f_lv).astype(jnp.float32)
                    return (u, k + 1, res, hist.at[k].set(res))

                u, k, res, hist = jax.lax.while_loop(
                    cond, body, (u, jnp.int32(0), jnp.float32(jnp.inf), hist0)
                )
                return self._as_plain(0, u), k, hist

            self._compiled[key] = run
        u, k, hist = self._compiled[key](u0, f)
        k = int(k)
        return u, np.asarray(hist)[:k]

    def solve_jacobi(self, f, u0=None, bc_value=None, eps: float = 1e-5,
                     max_iters: int = 100_000, fuse: int = 1):
        """Plain weighted-Jacobi solve in one on-device while loop.

        The convergence test uses the sweep kernel's free pre-update residual
        (equal to the post-update residual of the previous sweep), so each
        iteration costs exactly one fused kernel pass.  ``fuse`` > 1 runs k
        temporally-fused sweeps per kernel pass (ops/pallas_stencil.py
        sweep_k_padded) — up to ~2x sweep throughput, with convergence
        checked every ``fuse`` sweeps (iteration counts are then multiples
        of ``fuse``)."""
        lv0, ps0 = self.hier.finest, self.ps[0]
        H = lv0.n_nodes
        dtype = ps0.dtype if ps0 is not None else lv0.geo.dtype
        if u0 is None:
            u0 = jnp.zeros((H, H), dtype=dtype)
        u0 = reset_boundary(u0, lv0.geo, 0.0 if bc_value is None else bc_value)

        key = ("jacobi", float(eps), max_iters, fuse)
        if key not in self._compiled:

            @jax.jit
            def run(u0_plain, f_plain):
                u = self._to_level(0, u0_plain)
                f_lv = self._to_level(0, f_plain)

                def cond(c):
                    u, k, res = c
                    return (res > eps) & (k < max_iters)

                def body(c):
                    u, k, res = c
                    if ps0 is not None:
                        if fuse > 1:
                            u, rsq = ps0.sweep_k_padded(u, f_lv, fuse)
                        else:
                            u, rsq = ps0.sweep_padded(u, f_lv)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                    else:
                        for _ in range(fuse):
                            u = jac.jacobi_step(lv0, u, f_lv, 0.0, self.omega)
                        res = jac.interior_norm(f_lv - lv0.apply(u)).astype(jnp.float32)
                    return (u, k + fuse, res)

                u, k, res = jax.lax.while_loop(
                    cond, body, (u, jnp.int32(0), jnp.float32(jnp.inf))
                )
                # the free residual lags one sweep; recompute the final norm
                res_final = self._finest_res_norm(u, f_lv)
                return self._as_plain(0, u), k, res_final

            self._compiled[key] = run
        u, k, res = self._compiled[key](u0, f)
        return u, int(k), float(res)


def solve_ir(ph: PallasHierarchy, f, u0=None, bc_value=None, nu1: int = 1, nu2: int = 1,
             eps: float = 1e-6, cycles_per_correction: int = 4, max_outer: int = 20):
    """Mixed-precision iterative refinement to absolute residual ``eps``.

    Single-precision V-cycles stall at the f32 rounding floor
    (~1e-4 absolute at 4097^2 with O(0.1) solutions).  Classic IR breaks
    the floor: keep u in f64, compute r = f - A u in f64 (TPU-emulated f64
    is bandwidth-ish and runs once per outer iteration), solve the
    correction equation A e = r with a few f32 V-cycles (zero BC), and
    accumulate u += e in f64.  Requires jax x64 to be enabled.

    Returns (u_f64, outer_history) — history entries are f64 interior
    residual norms after each correction.
    """
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy, build_level

    lv32 = ph.hier.finest
    H = lv32.n_nodes
    # f64 twin of the finest operator for residual evaluation — built and
    # shipped ONCE per hierarchy (the homogeneous twin alone is ~270 MB of
    # host-assembled f64 planes; rebuilding it per call cost ~1.5 s of
    # tunnel transfers at 4097^2)
    twin_key = ("ir_lv64",)
    if twin_key not in ph._compiled:
        problem64 = Problem(
            n=lv32.n, size=lv32.h * lv32.n,
            coefficients=(lv32.a0, lv32.a1) if lv32.a0 is not None else (1.0, 1.0),
            inclusion=None if lv32.pid is None else (lambda _n: None),
            dtype=jnp.float64,
        )
        if lv32.pid is None:
            lv64 = build_level(problem64, lv32.n)
        else:
            lv64 = lv32.replace(
                table=lv32.table.astype(jnp.float64),
                diag=lv32.diag.astype(jnp.float64),
                geo=lv32.geo.astype(jnp.float64),
            )
        ph._compiled[twin_key] = (lv64, lv64.geo.astype(jnp.float64))
    lv64, geo64 = ph._compiled[twin_key]
    f64 = jnp.asarray(f, dtype=jnp.float64)
    u = jnp.zeros((H, H), jnp.float64) if u0 is None else jnp.asarray(u0, jnp.float64)
    if bc_value is not None:
        u = reset_boundary(u, lv64.geo, jnp.asarray(bc_value, jnp.float64))

    # TWO compiled programs per outer iteration (round 5 — the round-4
    # shape ran ~8 separately-dispatched eager ops per outer through the
    # remote tunnel and measured 4.2 s at 4097^2 against ~100 ms of actual
    # compute): (1) the fused outer step — f64 correction accumulate +
    # f64 residual + its norm + the f32 downcast — and (2) the f32
    # correction solve.  Both cached on the hierarchy.
    ir_key = ("ir_outer64",)
    if ir_key not in ph._compiled:

        @jax.jit
        def _outer64(u, e32, f64, geo64):
            # geo64 rides as an argument: a closed-over 134 MB f64 plane
            # would be inlined as an HLO constant (see pallas_boxmg._bufs)
            u = u + e32.astype(jnp.float64) * geo64
            r = f64 - lv64.apply(u)
            return u, r.astype(jnp.float32), jac.interior_norm(r)

        ph._compiled[ir_key] = _outer64
    outer64 = ph._compiled[ir_key]

    history = []
    e32 = jnp.zeros((H, H), jnp.float32)
    for _ in range(max_outer):
        u, r32, rn = outer64(u, e32, f64, geo64)
        history.append(float(rn))  # ONE host sync per outer
        if history[-1] <= eps:
            break
        # correction solve in f32 with zero Dirichlet data.  Trace it with
        # x64 disabled: Mosaic's convert-element-type lowering recurses
        # infinitely when a Pallas kernel is traced in x64 mode.
        # jax.enable_x64(False) is a thread-local SCOPED override (part of
        # the jit trace-cache key), not a global flag flip, so concurrent
        # tracing in other threads is unaffected.
        with jax.enable_x64(False):
            e32, _ = ph.solve(r32, nu1=nu1, nu2=nu2,
                              eps=0.0, max_cycles=cycles_per_correction)
    return u, np.asarray(history)
