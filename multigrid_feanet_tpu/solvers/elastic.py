"""Multigrid solver for the vector elasticity operator (plane stress/strain).

Same geometric V-cycle as the scalar path — full-weighting restriction and
bilinear prolongation applied per displacement component — with a 2x2
block-Jacobi smoother.  Extends the framework to the reference's elasticity
ground-truth family (Archive/FEM/matlab_elasticity/).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.ops import stencil as scalar_stencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers.common import trim_history


@struct.dataclass
class ElasticLevel:
    n: int = struct.field(pytree_node=False)
    h: float = struct.field(pytree_node=False)
    # static material parameters enable the gather-free bitplane apply
    E: float = struct.field(pytree_node=False, default=1.0)
    nu: float = struct.field(pytree_node=False, default=0.3)
    plane: str = struct.field(pytree_node=False, default="stress")
    a0: Optional[float] = struct.field(pytree_node=False, default=None)
    a1: Optional[float] = struct.field(pytree_node=False, default=None)
    table: jax.Array = None  # (16, 3, 3, 2, 2)
    pid: Optional[jax.Array] = None
    geo: jax.Array = None  # (H, W)
    dinv: jax.Array = None  # (H, W, 2, 2)

    def apply(self, u):
        if self.pid is not None and self.a0 is not None:
            return el.apply_elastic_bitplane(self.pid, u, self.E, self.nu,
                                             self.a0, self.a1, self.plane)
        return el.apply_elastic_stencil(self.table, self.pid, u)


def build_elastic_hierarchy(n: int, E: float = 1.0, nu: float = 0.3, size: float = 2.0,
                            inclusion=None, coefficients=(1.0, 1.0), plane: str = "stress",
                            num_levels: Optional[int] = None, dtype=jnp.float32):
    """Tuple of ElasticLevels, finest to coarsest (n halving to 2)."""
    L = int(np.log2(n)) if num_levels is None else num_levels
    levels = []
    for l in range(L):
        nl = n >> l
        h = size / nl
        # assembled host-side (numpy) — eager device ops pay one XLA compile
        # per (op, level shape) on a remote TPU (see core/problem.py)
        table = el.make_elastic_stencil_table(E, nu, h, coefficients, plane, dtype)
        table_np = np.asarray(jax.device_get(table), np.float64)
        if inclusion is None:
            pid_np, pid = None, None
            db = np.broadcast_to(table_np[0, 1, 1], (nl + 1, nl + 1, 2, 2))
        else:
            kind, center, radius = inclusion
            phase_fn = geometry.circle_phase if kind == "circle" else geometry.rect_phase
            pid_np = scalar_stencil.pattern_ids_np(phase_fn(size, nl, center, radius))
            pid = jnp.asarray(pid_np)
            db = table_np[:, 1, 1][pid_np]  # (H, W, 2, 2)
        a = db[..., 0, 0]
        b = db[..., 0, 1]
        c = db[..., 1, 0]
        d = db[..., 1, 1]
        det = a * d - b * c
        dinv_np = np.stack([np.stack([d, -b], -1),
                            np.stack([-c, a], -1)], -2) / det[..., None, None]
        geo = geometry.interior_mask(nl + 1, dtype=dtype)
        a0, a1 = (float(coefficients[0]), float(coefficients[1])) if pid is not None else (None, None)
        levels.append(
            ElasticLevel(n=nl, h=h, E=float(E), nu=float(nu), plane=plane, a0=a0, a1=a1,
                         table=table, pid=pid, geo=geo,
                         dinv=jnp.asarray(dinv_np, dtype))
        )
    return tuple(levels)


def relax(level: ElasticLevel, u, f, num_sweeps: int, bc_value=0.0, omega=2.0 / 3.0):
    import jax.numpy as jnp

    for _ in range(num_sweeps):
        gm = level.geo[..., None, :, :]
        u = u * gm + bc_value * (1.0 - gm)
        r = f - level.apply(u)
        # Dinv @ r per node on component PLANES — einsum over a trailing
        # (..., H, W, 2) layout costs two lane-dim transposes per sweep
        rx, ry = r[..., 0, :, :], r[..., 1, :, :]
        upd = jnp.stack(
            [level.dinv[..., 0, 0] * rx + level.dinv[..., 0, 1] * ry,
             level.dinv[..., 1, 0] * rx + level.dinv[..., 1, 1] * ry],
            axis=-3)
        u = u + omega * upd
        u = u * gm + bc_value * (1.0 - gm)
    return u


def v_cycle(levels, u, f, nu1: int = 1, nu2: int = 1, bc_value=0.0, omega=2.0 / 3.0,
            level: int = 0):
    lv = levels[level]
    bc = bc_value if level == 0 else 0.0
    u = relax(lv, u, f, nu1, bc, omega)
    if level < len(levels) - 1:
        r = f - lv.apply(u)
        f_c = 4.0 * restrict_full_weighting(r)  # per-component (leading dims batched)
        u_c = jnp.zeros_like(f_c)
        u_c = v_cycle(levels, u_c, f_c, nu1, nu2, 0.0, omega, level + 1)
        u = u + prolong_bilinear(u_c, lv.geo)
    return relax(lv, u, f, nu2, bc, omega)


@functools.partial(jax.jit, static_argnames=("k", "nu1", "nu2", "omega"))
def _run_chunk(levels, u, f, k: int, nu1: int, nu2: int, omega: float):
    # module-level so the jit cache survives across solve() calls (a
    # closure-jitted chunk runner recompiles per solve — ~70 s/solve at
    # 2049^2 through the remote-TPU tunnel)
    def body(u, _):
        u = v_cycle(levels, u, f, nu1, nu2, omega=omega)
        res = el.elastic_interior_norm(f - levels[0].apply(u))
        return u, res

    return jax.lax.scan(body, u, None, length=k)


def solve(levels, f, u0=None, nu1: int = 2, nu2: int = 2, eps: float = 1e-8,
          max_cycles: int = 400, chunk: int = 8, omega=2.0 / 3.0):
    """Chunked-scan elastic V-cycle solve; returns (u, residual history)."""
    if u0 is None:
        u0 = jnp.zeros_like(f)

    u = u0
    hist = []
    done = 0
    while done < max_cycles:
        k = min(chunk, max_cycles - done)
        u, norms = _run_chunk(levels, u, f, k, nu1, nu2, float(omega))
        norms = jax.device_get(norms)
        hist.append(norms)
        done += k
        if eps is not None and (norms <= eps).any():
            hist[-1] = norms[: int((norms <= eps).argmax()) + 1]
            break
        if not np.isfinite(norms[-1]):
            break
    return u, np.concatenate(hist)


class PallasElasticMG:
    """Elastic V-cycle on the round-4 fused legs: every level with
    ``n >= pallas_threshold`` runs sweep_restrict / psweep (and the
    zero-initial-guess zsweep_restrict / zpsweep on coarse error
    equations), with stride-lane coarse layouts exactly as the scalar
    PallasHierarchyV2 — no pad/unpad or XLA transfer pass between Pallas
    levels (the round-3 cycle's dominant cost).  Below the threshold the
    XLA ``v_cycle`` subtree runs in compact layout, with an optional exact
    dense-inverse solve at the coarsest level (``direct_coarse``,
    solvers/coarse.py::coarse_inverse_elastic).

    Cycle math identical to ``v_cycle``: relax nu1 -> f_c = 4 FW(residual)
    per component -> recurse from zero -> bilinear prolongation-add ->
    relax nu2.  The solve's convergence test rides the free pre-update
    residual norm of each cycle's first sweep (shared protocol,
    solvers/common.py)."""

    def __init__(self, n: int, E: float = 1.0, nu: float = 0.3,
                 size: float = 2.0, inclusion=None, coefficients=(1.0, 1.0),
                 plane: str = "stress", num_levels: Optional[int] = None,
                 pallas_threshold: int = 512, rows: int = 64,
                 rows_coarse: int = 32, coarse_rows_below: int = 1024,
                 omega: float = 2.0 / 3.0, interpret: Optional[bool] = None,
                 direct_coarse: bool = False):
        from multigrid_feanet_tpu.ops.pallas_elastic import PallasElasticLevel

        self.levels = build_elastic_hierarchy(
            n, E, nu, size, inclusion, coefficients, plane, num_levels)
        self.omega = float(omega)
        L = len(self.levels)
        K = 0
        while K < L - 1 and self.levels[K].n >= pallas_threshold:
            K += 1
        assert K >= 1, "finest level below pallas_threshold - use solve()"
        self.K = K

        def _rows_for(n_level):
            return rows if n_level >= coarse_rows_below else rows_coarse

        def _phase(nl):
            if inclusion is None:
                return None
            kind, center, radius = inclusion
            phase_fn = (geometry.circle_phase if kind == "circle"
                        else geometry.rect_phase)
            return phase_fn(size, nl, center, radius)

        Wp = None
        self.pl = []
        for l in range(min(K + 1, L)):
            nl = self.levels[l].n
            self.pl.append(PallasElasticLevel(
                nl, E, nu, stride=1 << l, phase=_phase(nl),
                coefficients=coefficients, plane=plane, omega=omega, Wp=Wp,
                rows=_rows_for(nl),
                rows_next=(_rows_for(self.levels[l + 1].n)
                           if l + 1 < L else _rows_for(nl)),
                interpret=interpret))
            Wp = self.pl[-1].Wp
        self.coarse_inv = None
        if direct_coarse and L > 1:
            from multigrid_feanet_tpu.solvers.coarse import coarse_inverse_elastic

            self.coarse_inv = coarse_inverse_elastic(self.levels[-1])
        self._compiled = {}

    def _xla_vcycle(self, l: int, u, f, nu1: int, nu2: int):
        """Compact-layout subtree below the Pallas threshold (identical to
        ``v_cycle``), with the optional exact coarsest solve."""
        from multigrid_feanet_tpu.solvers.coarse import coarse_solve_elastic

        lv = self.levels[l]
        L = len(self.levels)
        if l == L - 1 and l > 0 and self.coarse_inv is not None:
            return coarse_solve_elastic(self.coarse_inv, f).astype(f.dtype)
        u = relax(lv, u, f, nu1, 0.0, self.omega)
        if l < L - 1:
            r = f - lv.apply(u)
            f_c = 4.0 * restrict_full_weighting(r)
            u_c = self._xla_vcycle(l + 1, jnp.zeros_like(f_c), f_c, nu1, nu2)
            u = u + prolong_bilinear(u_c, lv.geo)
        return relax(lv, u, f, nu2, 0.0, self.omega)

    def _coarse_correction(self, l: int, fcx, fcy, nu1: int, nu2: int):
        """Level-l error-equation solve from zero on padded coarse RHS
        buffers; returns the level-l solution buffer pair."""
        if l < self.K:
            p = self.pl[l]
            if nu1 == 1:
                fccx, fccy = p.zsweep_restrict(fcx, fcy)
                uc = self._coarse_correction(l + 1, fccx, fccy, nu1, nu2)
                cur = p.zpsweep(fcx, fcy, uc[0], uc[1])
                spare = None
                for _ in range(nu2 - 1):
                    spare = ((p.zeros(), p.zeros())
                             if spare is None else spare)
                    cur, spare = p.sweep(cur[0], cur[1], fcx, fcy,
                                         dst=spare)[0], cur
                return cur
            cur, spare = (p.zeros(), p.zeros()), (p.zeros(), p.zeros())
            for _ in range(nu1 - 1):
                cur, spare = p.sweep(cur[0], cur[1], fcx, fcy,
                                     dst=spare)[0], cur
            ux1, uy1, fccx, fccy, _ = p.sweep_restrict(
                cur[0], cur[1], fcx, fcy, dst=spare)
            cur, spare = (ux1, uy1), cur
            uc = self._coarse_correction(l + 1, fccx, fccy, nu1, nu2)
            cur, spare = p.psweep(cur[0], cur[1], fcx, fcy, uc[0], uc[1],
                                  dst=spare), cur
            for _ in range(nu2 - 1):
                cur, spare = p.sweep(cur[0], cur[1], fcx, fcy,
                                     dst=spare)[0], cur
            return cur
        p = self.pl[l]
        f_plain = p.unpad(fcx, fcy)
        u_plain = self._xla_vcycle(l, jnp.zeros_like(f_plain), f_plain,
                                   nu1, nu2)
        return p.pad(u_plain)

    def _cycle(self, l: int, ub, sb, fb, nu1: int, nu2: int):
        """One V(nu1, nu2) cycle at level 0 on padded buffer pairs;
        nu1 + nu2 fused passes -> even schedules keep the donation
        ping-pong copy-free.  Returns (u, spare, rsq) with rsq the
        pre-update residual norm^2 of the incoming iterate."""
        p = self.pl[l]
        cur, spare, rsq = ub, sb, None
        for _ in range(nu1 - 1):
            out, r = p.sweep(cur[0], cur[1], fb[0], fb[1], dst=spare)
            rsq = r if rsq is None else rsq
            cur, spare = out, cur
        ux1, uy1, fcx, fcy, r = p.sweep_restrict(cur[0], cur[1], fb[0],
                                                 fb[1], dst=spare)
        rsq = r if rsq is None else rsq
        cur, spare = (ux1, uy1), cur
        uc = self._coarse_correction(l + 1, fcx, fcy, nu1, nu2)
        cur, spare = p.psweep(cur[0], cur[1], fb[0], fb[1], uc[0], uc[1],
                              dst=spare), cur
        for _ in range(nu2 - 1):
            cur, spare = p.sweep(cur[0], cur[1], fb[0], fb[1],
                                 dst=spare)[0], cur
        return cur, spare, rsq

    def solve(self, f, u0=None, bc_value=None, nu1: int = 2, nu2: int = 2,
              eps: float = 1e-8, max_cycles: int = 100, chunk: int = 1):
        """V-cycle solve to interior residual ``eps`` (both components).
        Same free-residual semantics as PallasHierarchyV2.solve: history[j]
        is the residual after cycle j+1, the returned u includes one extra
        cycle, and with nu1 + nu2 odd each cycle pays one buffer copy."""
        lv0, p0 = self.levels[0], self.pl[0]
        if u0 is None:
            u0 = jnp.zeros_like(f)
        gm = lv0.geo[None]
        u0 = u0 * gm + (0.0 if bc_value is None else bc_value) * (1.0 - gm)

        key = (nu1, nu2, float(eps), max_cycles, chunk)
        if key not in self._compiled:

            @jax.jit
            def run(u0_, f_):
                ub = p0.pad(u0_)
                sb = (p0.zeros(), p0.zeros())
                fb = p0.pad(f_)
                hist0 = jnp.full((max_cycles + chunk,), -1.0, jnp.float32)

                def cond(c):
                    ub, sb, k, res, hist = c
                    return (res > eps) & (k < max_cycles)

                def body(c):
                    ub, sb, k, res, hist = c
                    for _ in range(chunk):
                        ub, sb, rsq = self._cycle(0, ub, sb, fb, nu1, nu2)
                        res = jnp.sqrt(rsq).astype(jnp.float32)
                        hist = hist.at[k].set(res)
                        k = k + 1
                    return (ub, sb, k, res, hist)

                ub, sb, k, res, hist = jax.lax.while_loop(
                    cond, body,
                    (ub, sb, jnp.int32(0), jnp.float32(jnp.inf), hist0))
                return p0.unpad(*ub), hist

            self._compiled[key] = run
        u, hist = self._compiled[key](u0, f)
        return u, trim_history(hist, eps)


# ---- Krylov acceleration (round 4) -------------------------------------
# Defined as module functions and attached to PallasElasticMG below so the
# class body above stays the plain-V-cycle core; these are the only
# out-of-class members.


def _emg_apply(self, px, py):
    """A p on padded buffers via the fused residual kernel with f = 0
    (returns interior-masked -(-A p) = A p)."""
    p0 = self.pl[0]
    z = p0.zeros()
    (rx, ry), _ = p0.residual(px, py, z, z)
    return -rx, -ry


def _emg_solve_pcg(self, f, u0=None, nu1: int = 2, nu2: int = 2,
                   eps: float = 1e-8, max_iters: int = 60):
    """Flexible-CG accelerated elastic solve with one fused V(nu1, nu2)
    cycle as the preconditioner (round 4, VERDICT r3 #3).

    The bi-material interface problem's plain V-cycle is asymptotically
    slow (bilinear transfers kink across the 20:1 coefficient jump: true
    asymptotic tail q ~ 0.82 measured f64/long-window at n=64..128,
    results/elastic_boxmg/summary.json — earlier shorter-window readings
    of 0.43-0.74 were transients).  The
    operator is SPD, so Krylov acceleration restores fast convergence:
    flexible PCG (Polak-Ribiere beta, robust to the mildly nonsymmetric
    preconditioner) contracts per iteration like ~sqrt of the cycle's
    error factor.  Whole solve = ONE jitted while_loop; per iteration one
    fused V-cycle + one fused A-apply + 3 dots on unpadded fields.

    Returns (u, history) with history[j] = interior residual norm after
    iteration j+1 (POST-iteration residuals, no free-residual lag: the
    returned u's residual IS history[-1])."""
    lv0, p0 = self.levels[0], self.pl[0]
    if u0 is None:
        u0 = jnp.zeros_like(f)
    gm = lv0.geo[None]
    u0 = u0 * gm

    key = ("pcg", nu1, nu2, float(eps), max_iters)
    if key not in self._compiled:

        def dot(a, b):
            return jnp.sum(a * b)

        def precond(rx, ry):
            zb = self._coarse_correction(0, rx, ry, nu1, nu2)
            return zb

        @jax.jit
        def run(u0_, f_):
            ub = p0.pad(u0_)
            fb = p0.pad(f_)
            # r = f - A u  (masked, padded)
            (mrx, mry), rsq0 = p0.residual(ub[0], ub[1], fb[0], fb[1])
            zb = precond(mrx, mry)
            pb = zb
            rz = dot(p0.unpad(*zb), p0.unpad(mrx, mry))
            hist0 = jnp.full((max_iters,), -1.0, jnp.float32)

            def cond(c):
                ub, rb, pb, rz, k, res, best, hist = c
                # breakdown guards (shared convention with the scalar twin,
                # pallas_mg2.solve_pcg): at the f32 floor the Krylov
                # recurrences turn to noise and CG diverges — stop when the
                # residual has grown 4x above the best seen or the
                # preconditioned inner product loses positivity.
                return ((res > eps) & (k < max_iters) & (rz > 0.0)
                        & (res < 4.0 * best))

            def body(c):
                ub, rb, pb, rz, k, res, best, hist = c
                apx, apy = _emg_apply(self, pb[0], pb[1])
                p_pl = p0.unpad(*pb)
                pap = dot(p_pl, p0.unpad(apx, apy))
                alpha = rz / pap
                ub = (ub[0] + alpha * pb[0], ub[1] + alpha * pb[1])
                r_old = p0.unpad(*rb)
                # residual replacement EVERY iteration: at f32 with
                # |A| ~ 2e5 the r <- r - alpha A p recurrence drifts ~1e-3
                # absolute within ~10 iterations; the fused residual kernel
                # recomputes the true r (and its norm, free) in one pass.
                rb, rsq = p0.residual(ub[0], ub[1], fb[0], fb[1])
                r_pl = p0.unpad(*rb)
                res = jnp.sqrt(rsq).astype(jnp.float32)
                zb = precond(rb[0], rb[1])
                z_pl = p0.unpad(*zb)
                # flexible (Polak-Ribiere) beta, clipped at zero: the PR+
                # convention — a negative beta signals lost conjugacy under
                # the varying preconditioner, and restarting with p = z
                # keeps p a descent direction.  Library-wide convention,
                # shared with the scalar twin (pallas_mg2.solve_pcg).
                rz_new = dot(z_pl, r_pl)
                beta = jnp.maximum((rz_new - dot(z_pl, r_old)) / rz, 0.0)
                pb = (zb[0] + beta * pb[0], zb[1] + beta * pb[1])
                return (ub, rb, pb, rz_new, k + 1, res,
                        jnp.minimum(best, res), hist.at[k].set(res))

            ub, rb, pb, rz, k, res, best, hist = jax.lax.while_loop(
                cond, body,
                (ub, (mrx, mry), pb, rz, jnp.int32(0),
                 jnp.sqrt(rsq0).astype(jnp.float32),
                 jnp.float32(jnp.inf), hist0))
            return p0.unpad(*ub), hist

        self._compiled[key] = run
    u, hist = self._compiled[key](u0, f)
    vals = np.asarray(hist)
    return u, vals[: int(np.sum(vals >= 0.0))]


PallasElasticMG.apply_fused = _emg_apply
PallasElasticMG.solve_pcg = _emg_solve_pcg
