"""Content-adaptive inter-grid transfer operators (operator-induced /
"BoxMG" transfers) + Galerkin coarsening.

The reference vendors NVIDIA's pixel-adaptive convolution (PACNet,
reference: Utils/pacnet/pac.py:690,740) but never wires it in — the evident
intent was transfer operators whose kernels adapt to local content (the
material interface) instead of fixed full-weighting/bilinear stencils.
This module realizes that capability the classical, training-free way: the
transfer kernels are induced by the assembled operator itself (Dendy's
black-box multigrid interpolation for 9-point stencils), so they adapt to
the 20x coefficient jump exactly where PAC's learned guidance would have to
discover it.  Combined with Galerkin coarse operators (R A P, computed by
3-coloring probes) this brings the bi-material interface problem to the
HOMOGENEOUS problem's own convergence factors, h-independently and with no
training (results/adaptive_transfer/summary.json): full-depth V(1,1)
q 0.49-0.58 (linear) -> 0.30-0.32 (hom baseline 0.26) at n = 64..512, and
on the interface V(7,3) protocol q 0.196 (like-for-like linear baseline,
results/adaptive_transfer/summary.json interface_v73_n64.q_linear) -> 0.076;
the reference's own quirk cycle (pre-smoothing grids[0] at every level,
MM_Interface_error.ipynb cells 14/20) reads 0.662 on the same problem and is
reproduced separately in tests/test_interface_parity.py.  On the reference's mgTest
evaluator it scores q(n=64) = 0.428 (f64 — the f32 floor corrupts the
ratio window), beating every *trained* inter-grid operator on the
leaderboard: linear 0.633, best imported reference checkpoint 0.569, our
multi-size-trained 0.547 (results/intergrid_budget/REPORT.md,
results/intergrid_robust/summary2.json).

Math (vertex-centred coarsening by 2; fine node classes: C = both indices
even, Fx = even row / odd col, Fy = odd row / even col, Fc = both odd).
With S the per-node 3x3 stencil ((A u)(i,j) = sum_{dr,dc} S[i,j,dr,dc]
u(i+dr-1, j+dc-1)):

- Fx nodes collapse S in the row direction (zero-residual interpolation
  along the line): wW = -sum_dr S[.,dr,0] / sum_dr S[.,dr,1], wE likewise.
- Fy nodes collapse in the column direction.
- Fc nodes solve their own stencil row: w[dr,dc] = -S[dr,dc]/S[1,1]
  applied to the 8 neighbours (C/Fx/Fy values from the previous stage).
- Restriction is the exact transpose R = P^T: for the homogeneous operator
  P is bilinear and P^T = 4 * (FW/16) — precisely the reference's x4-scaled
  full-weighting (MM_Model_convergence.ipynb cell 3), so the adaptive
  operators are a drop-in generalization with the same scaling convention.
- Galerkin levels: S_c = R A P evaluated by probing with the nine 3-strided
  impulse lattices (each coarse stencil entry is read off one probe).

TPU notes: all grid ops are single-axis slices / interleaves (stack +
reshape) — no 2-D strided scatters, no 1-channel convs (see
ops/transfer.py).  Weights are precomputed once per hierarchy (setup), the
per-cycle work is 9-tap elementwise math, fully fusable by XLA.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import stencil as stencil_mod
from multigrid_feanet_tpu.ops.transfer import _interleave_last


def node_stencils(level) -> jax.Array:
    """Per-node (H, W, 3, 3) stencil entries of a hierarchy Level."""
    if level.pid is None:
        H = level.n + 1
        return jnp.broadcast_to(level.table, (H, H, 3, 3))
    # level.table always holds the full 16-entry table (core/problem.py
    # build_level, and the heat hierarchy's system levels fold M + theta dt K
    # into it), so the gather covers the affine-bitplane systems too.
    return stencil_mod.gather_coefficients(level.table, level.pid)


class AdaptiveTransfer:
    """Operator-induced P / R = P^T for one fine level.

    Precomputes, from the fine level's per-node stencils:
      ``wx``  (m, m-1, 2):  Fx weights (W, E) at even rows / odd cols
      ``wy``  (m-1, m, 2):  Fy weights (N, S) at odd rows / even cols
      ``wc``  (m-1, m-1, 3, 3): Fc weights (centre zero) at odd/odd
    where m = n/2 + 1 is the coarse node count per edge.  ``geo_f`` masks
    the prolonged correction (Dirichlet reset, zero boundary data) and
    ``geo_c`` masks the restricted residual's coarse ring — identical
    boundary semantics to the classical pair (ops/transfer.py).
    """

    def __init__(self, S, geo_fine, geo_coarse=None, dtype=jnp.float32):
        S = np.asarray(S, np.float64)  # (H, W, 3, 3)
        H = S.shape[0]
        n = H - 1
        assert n % 2 == 0
        m = n // 2 + 1
        self.dtype = dtype

        def safe_div(num, den):
            den = np.where(np.abs(den) < 1e-300, 1.0, den)
            return num / den

        # Fx: even rows (0..n step 2), odd cols (1..n-1 step 2)
        Sx = S[0::2, 1::2]  # (m, m-1, 3, 3)
        sx = Sx.sum(axis=2)  # collapse rows -> (m, m-1, 3) [W, C, E]
        self.wx = jnp.asarray(np.stack(
            [safe_div(-sx[..., 0], sx[..., 1]),
             safe_div(-sx[..., 2], sx[..., 1])], axis=-1), dtype)
        # Fy: odd rows, even cols
        Sy = S[1::2, 0::2]  # (m-1, m, 3, 3)
        sy = Sy.sum(axis=3)  # collapse cols -> (m-1, m, 3) [N, C, S]
        self.wy = jnp.asarray(np.stack(
            [safe_div(-sy[..., 0], sy[..., 1]),
             safe_div(-sy[..., 2], sy[..., 1])], axis=-1), dtype)
        # Fc: odd rows, odd cols
        Sc = S[1::2, 1::2]  # (m-1, m-1, 3, 3)
        wc = safe_div(-Sc, Sc[..., 1:2, 1:2])
        wc[..., 1, 1] = 0.0
        self.wc = jnp.asarray(wc, dtype)
        self.n, self.m = n, m
        self.geo_f = geo_fine
        self.geo_c = geo_coarse

    # ---- prolongation ----

    def prolong(self, uc: jax.Array) -> jax.Array:
        """(m, m) coarse correction -> (n+1, n+1) fine, masked by geo_f."""
        m = self.m
        # even fine rows: injection at even cols, Fx blend at odd cols
        fx = self.wx[..., 0] * uc[:, :-1] + self.wx[..., 1] * uc[:, 1:]
        even = jnp.concatenate(
            [_interleave_last(uc[:, :-1], fx), uc[:, -1:]], axis=1)  # (m, n+1)
        # odd fine rows: Fy at even cols from the C rows above/below
        fy = self.wy[..., 0] * uc[:-1, :] + self.wy[..., 1] * uc[1:, :]
        # Fc at odd cols from the full stencil row over the 8 neighbours:
        # N/S rows are the adjacent EVEN fine rows (C + Fx values), W/E are
        # the same-row Fy values.
        eN, eS = even[:-1, :], even[1:, :]  # (m-1, n+1)
        wc = self.wc
        fc = (wc[..., 0, 0] * eN[:, 0:-2:2] + wc[..., 0, 1] * eN[:, 1:-1:2]
              + wc[..., 0, 2] * eN[:, 2::2]
              + wc[..., 2, 0] * eS[:, 0:-2:2] + wc[..., 2, 1] * eS[:, 1:-1:2]
              + wc[..., 2, 2] * eS[:, 2::2]
              + wc[..., 1, 0] * fy[:, :-1] + wc[..., 1, 2] * fy[:, 1:])
        odd = jnp.concatenate(
            [_interleave_last(fy[:, :-1], fc), fy[:, -1:]], axis=1)
        # interleave rows: even[0], odd[0], even[1], ..., even[m-1]
        body = jnp.stack([even[:-1], odd], axis=1).reshape(2 * (m - 1),
                                                           self.n + 1)
        out = jnp.concatenate([body, even[-1:]], axis=0)
        if self.geo_f is not None:
            out = out * self.geo_f
        return out

    # ---- restriction (exact transpose) ----

    def restrict(self, r: jax.Array) -> jax.Array:
        """(n+1, n+1) fine residual -> (m, m) coarse RHS = P^T r.

        P = P2 P1 with P1: coarse -> {C, Fx, Fy} and P2 = I + N (N fills Fc
        from its 8 neighbours), so P^T r = P1^T (r + N^T r): first scatter
        each Fc value into its neighbours with the Fc weights, then collapse
        Fx/Fy into their C parents and add the injection."""
        if self.geo_f is not None:
            r = r * self.geo_f
        even = r[0::2, :]   # (m, n+1)   C + Fx slots
        odd = r[1::2, :]    # (m-1, n+1) Fy + Fc slots
        rc_ = odd[:, 1::2]  # (m-1, m-1) Fc values
        wc = self.wc

        # N^T: each Fc value scatters to its 8 neighbours with its own
        # interpolation weights.
        def scatter_row(wrow):
            """Fc values weighted by wrow (m-1, m-1, 3) -> one (m-1, n+1)
            fine row of contributions: the Fc at odd col c sends
            wrow[..., k] to col c + (k - 1)."""
            contrib_w = wrow[..., 0] * rc_   # lands at col c-1 (even)
            contrib_c = wrow[..., 1] * rc_   # lands at col c (odd)
            contrib_e = wrow[..., 2] * rc_   # lands at col c+1 (even)
            evenc = (jnp.pad(contrib_e, ((0, 0), (1, 0)))
                     + jnp.pad(contrib_w, ((0, 0), (0, 1))))  # (m-1, m)
            return jnp.concatenate(
                [_interleave_last(evenc[:, :-1], contrib_c), evenc[:, -1:]],
                axis=1)

        even = even.at[:-1, :].add(scatter_row(wc[..., 0, :]))
        even = even.at[1:, :].add(scatter_row(wc[..., 2, :]))
        # same-row W/E neighbours are Fy slots (even cols of odd rows)
        fy = odd[:, 0::2]  # (m-1, m)
        fy = (fy + jnp.pad(wc[..., 1, 2] * rc_, ((0, 0), (1, 0)))
              + jnp.pad(wc[..., 1, 0] * rc_, ((0, 0), (0, 1))))
        # P1^T: collapse Fx (odd cols of even rows) into C, Fy into C,
        # plus injection.
        fx = even[:, 1::2]  # (m, m-1)
        out = (even[:, 0::2]
               + jnp.pad(self.wx[..., 1] * fx, ((0, 0), (1, 0)))
               + jnp.pad(self.wx[..., 0] * fx, ((0, 0), (0, 1)))
               + jnp.pad(self.wy[..., 1] * fy, ((1, 0), (0, 0)))
               + jnp.pad(self.wy[..., 0] * fy, ((0, 1), (0, 0))))
        if self.geo_c is not None:
            out = out * self.geo_c
        return out


# ---------------------------------------------------------------------------
# Galerkin coarse operators by probing.
# ---------------------------------------------------------------------------


class GeneralLevel:
    """A multigrid level with an arbitrary per-node 3x3 stencil (the Galerkin
    product is spatially varying and leaves the 16-pattern family).  Duck-
    types the parts of core.problem.Level the smoothers/solvers use:
    ``apply``, ``diag``, ``geo``, ``n``, ``n_nodes``."""

    def __init__(self, S, geo, dtype=jnp.float32):
        self.S = jnp.asarray(S, dtype)  # (H, W, 3, 3)
        self.geo = geo
        self.n = S.shape[0] - 1
        # boundary rows of a Galerkin product are identically zero (the
        # transfers mask the Dirichlet ring) — guard the Jacobi diagonal
        d = self.S[..., 1, 1]
        self.diag = jnp.where(jnp.abs(d) > 0, d, 1.0)

    @property
    def n_nodes(self):
        return self.n + 1

    def apply(self, u: jax.Array) -> jax.Array:
        H, W = u.shape[-2:]
        up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
        out = jnp.zeros_like(u)
        for dr in range(3):
            for dc in range(3):
                out = out + self.S[..., dr, dc] * up[..., dr : dr + H,
                                                     dc : dc + W]
        return out


def galerkin_stencils(apply_fine, at: AdaptiveTransfer, m: int,
                      dtype=np.float64) -> np.ndarray:
    """Coarse per-node stencils S_c = R A P via nine 3-strided impulse
    probes: probe (a, b) has 1 at coarse nodes with (I % 3, J % 3) == (a, b);
    within any coarse 3x3 window exactly one lattice point lies at each
    offset, so S_c[I, J, dr, dc] = (R A P probe)[I, J] for the probe whose
    residues match (I + dr - 1, J + dc - 1)."""
    I = np.arange(m)
    probes = {}
    # ONE jitted probe program per level (eager ops on a remote TPU pay an
    # XLA compile + ~30 ms dispatch PER OP per level shape)
    rap = jax.jit(lambda e: at.restrict(apply_fine(at.prolong(e))))
    for a in range(3):
        for b in range(3):
            e = ((I[:, None] % 3 == a) & (I[None, :] % 3 == b))
            # probe values are exact 0/1 — the transfer pair's own dtype is
            # the right precision for the product
            y = rap(jnp.asarray(e, at.wx.dtype))
            probes[(a, b)] = np.asarray(y, dtype)
    Sc = np.zeros((m, m, 3, 3), dtype)
    for dr in range(3):
        for dc in range(3):
            a = (I[:, None] + dr - 1) % 3 + np.zeros((m, m), np.int64)
            b = (I[None, :] + dc - 1) % 3 + np.zeros((m, m), np.int64)
            for aa in range(3):
                for bb in range(3):
                    mask = (a == aa) & (b == bb)
                    Sc[..., dr, dc] = np.where(mask, probes[(aa, bb)],
                                               Sc[..., dr, dc])
    return Sc


def general_coarse_inverse(level: "GeneralLevel", dtype=jnp.float32):
    """Dense inv(A_interior) for a GeneralLevel (spatially-varying stencil),
    same contract as solvers/coarse.coarse_inverse."""
    S = np.asarray(jax.device_get(level.S), np.float64)
    n = level.n
    m = n - 1
    A = np.zeros((m * m, m * m), np.float64)
    for i in range(1, n):
        for j in range(1, n):
            row = (i - 1) * m + (j - 1)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ii, jj = i + dr, j + dc
                    if 1 <= ii < n and 1 <= jj < n:
                        A[row, (ii - 1) * m + (jj - 1)] += S[i, j, 1 + dr,
                                                             1 + dc]
    return jnp.asarray(np.linalg.inv(A), dtype)


class BoxMG:
    """Multigrid with operator-induced transfers and Galerkin coarse levels
    — the content-adaptive hierarchy.  Built once from a fine Level (any
    operator the stencil table expresses); coarse levels are GeneralLevels
    with probed R A P stencils, transfers are AdaptiveTransfer pairs.

    ``galerkin=False`` keeps the hierarchy's geometric (re-rasterized)
    coarse operators and only swaps the transfer pair — useful for
    isolating the two effects at shallow depth, but KNOWN-INCONSISTENT on
    deep hierarchies: the re-discretized coarse operator does not match
    P^T A P near the interface, the mismatch compounds per level, and the
    full-depth interface cycle diverges (measured q ~ 1.9 at n = 64, L = 6;
    two-grid and L <= 4 still converge).  Production use is Galerkin.
    """

    def __init__(self, hier, num_levels: Optional[int] = None,
                 galerkin: bool = True, dtype=None):
        """``dtype`` defaults to the hierarchy's field dtype (f32; pass a
        float64 hierarchy + dtype for floor-free nonzero-f protocols)."""
        from multigrid_feanet_tpu.solvers import coarse as _coarse

        fine = hier.levels[0]
        if dtype is None:
            dtype = fine.geo.dtype
        self.dtype = dtype
        L = num_levels if num_levels is not None else hier.num_levels
        self.levels = [fine]
        self.transfers = []
        lv = fine
        for l in range(L - 1):
            S = node_stencils(lv) if not isinstance(lv, GeneralLevel) else lv.S
            geo_c = hier.levels[l + 1].geo if l + 1 < hier.num_levels else None
            if geo_c is None:
                mc = (lv.n // 2) + 1
                g = np.zeros((mc, mc), np.float32)
                g[1:-1, 1:-1] = 1.0
                geo_c = jnp.asarray(g, dtype)
            at = AdaptiveTransfer(S, lv.geo, geo_c, dtype=dtype)
            self.transfers.append(at)
            if galerkin:
                Sc = galerkin_stencils(lv.apply, at, lv.n // 2 + 1)
                nxt = GeneralLevel(Sc, geo_c, dtype=dtype)
            else:
                nxt = hier.levels[l + 1]
            self.levels.append(nxt)
            lv = nxt
        self.coarse_inv = None
        cl = self.levels[-1]
        if cl.n >= 2 and len(self.levels) > 1:
            self.coarse_inv = (general_coarse_inverse(cl, dtype)
                               if isinstance(cl, GeneralLevel)
                               else _coarse.coarse_inverse(cl, dtype))

    @property
    def num_levels(self):
        return len(self.levels)

    def v_cycle(self, u, f, nu1: int = 1, nu2: int = 1,
                omega: float = 2.0 / 3.0, level: int = 0):
        from multigrid_feanet_tpu.solvers import coarse as _coarse
        from multigrid_feanet_tpu.solvers.jacobi import relax

        lv = self.levels[level]
        if level == self.num_levels - 1:
            if self.coarse_inv is not None and level > 0:
                return _coarse.coarse_solve(self.coarse_inv, f).astype(u.dtype)
            return relax(lv, u, f, nu1 + nu2, 0.0, omega)
        u = relax(lv, u, f, nu1, 0.0, omega)
        at = self.transfers[level]
        r = (f - lv.apply(u)) * lv.geo
        f_c = at.restrict(r)
        u_c = self.v_cycle(jnp.zeros(f_c.shape, u.dtype), f_c, nu1, nu2,
                           omega, level + 1)
        u = u + at.prolong(u_c)
        return relax(lv, u, f, nu2, 0.0, omega)

    def solve(self, f, u0=None, nu1: int = 1, nu2: int = 1, eps: float = 1e-6,
              max_cycles: int = 100, omega: float = 2.0 / 3.0):
        """Jitted chunked V-cycle driver; returns (u, history) with the
        library-wide post-cycle residual-history convention."""
        from multigrid_feanet_tpu.solvers.jacobi import interior_norm

        lv0 = self.levels[0]
        if u0 is None:
            u0 = jnp.zeros_like(f)

        if not hasattr(self, "_run"):
            import functools

            @functools.partial(jax.jit, static_argnames=("nu1", "nu2",
                                                         "chunk", "omega"))
            def run(u, f, nu1, nu2, chunk, omega):
                def body(u, _):
                    u = self.v_cycle(u, f, nu1, nu2, omega)
                    return u, interior_norm(f - lv0.apply(u))
                return jax.lax.scan(body, u, None, length=chunk)

            self._run = run
        u, history = u0, []
        done = 0
        while done < max_cycles:
            k = min(8, max_cycles - done)
            u, norms = self._run(u, f, nu1, nu2, k, omega)
            norms = np.asarray(norms)
            history.append(norms)
            done += k
            hit = norms <= eps
            if hit.any():
                history[-1] = norms[: int(hit.argmax()) + 1]
                break
            if not np.isfinite(norms[-1]):
                break
        return u, np.concatenate(history)
