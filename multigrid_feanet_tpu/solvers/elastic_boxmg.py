"""Elastic multigrid with block-BoxMG transfers + Galerkin coarse levels
(ops/boxmg_elastic.py) — the convergence-technology path for the 2-DOF
interface problem (round 5; VERDICT r4 item #4).

XLA whole-solve implementation (chunked lax.scan, one dispatch per chunk,
same residual-history convention as solvers/elastic.solve): the goal is
the asymptotic factor of the cycle itself, measured floor-free with the
f=0 random-init decay protocol.  Wall-clock production stays on the fused
PallasElasticMG / MG-CG (solvers/elastic.py); this hierarchy cures the
factor the bilinear transfers lose across the 20:1 coefficient jump
(plain V(2,2) tail q ~ 0.5 at 2049^2)."""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import boxmg_elastic as be
from multigrid_feanet_tpu.ops.elasticity import elastic_interior_norm


def elastic_coarse_inverse(S_np: np.ndarray, n: int, dtype=jnp.float32):
    """Dense inv(A_interior) for a block stencil field (m, m, 3, 3, 2, 2)
    (host-side; coarsest levels only).  DOF order: node-major row-major,
    component-minor."""
    m = n - 1
    N = 2 * m * m
    A = np.zeros((N, N), np.float64)
    for i in range(1, n):
        for j in range(1, n):
            row = (i - 1) * m + (j - 1)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ii, jj = i + dr, j + dc
                    if 1 <= ii < n and 1 <= jj < n:
                        col = (ii - 1) * m + (jj - 1)
                        A[2 * row : 2 * row + 2, 2 * col : 2 * col + 2] += \
                            S_np[i, j, 1 + dr, 1 + dc]
    return jnp.asarray(np.linalg.inv(A), dtype)


class ElasticBoxMG:
    """Block-BoxMG hierarchy over an elastic level tuple
    (solvers/elastic.build_elastic_hierarchy)."""

    def __init__(self, levels, num_levels: Optional[int] = None,
                 omega: float = 2.0 / 3.0, direct_coarse: bool = True,
                 setup=None):
        L = num_levels if num_levels is not None else len(levels)
        self.levels = levels[:L]
        self.L = L
        self.omega = float(omega)
        self.setup = (setup if setup is not None
                      else be.boxmg_elastic_setup(levels, L))
        self._S = [None] + [self.setup[l][1] for l in range(L - 1)]
        self._dinv = [levels[0].dinv] + [
            be.inv2x2_guarded(self._S[l][..., 1, 1, :, :])
            for l in range(1, L)]
        self.coarse_inv = None
        if direct_coarse and L > 1:
            S_np = np.asarray(jax.device_get(self._S[L - 1]), np.float64)
            cn = self.levels[L - 1].n
            if cn >= 2:
                self.coarse_inv = elastic_coarse_inverse(S_np, cn)
        self._compiled = {}

    def _apply(self, l: int, u):
        if l == 0:
            return self.levels[0].apply(u)
        return be.apply_block_s9(self._S[l], u)

    def _relax(self, l: int, u, f, k: int):
        geo = self.levels[l].geo[None]
        dinv = self._dinv[l]
        for _ in range(k):
            r = (f - self._apply(l, u)) * geo
            rx, ry = r[0], r[1]
            upd = jnp.stack([dinv[..., 0, 0] * rx + dinv[..., 0, 1] * ry,
                             dinv[..., 1, 0] * rx + dinv[..., 1, 1] * ry])
            u = u + self.omega * upd * geo
        return u

    def v_cycle(self, u, f, nu1: int = 2, nu2: int = 2, level: int = 0,
                gamma: int = 1):
        """gamma = 1: V-cycle; gamma = 2: W-cycle.  The W-cycle matters
        here: the Galerkin coarse INTERFACE problems are themselves hard
        (each level's two-grid factor ~0.43-0.5), so a V-cycle compounds
        the inexactness level by level (measured q 0.43 two-grid -> 0.80
        full depth at n=64) while the W-cycle holds the two-grid factor."""
        lv = self.levels[level]
        if level == self.L - 1:
            if self.coarse_inv is not None and level > 0:
                m = lv.n - 1
                f_int = jnp.transpose(f[:, 1:-1, 1:-1], (1, 2, 0)).reshape(-1)
                u_int = (self.coarse_inv @ f_int).reshape(m, m, 2)
                out = jnp.zeros_like(f)
                return out.at[:, 1:-1, 1:-1].set(
                    jnp.transpose(u_int, (2, 0, 1)))
            return self._relax(level, u, f, nu1 + nu2)
        u = self._relax(level, u, f, nu1)
        W4 = self.setup[level][0]
        r = (f - self._apply(level, u)) * lv.geo[None]
        f_c = be.restrict_w4_e(r, W4)
        u_c = jnp.zeros_like(f_c)
        for _ in range(gamma):
            u_c = self.v_cycle(u_c, f_c, nu1, nu2, level + 1, gamma)
        u = u + be.prolong_w4_e(u_c, W4)
        return self._relax(level, u, f, nu2)

    def solve(self, f, u0=None, nu1: int = 2, nu2: int = 2,
              eps: float = 1e-8, max_cycles: int = 100, gamma: int = 1):
        """Chunked-scan V/W-cycle driver; (u, history) with post-cycle
        interior residual norms (solvers/elastic.solve convention)."""
        if u0 is None:
            u0 = jnp.zeros_like(f)
        u0 = u0 * self.levels[0].geo[None]

        key = ("solve", nu1, nu2, gamma)
        if key not in self._compiled:

            @functools.partial(jax.jit, static_argnames=("chunk",))
            def run(u, f, chunk):
                def body(u, _):
                    u = self.v_cycle(u, f, nu1, nu2, gamma=gamma)
                    r = (f - self._apply(0, u)) * self.levels[0].geo[None]
                    return u, elastic_interior_norm(r)
                return jax.lax.scan(body, u, None, length=chunk)

            self._compiled[key] = run
        run = self._compiled[key]
        u, history, done = u0, [], 0
        while done < max_cycles:
            k = min(8, max_cycles - done)
            u, norms = run(u, f, chunk=k)
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
