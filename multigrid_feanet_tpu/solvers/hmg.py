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


_COMPILED = {}


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

    key = (id(hier), mode, nu1, nu2, float(eps), max_cycles, f.shape)
    if key not in _COMPILED:

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

        _COMPILED[key] = run
    u, hist = _COMPILED[key](u0, params, f, jnp.asarray(bc_value, f.dtype))
    vals = np.asarray(hist)
    k = int(np.sum(vals >= 0.0))
    return u, vals[:k]
