"""Experiment: bi-material interface problem (circle inclusion, coeffs [1, 20]).

Reproduces MM_Interface_error.ipynb: n=64, f = 1, EPS = 5e-5.

The reference's recursive V-cycle there has a QUIRK: pre-smoothing always
relaxes the FINEST grid (``self.grids[0]``) at every recursion level, so
coarse levels get no pre-smoothing and the fine grid gets L+1 sweeps per
cycle (MM_Interface_error.ipynb cell 2 rec_V_cycle; SURVEY.md section 2.2).
Its published numbers — 14 cycles to 5e-5, q(7,3) = 0.662 — come from that
quirk.  ``quirk_cycle`` reproduces it exactly for parity;
the default mode uses the correct V-cycle (and converges faster).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi, multigrid


def quirk_cycle(hier: GridHierarchy, u, f):
    """One cycle of the interface notebook's rec_V_cycle (finest-only
    pre-smoothing), linearized:

    - L pre-sweeps on the FINEST grid (one per recursion level);
    - the level-0 residual is restricted once, then the coarse RHS chain is
      f_{l+1} = 4 R(f_l) (coarse v are zero when their residual is taken);
    - coarsest: one relax from zero;
    - up-pass: v_l += P(v_{l+1}); one post-relax per level (finest included).
    """
    L = hier.num_levels
    lv0 = hier.levels[0]
    # down pass: relax finest once per level, build the coarse RHS chain
    f_levels = [f]
    for l in range(L - 1):
        u = jacobi.relax(lv0, u, f, 1)
        if l == 0:
            r = f - lv0.apply(u)
        else:
            r = f_levels[l]  # coarse v is zero -> residual = f_l
        f_levels.append(4.0 * restrict_full_weighting(r))
    u = jacobi.relax(lv0, u, f, 1)  # the coarsest recursion level's pre-sweep
    # coarsest level: relax from zero
    v = jacobi.relax(hier.levels[L - 1], jnp.zeros_like(f_levels[L - 1]), f_levels[L - 1], 1)
    # up pass
    for l in range(L - 2, 0, -1):
        vl = prolong_bilinear(v, hier.levels[l].geo)
        v = jacobi.relax(hier.levels[l], vl, f_levels[l], 1)
    u = u + prolong_bilinear(v, lv0.geo)
    return jacobi.relax(lv0, u, f, 1)


def solve_interface(n=64, eps=5e-5, mode="quirk", max_cycles=100):
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5))
    hier = GridHierarchy.create(problem)
    f = stencil.apply_mass(jnp.ones((n + 1, n + 1), jnp.float32), hier.finest.h)
    if mode == "quirk":
        u = jnp.zeros_like(f)
        hist = []
        for _ in range(max_cycles):
            u = quirk_cycle(hier, u, f)
            r = f - hier.finest.apply(u)
            hist.append(float(jacobi.interior_norm(r)))
            if hist[-1] <= eps:
                break
        hist = np.asarray(hist)
    else:
        u, hist = multigrid.solve(hier, f, nu1=1, nu2=1, eps=eps, max_cycles=max_cycles)
    return u, hist


def compute_q(res_arr, m, m0):
    """(r_m / r_m0)^(1/(m-m0+1)) — MM_Interface_error.ipynb cell 9.  Note the
    notebook's res array is 1-prepended; indices here are 1-based cycles."""
    return float(np.power(res_arr[m - 1] / res_arr[m0 - 1], 1.0 / (m - m0 + 1)))


def main():
    os.makedirs("results", exist_ok=True)
    out = {}
    for mode in ("quirk", "correct"):
        u, hist = solve_interface(mode=mode)
        out[mode] = {
            "cycles": len(hist),
            "final_res": float(hist[-1]),
            "q_7_3": compute_q(hist, 7, 3),
            "history": [float(x) for x in hist],
        }
        print(f"{mode}: {len(hist)} cycles, final {hist[-1]:.3e}, q(7,3)={out[mode]['q_7_3']:.4f}")
    with open("results/interface_error.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
