"""Fused whole-solve H-MG (solvers/hmg.py) vs the per-cycle loop it
replaced (experiments/mg_test.py::mg_solve pre-fusion form)."""

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import hmg, jacobi


def _percycle_solve(hier, params, f, bc_value, eps, mode, max_cycles=100):
    """The original per-cycle-dispatch mg_solve, kept as the test oracle."""
    def relax1(level, u, ff, bc):
        if mode == "hjac":
            return hnet.h_relax(hier.levels[level], params, u, ff, 1, bc)
        return jacobi.jacobi_step(hier.levels[level], u, ff, bc)

    def cycle(level, u, ff):
        bc = bc_value if level == 0 else 0.0
        u = relax1(level, u, ff, bc)
        if level < hier.num_levels - 1:
            r = ff - hier.levels[level].apply(u)
            f_c = 4.0 * restrict_full_weighting(r)
            u_c = cycle(level + 1, jnp.zeros_like(f_c), f_c)
            u = u + prolong_bilinear(u_c, hier.levels[level].geo)
        return relax1(level, u, ff, bc)

    u = jnp.zeros_like(f)
    hist = []
    res = np.inf
    while res > eps and len(hist) < max_cycles:
        u = cycle(0, u, f)
        res = float(jacobi.interior_norm(f - hier.finest.apply(u)))
        hist.append(res)
    return u, np.asarray(hist)


def test_fused_hmg_matches_percycle():
    n = 32
    hier = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
    f = stencil.apply_mass(jnp.ones((n + 1, n + 1), jnp.float32),
                           hier.finest.h)
    params = hnet.init_params(jax.random.PRNGKey(0))
    for mode in ("jac", "hjac"):
        u_ref, h_ref = _percycle_solve(hier, params, f, 0.0, 1e-4, mode)
        u_got, h_got = hmg.solve(hier, params, f, eps=1e-4, mode=mode)
        assert len(h_got) == len(h_ref)
        np.testing.assert_allclose(h_got, h_ref, rtol=3e-4)
        np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                                   rtol=3e-4, atol=1e-6)
