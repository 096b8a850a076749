"""Pins the shared solve conventions of the fused while_loop drivers
(solvers/common.py): history indexing, extra-cycle semantics, chunk
invariance, and the weakref-evicted per-hierarchy compile cache.

The free-residual protocol means the fused solvers' returned ``u`` carries
one extra cycle beyond ``history[-1]``; hmg.solve (post-cycle residuals)
carries none.  These tests make that contract executable so artifact
comparisons (e.g. the elastic rel_u_diff mishap flagged in round 3) cannot
silently compare iterates of different cycle counts again.
"""

import gc

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.solvers import hmg, jacobi
from multigrid_feanet_tpu.solvers.common import _CACHES, instance_cache, trim_history
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2


def test_trim_history_convention():
    # hist[i] = residual after i cycles; hist[0] = initial residual.
    hist = np.array([8.0, 4.0, 2.0, 0.5, -1.0, -1.0], np.float32)
    # eps between entries: cut at first entry <= eps (here 0.5, index 3)
    np.testing.assert_array_equal(trim_history(hist, 1.0), [4.0, 2.0, 0.5])
    # never reached eps: all written entries after the initial residual
    np.testing.assert_array_equal(trim_history(hist, 0.1), [4.0, 2.0, 0.5])
    # eps met immediately by the initial residual: empty history
    assert trim_history(hist, 10.0).size == 0


@pytest.fixture(scope="module")
def v2():
    prob = Problem(n=64, inclusion=None)
    ph = PallasHierarchyV2(prob, pallas_threshold=16, rows=32,
                           interpret=True, direct_coarse=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((65, 65)), jnp.float32)
    return ph, f


def test_v2_eps0_history_length_and_extra_cycle(v2):
    """At eps=0 the loop runs max_cycles cycles; history covers the first
    max_cycles - 1 (the last cycle's output norm is never observed), and the
    returned u has EXACTLY one more cycle applied than history records."""
    ph, f = v2
    mc = 6
    u, hist = ph.solve(f, eps=0.0, max_cycles=mc, use_pswrr=False)
    assert len(hist) == mc - 1
    # residual of the returned u == what hist[mc-1] WOULD be: run one more
    # recorded cycle and compare its newly exposed history entry.
    u2, hist2 = ph.solve(f, eps=0.0, max_cycles=mc + 1, use_pswrr=False)
    assert len(hist2) == mc
    r_u = float(jacobi.interior_norm(f - ph.hier.finest.apply(u)))
    np.testing.assert_allclose(r_u, hist2[-1], rtol=3e-3)
    # histories agree on the shared prefix
    np.testing.assert_allclose(hist, hist2[:-1], rtol=1e-6)


def test_v2_chunk_invariance(v2):
    """chunk changes loop plumbing only: identical history, and the
    returned u is at least as converged."""
    ph, f = v2
    u1, h1 = ph.solve(f, eps=1e-3, max_cycles=20, chunk=1, use_pswrr=False)
    u3, h3 = ph.solve(f, eps=1e-3, max_cycles=20, chunk=3, use_pswrr=False)
    np.testing.assert_allclose(h1, h3, rtol=1e-6)
    r1 = float(jacobi.interior_norm(f - ph.hier.finest.apply(u1)))
    r3 = float(jacobi.interior_norm(f - ph.hier.finest.apply(u3)))
    assert r3 <= r1 * (1.0 + 1e-5)


def test_v2_pswrr_matches_plain_path(v2):
    """The cross-cycle-fused V(1,1) driver obeys the same convention."""
    ph, f = v2
    u_a, h_a = ph.solve(f, eps=1e-3, max_cycles=20, use_pswrr=False)
    u_b, h_b = ph.solve(f, eps=1e-3, max_cycles=20, use_pswrr=True)
    assert len(h_a) == len(h_b)
    np.testing.assert_allclose(h_a, h_b, rtol=1e-4)


def test_hmg_solve_has_no_extra_cycle():
    """hmg.solve records POST-cycle residuals: the returned u's residual IS
    history[-1] (no free-residual lag)."""
    n = 32
    hier = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    params = hnet.init_params(jax.random.PRNGKey(0))
    # compare at a loose eps so the residual sits well above the f32
    # rounding floor (abs error ~1e-6 * ||f|| swamps tiny residuals)
    u, hist = hmg.solve(hier, params, f, eps=1e-1, mode="jac")
    r = float(jacobi.interior_norm(f - hier.finest.apply(u)))
    np.testing.assert_allclose(r, hist[-1], rtol=3e-3)


def test_instance_cache_evicted_on_collection():
    class Obj:
        pass

    o = Obj()
    c = instance_cache(o)
    c["k"] = "v"
    assert instance_cache(o) is c
    key = id(o)
    assert key in _CACHES
    del o, c
    gc.collect()
    assert key not in _CACHES


def test_hmg_cache_keyed_per_hierarchy():
    """Two hierarchies with different operators must not share compiled
    closures (the id()-reuse hazard the weakref cache exists to prevent)."""
    n = 16
    f = jnp.asarray(np.random.default_rng(1).standard_normal((n + 1, n + 1)),
                    jnp.float32)
    params = hnet.init_params(jax.random.PRNGKey(0))
    h1 = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
    h2 = GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32))
    _, hist1 = hmg.solve(h1, params, f, eps=1e-4, mode="jac")
    _, hist2 = hmg.solve(h2, params, f, eps=1e-4, mode="jac")
    # the bi-material operator converges differently — identical histories
    # would mean h2 was served h1's compiled closure
    assert len(hist1) != len(hist2) or not np.allclose(hist1, hist2)
    assert instance_cache(h1) is not instance_cache(h2)
