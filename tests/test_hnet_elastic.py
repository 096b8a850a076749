"""Elastic (2-DOF/node) learned iterator: H-Net corrector on block-Jacobi.

Realizes the "learned iterator for elastic material response" capability
(BASELINE configs; the reference's elasticity exists only as MATLAB ground
truths, Archive/FEM/matlab_elasticity/).  Protocol mirrors the scalar
HJacIterator tests (tests/test_hnet.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.learn import train_hnet
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import elastic as elastic_solver


def _level(n=16):
    return elastic_solver.build_elastic_hierarchy(n, E=1.0, nu=0.3)[0]


def test_zero_params_hrelax_equals_block_jacobi():
    lv = _level(16)
    params = jnp.zeros((3, 2, 2, 3, 3), jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2, 17, 17)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((2, 17, 17)), jnp.float32)
    u_h = hnet.h_relax_elastic(lv, params, u, f, 3)
    u_j = elastic_solver.relax(lv, u, f, 3)
    np.testing.assert_allclose(np.asarray(u_h), np.asarray(u_j), atol=1e-6)


def test_conv3x3_mc_matches_explicit():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 7))
    k = rng.standard_normal((2, 2, 3, 3))
    out = np.asarray(hnet.conv3x3_mc(jnp.asarray(x), jnp.asarray(k)))
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1)])
    ref = np.zeros_like(x)
    for oc in range(2):
        for ic in range(2):
            for a in range(3):
                for b in range(3):
                    ref[oc] += k[oc, ic, a, b] * xp[ic, a : a + 6, b : b + 7]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_dynamic_matches_static_unroll():
    lv = _level(16)
    params = hnet.init_params_elastic(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((2, 17, 17)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((2, 17, 17)), jnp.float32)
    for k in (1, 3, 5):
        a = hnet.h_relax_elastic(lv, params, u, f, k)
        b = hnet.h_relax_elastic_dynamic(lv, params, u, f, jnp.int32(k), 5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_elastic_training_reduces_loss_and_accelerates_jacobi():
    n = 16
    lv = _level(n)
    ds = datasets.generate_elastic(n, num_samples=10, seed=0)
    params, losses = train_hnet.train_elastic(
        lv, ds, num_epochs=12, batch_size=5, seed=0, k_max=4, verbose=False
    )
    assert losses[-1] < losses[0] * 0.9, losses

    # held-out problem: the trained corrector must beat plain block-Jacobi
    ds_test = datasets.generate_elastic(n, num_samples=1, seed=123)
    u_star = jnp.asarray(ds_test.u[0])
    ff = stencil.apply_mass(jnp.asarray(ds_test.f[0]), lv.h)

    def sweeps_to(eps, step):
        u = jnp.zeros_like(u_star)
        for i in range(1, 3001):
            u = step(u)
            if float(el.elastic_interior_norm(ff - lv.apply(u))) <= eps:
                return i
        return 3001

    n_jac = sweeps_to(1e-4, lambda u: elastic_solver.relax(lv, u, ff, 1))
    n_h = sweeps_to(1e-4, lambda u: hnet.h_relax_elastic(lv, params, u, ff, 1))
    assert n_h < n_jac, (n_h, n_jac)
    # and it still converges to the oracle solution
    u = jnp.zeros_like(u_star)
    for _ in range(n_h):
        u = hnet.h_relax_elastic(lv, params, u, ff, 1)
    assert float(jnp.abs(u - u_star).max()) < 5e-3
