"""Periodic multigrid: transfer-op identities, solver convergence on the
analytic problem, and R-only training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.ops import pbc, stencil
from multigrid_feanet_tpu.solvers import pbc_mg


def test_pbc_restrict_constant_preserved():
    # bilinear/4 kernel sums to 4: restriction of a constant = 4 * constant
    c = jnp.full((16, 16), 2.0, dtype=jnp.float32)
    rc = pbc_mg.pbc_restrict(c, jnp.asarray(pbc_mg.BILINEAR_4))
    assert rc.shape == (8, 8)
    np.testing.assert_allclose(np.asarray(rc), 8.0, rtol=1e-6)


def test_pbc_prolong_injection_and_midpoints():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((8, 8)), dtype=jnp.float32)
    out = pbc_mg.pbc_prolong(v, jnp.asarray(pbc_mg.BILINEAR_4))
    assert out.shape == (16, 16)
    o = np.asarray(out)
    vn = np.asarray(v)
    np.testing.assert_allclose(o[::2, ::2], vn, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        o[1::2, ::2], 0.5 * (vn + np.roll(vn, -1, axis=0)), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        o[1::2, 1::2],
        0.25 * (vn + np.roll(vn, -1, 0) + np.roll(vn, -1, 1) + np.roll(np.roll(vn, -1, 0), -1, 1)),
        rtol=1e-5, atol=1e-5,
    )


def test_pbc_mg_solves_analytic_problem():
    """Same analytic RHS as the PBC Jacobi validation (46 Jacobi iterations);
    the V-cycle should need only a handful of cycles and match the Jacobi
    solution up to the constant nullspace."""
    n = 32
    h = 2.0 / n
    x = np.linspace(-1.0, 1.0, n + 1, dtype=np.float32)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    rhs = 5.0 * np.sin(-4.0 * np.pi * (xx + 0.5)) * np.cos(3.0 * np.pi * yy)
    table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
    f_unique = pbc.from_wrapped(jnp.asarray(rhs, dtype=jnp.float32))
    f_conv = pbc.apply_mass_periodic(f_unique, h)
    u_mg, hist = pbc_mg.solve_pbc_mg(table, f_conv, eps=5e-6)
    assert len(hist) <= 10, hist
    u_jac, _ = pbc.solve_jacobi_pbc(table, f_conv, eps=5e-6)
    d = np.asarray(u_mg) - np.asarray(u_jac)
    assert np.abs(d - d.mean()).max() < 1e-4  # equal up to the constant mode


def test_pbc_training_learns_restriction():
    n = 16
    table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    from multigrid_feanet_tpu.data import rhs as rhs_mod

    F = rhs_mod.make_dataset(key, n, 8).astype(jnp.float32)
    F = jax.vmap(lambda f: pbc.compatibility_shift(f, 2.0 / n))(F)
    state = pbc_mg.init_pbc_state(seed=0)
    losses = []
    for _ in range(25):
        state, loss = pbc_mg.pbc_train_step(table, state, F, num_levels=3)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the perturbed-init kernel should recover a contraction comparable to or
    # better than where it started
    assert np.mean(losses[-5:]) <= np.mean(losses[:5]) + 1e-3, losses
