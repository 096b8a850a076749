"""Fused periodic (torus) Pallas sweep vs the XLA PBC path
(ops/pallas_torus.py vs ops/pbc.py), interpret mode."""

import numpy as np
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import pbc, stencil
from multigrid_feanet_tpu.ops.pallas_torus import PallasTorusLevel


def test_torus_sweep_matches_xla_pbc():
    rng = np.random.default_rng(0)
    n = 128
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    table = jnp.asarray(stencil.make_stencil_table_np((1.0, 1.0))[0],
                        jnp.float32)
    lv = PallasTorusLevel(n, rows=32, interpret=True)
    got, rsq = lv.sweep(lv.pad(u), lv.pad(f))
    want = pbc.jacobi_step_pbc(table, u, f)
    np.testing.assert_allclose(np.asarray(lv.unpad(got)), np.asarray(want),
                               rtol=0, atol=3e-6)
    r = f - pbc.apply_stencil_periodic(table, u)
    np.testing.assert_allclose(float(rsq), float(jnp.sum(r * r)), rtol=1e-6)


def test_torus_sweep_chained_buffers():
    """Raw buffers chain across sweeps (the wrapper re-wraps internally)."""
    rng = np.random.default_rng(1)
    n = 128
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    table = jnp.asarray(stencil.make_stencil_table_np((1.0, 1.0))[0],
                        jnp.float32)
    lv = PallasTorusLevel(n, rows=32, interpret=True)
    ub, fb, sp = lv.pad(u), lv.pad(f), lv.zeros()
    want = u
    for _ in range(3):
        ub, _ = lv.sweep(ub, fb, dst=sp)
        want = pbc.jacobi_step_pbc(table, want, f)
    np.testing.assert_allclose(np.asarray(lv.unpad(ub)), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_torus_jacobi_converges_on_compatible_rhs():
    """Whole periodic Jacobi relaxations on the fused kernel drive the
    residual down on a compatibility-shifted RHS (singular system)."""
    rng = np.random.default_rng(2)
    n = 128
    h = 2.0 / n
    F = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = pbc.apply_mass_periodic(F, h)
    f = pbc.compatibility_shift(f, h)
    lv = PallasTorusLevel(n, rows=32, interpret=True)
    ub, fb, sp = lv.pad(jnp.zeros((n, n), jnp.float32)), lv.pad(f), lv.zeros()
    norms = []
    for _ in range(60):
        out, rsq = lv.sweep(ub, fb, dst=sp)
        ub, sp = out, ub  # donation ping-pong
        norms.append(float(rsq) ** 0.5)
    assert norms[-1] < 0.2 * norms[0]
