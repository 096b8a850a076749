"""Pallas kernel vs pure-XLA reference path (interpret mode on CPU).

The XLA gather-FMA path (ops/stencil.py) is itself validated against the
dense FEM oracle, so bit-tolerance agreement here transitively validates the
kernel.  On real TPU hardware the same kernels run compiled (bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
from multigrid_feanet_tpu.solvers import jacobi


def _setup(n, bimaterial):
    if bimaterial:
        phase = geometry.circle_phase(2.0, n)
        pid = stencil.pattern_ids(jnp.asarray(phase))
        table = stencil.make_stencil_table((1.0, 20.0), dtype=jnp.float32)
        ps = PallasStencil(n, pid=pid, coefficients=(1.0, 20.0), interpret=True)
    else:
        pid = None
        table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
        ps = PallasStencil(n, pid=None, interpret=True)
    rng = np.random.default_rng(n)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
    return ps, table, pid, u, f


@pytest.mark.parametrize("bimaterial", [False, True])
@pytest.mark.parametrize("n", [16, 64, 130 - 1])  # n=129-1 exercises multi-block + ragged pad
def test_residual_matches_xla(n, bimaterial):
    ps, table, pid, u, f = _setup(n, bimaterial)
    r_pl, rsq = ps.residual(u, f)
    r_ref = f - stencil.apply_stencil(table, pid, u)
    mask = np.zeros((n + 1, n + 1), dtype=np.float32)
    mask[1:-1, 1:-1] = 1.0
    r_ref = np.asarray(r_ref) * mask
    np.testing.assert_allclose(np.asarray(r_pl), r_ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(rsq), float((r_ref**2).sum()), rtol=1e-4)


@pytest.mark.parametrize("bimaterial", [False, True])
@pytest.mark.parametrize("n", [16, 64])
def test_sweep_matches_xla_jacobi_step(n, bimaterial):
    ps, table, pid, u, f = _setup(n, bimaterial)
    problem = Problem(
        n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bimaterial else None, dtype=jnp.float32
    )
    lv = GridHierarchy.create(problem).finest
    # pallas keeps the boundary ring; XLA path resets it to bc=0 -> start from
    # a field whose boundary already satisfies the (zero) BC
    u0 = np.asarray(u) * np.asarray(lv.geo)
    u_pl, _ = ps.sweep(jnp.asarray(u0), f)
    u_ref = jacobi.jacobi_step(lv, jnp.asarray(u0, dtype=jnp.float32), f)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref), rtol=1e-5, atol=1e-5)


def test_sweep_nonzero_bc_boundary_kept():
    n = 32
    ps, table, pid, u, f = _setup(n, False)
    bc = np.zeros((n + 1, n + 1), dtype=np.float32)
    bc[0, :] = 3.0
    bc[:, -1] = -2.0
    u0 = np.array(u)
    u0[0, :] = bc[0, :]
    u0[-1, :] = bc[-1, :]
    u0[:, 0] = bc[:, 0]
    u0[:, -1] = bc[:, -1]
    u_pl, _ = ps.sweep(jnp.asarray(u0), f)
    out = np.asarray(u_pl)
    np.testing.assert_allclose(out[0, :], u0[0, :])
    np.testing.assert_allclose(out[-1, :], u0[-1, :])
    np.testing.assert_allclose(out[:, 0], u0[:, 0])
    np.testing.assert_allclose(out[:, -1], u0[:, -1])


def test_padded_roundtrip_many_sweeps():
    """Iterating entirely on padded buffers equals unpadded stepping."""
    n = 64
    ps, table, pid, u, f = _setup(n, True)
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    lv = GridHierarchy.create(problem).finest
    u0 = jnp.asarray(np.asarray(u) * np.asarray(lv.geo), dtype=jnp.float32)
    u_pad = ps.pad(u0)
    f_pad = ps.pad(f)
    for _ in range(5):
        u_pad, _ = ps.sweep_padded(u_pad, f_pad)
    u_ref = u0
    for _ in range(5):
        u_ref = jacobi.jacobi_step(lv, u_ref, f)
    np.testing.assert_allclose(
        np.asarray(ps.unpad(u_pad)), np.asarray(u_ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("bimaterial", [False, True])
@pytest.mark.parametrize("k", [1, 2, 4])
def test_fused_k_sweeps_match_chain(k, bimaterial):
    """k temporally-fused sweeps equal k single sweeps."""
    n = 64
    ps, table, pid, u, f = _setup(n, bimaterial)
    problem = Problem(
        n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bimaterial else None, dtype=jnp.float32
    )
    lv = GridHierarchy.create(problem).finest
    u0 = jnp.asarray(np.asarray(u) * np.asarray(lv.geo), dtype=jnp.float32)
    u_pad, f_pad = ps.pad(u0), ps.pad(f)
    uk, rsq = ps.sweep_k_padded(u_pad, f_pad, k)
    u_ref = u0
    for _ in range(k):
        u_ref = jacobi.jacobi_step(lv, u_ref, f)
    np.testing.assert_allclose(
        np.asarray(ps.unpad(uk)), np.asarray(u_ref), rtol=1e-4, atol=1e-4
    )
    # rsq is the pre-update residual of the last sweep = post-residual of
    # sweep k-1
    u_km1 = u0
    for _ in range(k - 1):
        u_km1 = jacobi.jacobi_step(lv, u_km1, f)
    r = f - lv.apply(u_km1)
    expected = float(jnp.sum(r[1:-1, 1:-1] ** 2))
    np.testing.assert_allclose(float(rsq), expected, rtol=1e-3)
