"""Elasticity operator family: block-stencil assembly vs the dense vector FEM
oracle, block-Jacobi smoothing, and multigrid convergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.ops import stencil as scalar_stencil
from multigrid_feanet_tpu.solvers import elastic

E, NU = 212e3, 0.288  # reference: Plane_Stress_modify.m:11-12


def test_element_stiffness_properties():
    ke = el.element_stiffness_elastic(E, NU, h=0.125)
    np.testing.assert_allclose(ke, ke.T, atol=1e-6 * E)
    # rigid-body modes: translations and in-plane rotation are in the kernel
    w = np.linalg.eigvalsh(ke)
    assert (np.abs(w[:3]) < 1e-6 * E).all()
    assert w[3] > 1e-3


def test_elastic_stencil_matches_dense_fem():
    n = 8
    phase = geometry.circle_phase(2.0, n)
    coeffs = (1.0, 10.0)
    K = fem.assemble_elastic(n, E, NU, phase=phase, coefficients=coeffs)
    table = el.make_elastic_stencil_table(E, NU, 2.0 / n, coeffs, dtype=jnp.float64)
    pid = scalar_stencil.pattern_ids(jnp.asarray(phase))
    H = n + 1
    blocks = np.asarray(el.pattern_block_table(table, pid))
    for i in range(1, n):
        for j in range(1, n):
            p = i * H + j
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    q = (i + di) * H + (j + dj)
                    dense_blk = K[2 * p : 2 * p + 2, 2 * q : 2 * q + 2]
                    np.testing.assert_allclose(
                        blocks[i, j, di + 1, dj + 1], dense_blk, atol=1e-6 * E,
                        err_msg=f"node ({i},{j}) offset ({di},{dj})",
                    )


def test_apply_matches_dense_matvec():
    n = 8
    K = fem.assemble_elastic(n, E, NU)
    table = el.make_elastic_stencil_table(E, NU, 2.0 / n, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    H = n + 1
    u = rng.standard_normal((2, H, H))
    # dense uses interleaved DOFs
    uv = np.empty(2 * H * H)
    uv[0::2] = u[0].reshape(-1)
    uv[1::2] = u[1].reshape(-1)
    expected = K @ uv
    out = np.asarray(el.apply_elastic_stencil(table, None, jnp.asarray(u)))
    np.testing.assert_allclose(
        out[0, 1:-1, 1:-1], expected[0::2].reshape(H, H)[1:-1, 1:-1], atol=1e-8 * E
    )
    np.testing.assert_allclose(
        out[1, 1:-1, 1:-1], expected[1::2].reshape(H, H)[1:-1, 1:-1], atol=1e-8 * E
    )


def test_elastic_multigrid_converges_to_oracle():
    n = 16
    levels = build = elastic.build_elastic_hierarchy(n, E=1.0, nu=0.3, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    f_raw = rng.standard_normal((2, n + 1, n + 1))
    # load vector: scalar consistent mass per component
    from multigrid_feanet_tpu.ops import stencil

    f = jnp.stack([
        stencil.apply_mass(jnp.asarray(f_raw[0]), levels[0].h),
        stencil.apply_mass(jnp.asarray(f_raw[1]), levels[0].h),
    ])
    u, hist = elastic.solve(levels, f, nu1=2, nu2=2, eps=1e-11, max_cycles=400)
    u_ref = fem.solve_dirichlet_elastic(n, f_raw, E=1.0, nu=0.3)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)
    # multigrid efficiency: well under the 400-cycle cap
    assert len(hist) < 150, len(hist)


def test_elastic_bimaterial_converges():
    n = 16
    levels = elastic.build_elastic_hierarchy(
        n, E=1.0, nu=0.3, inclusion=("circle", (0.0, 0.0), 0.5),
        coefficients=(1.0, 10.0), dtype=jnp.float64,
    )
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)) * (2.0 / n) ** 2)
    u, hist = elastic.solve(levels, f, nu1=2, nu2=2, eps=1e-10, max_cycles=400)
    assert hist[-1] <= 1e-10
    phase = geometry.circle_phase(2.0, n)
    # residual check against dense operator
    K = fem.assemble_elastic(n, 1.0, 0.3, phase=phase, coefficients=(1.0, 10.0))
    H = n + 1
    uv = np.empty(2 * H * H)
    un = np.asarray(u)
    uv[0::2] = un[0].reshape(-1)
    uv[1::2] = un[1].reshape(-1)
    fv = np.empty(2 * H * H)
    fn = np.asarray(f)
    fv[0::2] = fn[0].reshape(-1)
    fv[1::2] = fn[1].reshape(-1)
    r = (fv - K @ uv).reshape(H, H, 2)
    assert np.abs(r[1:-1, 1:-1]).max() < 1e-8


def test_bitplane_apply_matches_gather():
    n = 16
    phase = geometry.circle_phase(2.0, n)
    pid = scalar_stencil.pattern_ids(jnp.asarray(phase))
    coeffs = (1.0, 10.0)
    table = el.make_elastic_stencil_table(E, NU, 2.0 / n, coeffs, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)))
    a = el.apply_elastic_stencil(table, pid, u)
    b = el.apply_elastic_bitplane(pid, u, E, NU, coeffs[0], coeffs[1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-8 * E)
