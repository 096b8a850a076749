"""Stencil assembly and application correctness.

Oracle: rows of the dense quadrature-assembled FEM matrix (data/fem.py) must
equal the gathered per-node 3x3 stencils, and the gather-FMA application must
match both the dense matvec and the 16-channel conv parity path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.data import fem
from multigrid_feanet_tpu.ops import stencil


def dense_row_as_kernel(K, i, j, n_nodes):
    """Extract the 3x3 neighbourhood of dense-matrix row (i, j)."""
    row = K[i * n_nodes + j].reshape(n_nodes, n_nodes)
    return row[i - 1 : i + 2, j - 1 : j + 2]


def test_homogeneous_stencil_matches_dense_fem():
    n = 8
    K, _ = fem.assemble(n, size=2.0, phase=None, coefficients=(1.0,))
    s = np.asarray(stencil.make_homogeneous_stencil(dtype=jnp.float64))
    for i, j in [(1, 1), (3, 5), (4, 4), (n - 1, n - 1)]:
        np.testing.assert_allclose(dense_row_as_kernel(K, i, j, n + 1), s, atol=1e-12)
    # classical FEM 9-point Laplace stencil: 8/3 center, -1/3 elsewhere
    np.testing.assert_allclose(s[1, 1], 8.0 / 3.0, atol=1e-12)
    np.testing.assert_allclose(s[0, 0], -1.0 / 3.0, atol=1e-12)
    np.testing.assert_allclose(s[0, 1], -1.0 / 3.0, atol=1e-12)


def test_bimaterial_stencil_table_matches_dense_fem():
    n = 16
    coeffs = (1.0, 20.0)
    phase = geometry.circle_phase(2.0, n)
    K, _ = fem.assemble(n, size=2.0, phase=phase, coefficients=coeffs)
    table = np.asarray(stencil.make_stencil_table(coeffs, dtype=jnp.float64))
    pid = np.asarray(stencil.pattern_ids(jnp.asarray(phase)))
    for i in range(1, n):
        for j in range(1, n):
            np.testing.assert_allclose(
                dense_row_as_kernel(K, i, j, n + 1),
                table[pid[i, j]],
                atol=1e-12,
                err_msg=f"node ({i},{j}) pid={pid[i, j]}",
            )


def test_pattern_ids_all_16_patterns_present():
    n = 32
    phase = geometry.circle_phase(2.0, n)
    pid = np.asarray(stencil.pattern_ids(jnp.asarray(phase)))
    assert pid.shape == (n + 1, n + 1)
    assert pid.dtype == np.int8
    # interface geometry at n=32 exercises a healthy variety of patterns
    assert len(np.unique(pid)) >= 8


def test_apply_stencil_matches_dense_matvec():
    n = 16
    phase = geometry.circle_phase(2.0, n)
    K, _ = fem.assemble(n, phase=phase)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((n + 1, n + 1))
    table = stencil.make_stencil_table(dtype=jnp.float64)
    pid = stencil.pattern_ids(jnp.asarray(phase))
    out = np.asarray(stencil.apply_stencil(table, pid, jnp.asarray(u)))
    expected = (K @ u.reshape(-1)).reshape(n + 1, n + 1)
    # boundary rows differ (stencil uses zero-padded ghosts); interior must match
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-10)


def test_apply_stencil_matches_conv_parity_path():
    n = 32
    phase = geometry.circle_phase(2.0, n)
    table = stencil.make_stencil_table(dtype=jnp.float32)
    pid = stencil.pattern_ids(jnp.asarray(phase))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)), dtype=jnp.float32)
    a = stencil.apply_stencil(table, pid, u)
    b = stencil.apply_stencil_conv(table, pid, u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_homogeneous_apply_batched():
    table = stencil.make_homogeneous_stencil()
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((3, 17, 17)), dtype=jnp.float32)
    out = stencil.apply_stencil(table, None, u)
    assert out.shape == u.shape
    # constant field: A u interior = 0 for Laplace (row sums vanish)
    ones = jnp.ones((17, 17))
    z = np.asarray(stencil.apply_stencil(table, None, ones))
    np.testing.assert_allclose(z[1:-1, 1:-1], 0.0, atol=1e-6)


def test_mass_apply_matches_dense_mass():
    n = 12
    h = 2.0 / n
    _, M = fem.assemble(n)
    rng = np.random.default_rng(3)
    f = rng.standard_normal((n + 1, n + 1))
    out = np.asarray(stencil.apply_mass(jnp.asarray(f), h))
    expected = (M @ f.reshape(-1)).reshape(n + 1, n + 1)
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-10)


def test_reference_pattern_permutation_is_bijection():
    perm = stencil.reference_pattern_permutation()
    assert sorted(perm.tolist()) == list(range(16))
    # reference key 0 = all phase-0, key 1 = all phase-1
    assert perm[0] == 0
    assert perm[1] == 15


def test_diagonal():
    n = 16
    phase = geometry.circle_phase(2.0, n)
    table = stencil.make_stencil_table(dtype=jnp.float64)
    pid = stencil.pattern_ids(jnp.asarray(phase))
    d = np.asarray(stencil.stencil_diagonal(table, pid))
    coeff = np.asarray(stencil.gather_coefficients(table, pid))
    np.testing.assert_allclose(d, coeff[..., 1, 1])
    # homogeneous corner of the domain: center value 8/3
    np.testing.assert_allclose(d[1, 1], 8.0 / 3.0, atol=1e-12)
