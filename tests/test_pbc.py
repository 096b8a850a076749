"""Periodic-BC path: parity with the reference's analytic validation run
(FEANet-periodic.ipynb: n=2^5, rhs = 5 sin(-4 pi (x+1/2)) cos(3 pi y),
46 weighted-Jacobi iterations to EPS 5e-6, residual history starting
0.27434, 0.21556, 0.16937, 0.13309, ...) and against the reference torch
JacobiBlockPBC on random inputs."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.ops import pbc, stencil


def _analytic_setup():
    n = 32
    h = 2.0 / n
    x = np.linspace(-1.0, 1.0, n + 1, dtype=np.float32)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    k, l, m = 5.0, -4.0, 3.0
    rhs = k * np.sin(l * np.pi * (xx + 0.5)) * np.cos(m * np.pi * yy)
    table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
    f_unique = pbc.from_wrapped(jnp.asarray(rhs, dtype=jnp.float32))
    f_conv = pbc.apply_mass_periodic(f_unique, h)
    return n, table, f_conv


def test_pbc_analytic_history_parity():
    n, table, f_conv = _analytic_setup()
    u, hist = pbc.solve_jacobi_pbc(table, f_conv, eps=5e-6, max_iters=2000)
    # reference converges in 46 iterations with this exact history
    assert len(hist) == 46, len(hist)
    ref_head = [0.21556054, 0.16937497, 0.13308503, 0.10457049, 0.08216543]
    np.testing.assert_allclose(hist[:5], ref_head, rtol=1e-4)
    # initial residual (before any sweep) matches too
    r0 = pbc.pbc_interior_norm(f_conv)
    np.testing.assert_allclose(float(r0), 0.27434009, rtol=1e-4)


def test_pbc_wrap_roundtrip():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((8, 8)), dtype=jnp.float32)
    w = pbc.to_wrapped(u)
    assert w.shape == (9, 9)
    np.testing.assert_allclose(np.asarray(w[-1]), np.asarray(w[0]))
    np.testing.assert_allclose(np.asarray(w[:, -1]), np.asarray(w[:, 0]))
    np.testing.assert_allclose(np.asarray(pbc.from_wrapped(w)), np.asarray(u))


def test_constant_in_nullspace():
    table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
    c = jnp.full((16, 16), 3.25, dtype=jnp.float32)
    out = pbc.apply_stencil_periodic(table, c)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_compatibility_shift_matches_reference_formula():
    rng = np.random.default_rng(1)
    n = 16
    h = 2.0 / n
    f = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    fs = pbc.compatibility_shift(f, h)
    # literal reference formula: f - h^2 * sum over the unique grid
    # (MM-FEANet-learnP-pbc.ipynb cell 5: f - h*h*sum(f[:-1,:-1]))
    expected = np.asarray(f) - h * h * np.asarray(f).sum()
    np.testing.assert_allclose(np.asarray(fs), expected, rtol=1e-5)


def test_against_reference_torch_jacobiblockpbc():
    torch = pytest.importorskip("torch")
    import types

    if "meshio" not in sys.modules:
        fake = types.ModuleType("meshio")

        class _Mesh:
            def __init__(self, points, cells):
                self.points, self.cells, self.cell_data = points, cells, {}

            def write(self, *a, **k):
                pass

        fake.Mesh = _Mesh
        sys.modules["meshio"] = fake
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from FEANet.mesh import MeshSquare
    from FEANet.model import KNet, FNet
    from FEANet.jacobi import JacobiBlockPBC

    n = 16
    h = 2.0 / n
    mesh = MeshSquare(2, nnode_edge=n + 1)
    knet = KNet(mesh)
    fnet = FNet(h)
    jac = JacobiBlockPBC(mesh, knet, 2.0 / 3.0)
    rng = np.random.default_rng(2)
    f_raw = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    u0 = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    # wrap-consistent initial field
    u0[:, :, -1, :] = u0[:, :, 0, :]
    u0[:, :, :, -1] = u0[:, :, :, 0]
    with torch.no_grad():
        f_conv_ref = fnet(jac.pbc_boundary(torch.from_numpy(f_raw)))
        u1_ref = jac.jacobi_convolution(torch.from_numpy(u0), f_conv_ref).numpy()[0, 0]

    table = stencil.make_homogeneous_stencil(dtype=jnp.float32)
    f_unique = pbc.from_wrapped(jnp.asarray(f_raw[0, 0]))
    f_conv = pbc.apply_mass_periodic(f_unique, h)
    u1 = pbc.jacobi_step_pbc(table, pbc.from_wrapped(jnp.asarray(u0[0, 0])), f_conv)
    np.testing.assert_allclose(
        np.asarray(pbc.to_wrapped(u1)), u1_ref, rtol=1e-5, atol=1e-5
    )
