"""Numeric parity against the reference's own torch implementation.

These tests import the reference package read-only from /root/reference
(torch CPU; meshio stubbed) and compare its operators and cycles against
ours on identical inputs.  They are the strongest parity anchors: exact
(f32-tolerance) agreement of KNet / FNet / learned transfers / the learned
V-cycle iterate, including imported trained checkpoints.
"""

import glob
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.ops import stencil

REF = "/root/reference"


@pytest.fixture(scope="module")
def refpkg():
    """Import the reference FEANet package with meshio stubbed and its
    Relax n_iter bug patched (as the reference's own notebooks do)."""
    if "meshio" not in sys.modules:
        fake = types.ModuleType("meshio")

        class _Mesh:
            def __init__(self, points, cells):
                self.points, self.cells, self.cell_data = points, cells, {}

            def write(self, *a, **k):
                pass

        fake.Mesh = _Mesh
        sys.modules["meshio"] = fake
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from FEANet import multigrid as refmg_mod

    def _relax(self, v, f, num_sweeps):
        for _ in range(num_sweeps):
            v = self.jac.jacobi_convolution(v, f)
        return v

    refmg_mod.SingleGrid.Relax = _relax
    return refmg_mod


def _ref_mg(refpkg, n):
    import torch

    R = torch.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=torch.float32) / 16.0
    P = torch.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=torch.float32) / 4.0
    return refpkg.MultiGrid(n, R, P, torch.tensor([4.0, 1.0]))


def _hier(n):
    return GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    )


def test_knet_fnet_parity(refpkg):
    import torch

    n = 16
    ref = _ref_mg(refpkg, n)
    hier = _hier(n)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    with torch.no_grad():
        ku_ref = ref.grids[0].Knet(torch.from_numpy(x)).numpy()[0, 0]
        f_ref = ref.grids[0].fnet(torch.from_numpy(x)).numpy()[0, 0]
    ku = np.asarray(hier.finest.apply(jnp.asarray(x[0, 0])))
    ff = np.asarray(stencil.apply_mass(jnp.asarray(x[0, 0]), hier.finest.h))
    np.testing.assert_allclose(ku[1:-1, 1:-1], ku_ref[1:-1, 1:-1], atol=5e-5)
    np.testing.assert_allclose(ff, f_ref, atol=1e-6)


def test_jacobi_sweep_parity(refpkg):
    import torch

    n = 16
    ref = _ref_mg(refpkg, n)
    hier = _hier(n)
    from multigrid_feanet_tpu.solvers import jacobi

    rng = np.random.default_rng(1)
    u = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    f = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.grids[0].jac.jacobi_convolution(
            torch.from_numpy(u), torch.from_numpy(f)
        ).numpy()[0, 0]
    out = np.asarray(jacobi.jacobi_step(hier.finest, jnp.asarray(u[0, 0]), jnp.asarray(f[0, 0])))
    np.testing.assert_allclose(out, out_ref, atol=5e-5)


@pytest.mark.parametrize("load_ckpt", [False, True])
def test_learned_vcycle_iterate_parity(refpkg, load_ckpt):
    import torch

    n = 16
    ref = _ref_mg(refpkg, n)
    if load_ckpt:
        paths = sorted(
            glob.glob(f"{REF}/Model/learn_intergrid_operator/multigrid_rhs_res/*.pth")
        )
        if not paths:
            pytest.skip("no reference checkpoints")
        ref.load_state_dict(torch.load(paths[0], map_location="cpu"), strict=False)
        params = intergrid.import_torch_checkpoint(paths[0])
    else:
        params = intergrid.IntergridParams.init()
    hier = _hier(n)
    rng = np.random.default_rng(2)
    F = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    x0 = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    with torch.no_grad():
        f_ref = ref.grids[0].fnet(torch.from_numpy(F))
        out_ref = ref.iterate(torch.from_numpy(x0), f_ref).numpy()[0, 0]
    f = stencil.apply_mass(jnp.asarray(F[0]), hier.finest.h)
    out = np.asarray(
        intergrid.learned_v_cycle(hier, params, jnp.asarray(x0[0]), f)
    )[0]
    np.testing.assert_allclose(out, out_ref, atol=2e-4)


def test_learned_transfer_parity_with_checkpoint(refpkg):
    import torch

    n = 16
    ref = _ref_mg(refpkg, n)
    paths = sorted(glob.glob(f"{REF}/Model/learn_intergrid_operator/multigrid_rhs_res/*.pth"))
    if not paths:
        pytest.skip("no reference checkpoints")
    ref.load_state_dict(torch.load(paths[0], map_location="cpu"), strict=False)
    params = intergrid.import_torch_checkpoint(paths[0])
    hier = _hier(n)
    rng = np.random.default_rng(3)
    r = rng.standard_normal((1, 1, n + 1, n + 1)).astype(np.float32)
    vc = rng.standard_normal((1, 1, n // 2 + 1, n // 2 + 1)).astype(np.float32)
    with torch.no_grad():
        rc_ref = (ref.w[0] * ref.Restrict(ref.grids[0].Knet.split_x(torch.from_numpy(r)))).numpy()[0, 0]
        ef_ref = (ref.w[1] * ref.Interpolate(ref.grids[1].Knet.split_x(torch.from_numpy(vc)))).numpy()[0, 0]
    rc = np.asarray(intergrid.restrict_learned(params, jnp.asarray(r[0]), hier.finest.pid))[0]
    ef = np.asarray(intergrid.prolong_learned(params, jnp.asarray(vc[0]), hier.levels[1].pid))[0]
    np.testing.assert_allclose(rc, rc_ref, atol=1e-5)
    np.testing.assert_allclose(ef, ef_ref, atol=1e-5)
