"""Coverage of remaining reference capabilities: train-small/test-large
transplant, f=0 error-decay training, PBC dataset generation, checkpoint
round-trip, VTK export, distributed determinism."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi


def test_train_small_test_large_transplant():
    """The reference's mgTest protocol (kernel_split_res cell 18): learned
    R/P kernels trained at one grid size transplant unchanged into a
    larger-n hierarchy (kernels are pattern-indexed, not grid-indexed)."""
    params = intergrid.IntergridParams.init()
    for n in (16, 64):
        hier = GridHierarchy.create(
            Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
        )
        f = stencil.apply_mass(jnp.ones((1, n + 1, n + 1), jnp.float32), hier.finest.h)
        u = jnp.zeros_like(f)
        for _ in range(25):
            u = intergrid.learned_v_cycle(hier, params, u, f)
        res = float(jacobi.interior_norm(f - hier.finest.apply(u))[0])
        assert res < 5e-5, (n, res)


def test_error_decay_training_runs():
    from multigrid_feanet_tpu.learn import train_intergrid

    hier = GridHierarchy.create(Problem(n=16, dtype=jnp.float32), num_levels=2)
    state = train_intergrid.init_state(0, num_patterns=1)  # homogeneous: 1-channel R/P
    shape_arr = jnp.zeros((4, 17, 17), jnp.float32)
    losses = []
    for _ in range(10):
        state, loss = train_intergrid.train_step_error_decay(hier, state, shape_arr)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 1.0  # q_m of a contraction is < 1


def test_pbc_dataset_generation_roundtrip(tmp_path):
    ds = datasets.generate_isopoisson_pbc(16, num_samples=3, seed=0)
    assert ds.f.shape == (3, 17, 17)
    # periodic wrap: last row/col duplicate the first
    np.testing.assert_allclose(ds.f[0][-1], ds.f[0][0])
    np.testing.assert_allclose(ds.f[0][:, -1], ds.f[0][:, 0])
    p = str(tmp_path / "pbc.h5")
    datasets.save_isopoisson_pbc(ds, p)
    ds2 = datasets.IsoPoissonPBCDataset.from_h5(p)
    np.testing.assert_allclose(ds2.f, ds.f)


def test_checkpoint_roundtrip_npz(tmp_path):
    from multigrid_feanet_tpu.utils import checkpoint

    tree = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 2)), jnp.zeros(3))}
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, tree)
    out = checkpoint.load(p, like=tree)
    np.testing.assert_allclose(out["a"], np.arange(4.0))
    np.testing.assert_allclose(out["b"][0], np.ones((2, 2)))


def test_vtk_export(tmp_path):
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.utils import vtk

    n = 8
    u = np.random.default_rng(0).standard_normal((n + 1, n + 1))
    phase = geometry.circle_phase(2.0, n)
    p = str(tmp_path / "field.vtk")
    vtk.write_quad_mesh(p, n, point_data={"u": u}, cell_data={"Phase": phase})
    text = open(p).read()
    assert "STRUCTURED_GRID" in text
    assert f"POINTS {(n + 1) ** 2} float" in text
    assert "SCALARS u float" in text
    assert "SCALARS Phase float" in text


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_solve_deterministic():
    """Race-detection stand-in: the sharded solve is bitwise deterministic
    across runs (fixed collectives schedule)."""
    from multigrid_feanet_tpu.parallel import sharding

    n = 32
    hier = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
    mesh = sharding.make_mesh(8)
    dh = sharding.DistributedHierarchy(hier, mesh, replicate_below=17)
    f = stencil.apply_mass(jnp.ones((n + 1, n + 1), jnp.float32), hier.finest.h)
    u1, k1, r1 = dh.solve(f, eps=1e-5)
    u2, k2, r2 = dh.solve(f, eps=1e-5)
    assert k1 == k2 and r1 == r2
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_rect_inclusion_variant():
    """MM_InterfaceRect_error variant: square inclusion (mesh.py place_rect);
    solver converges and matches the FEM oracle."""
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.data import fem
    from multigrid_feanet_tpu.solvers import multigrid

    n = 32
    hier = GridHierarchy.create(
        Problem(n=n, inclusion=("rect", (0.0, 0.0), 0.5), dtype=jnp.float64)
    )
    f_raw = np.ones((n + 1, n + 1))
    f = stencil.apply_mass(jnp.asarray(f_raw), hier.finest.h)
    u, hist = multigrid.solve(hier, f, nu1=2, nu2=2, eps=1e-11, max_cycles=200)
    phase = geometry.rect_phase(2.0, n)
    u_ref = fem.solve_dirichlet(n, f_raw, phase=phase)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)


def test_plot_utils_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.utils import plot as plot_utils

    n = 8
    u = np.random.default_rng(0).standard_normal((n + 1, n + 1))
    pid = stencil.pattern_ids(jnp.asarray(geometry.circle_phase(2.0, n)))
    plot_utils.plot_field(u, fname=str(tmp_path / "f.png"))
    plot_utils.plot_pattern(np.asarray(pid), key=0, fname=str(tmp_path / "p.png"))
    plot_utils.plot_residual_history({"jac": [1.0, 0.5, 0.1]}, fname=str(tmp_path / "h.png"))
    assert (tmp_path / "f.png").exists()


def test_batched_solvers_vmap():
    """The reference's batch axis (N,1,H,W): our XLA ops broadcast over
    leading dims, and whole solves vmap."""
    n = 16
    hier = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
    lv = hier.finest
    rng = np.random.default_rng(5)
    F = jnp.asarray(rng.standard_normal((3, n + 1, n + 1)), dtype=jnp.float32)
    f = stencil.apply_mass(F, lv.h)

    from multigrid_feanet_tpu.solvers import multigrid

    def one_cycle(fi):
        u = jnp.zeros_like(fi)
        for _ in range(12):
            u = multigrid.v_cycle(hier, u, fi, 1, 1)
        return u

    u_batched = jax.vmap(one_cycle)(f)
    for i in range(3):
        u_i = one_cycle(f[i])
        np.testing.assert_allclose(
            np.asarray(u_batched[i]), np.asarray(u_i), rtol=1e-5, atol=1e-6
        )
