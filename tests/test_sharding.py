"""Distributed execution on the virtual 8-device CPU mesh (fake-pod)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.parallel import sharding
from multigrid_feanet_tpu.solvers import multigrid

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_factorization():
    mesh = sharding.make_mesh(8)
    assert mesh.devices.shape == (1, 2, 4) or mesh.devices.shape == (1, 4, 2)
    mesh2 = sharding.make_mesh(8, dp=2)
    assert mesh2.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dp", "x", "y")


def test_sharded_apply_matches_single_device():
    n = 64
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    mesh = sharding.make_mesh(8)
    dh = sharding.DistributedHierarchy(hier, mesh, replicate_below=17)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)

    @jax.jit
    def sharded_apply(u):
        up = dh._c(0, dh.pad_field(0, u))
        return dh.unpad_field(0, dh.levels[0].apply(up))

    out = np.asarray(sharded_apply(u))
    ref = np.asarray(hier.finest.apply(u))
    # pad-adjacent boundary rows read ghost zeros vs nothing — interior only
    np.testing.assert_allclose(out[1:-1, 1:-1], ref[1:-1, 1:-1], rtol=1e-5, atol=1e-5)


def test_distributed_vcycle_solve_matches_single_device():
    n = 64
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    mesh = sharding.make_mesh(8)
    dh = sharding.DistributedHierarchy(hier, mesh, replicate_below=33)
    f = stencil.apply_mass(jnp.ones((n + 1, n + 1), dtype=jnp.float32), hier.finest.h)
    u_ref, hist_ref = multigrid.solve(hier, f, nu1=1, nu2=1, eps=5e-5)
    u, k, res = dh.solve(f, nu1=1, nu2=1, eps=5e-5)
    assert k == len(hist_ref)
    assert res <= 5e-5
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=1e-3, atol=1e-5)


def test_sharded_hnet_train_step_runs():
    from multigrid_feanet_tpu.learn import train_hnet

    n = 32
    hier = GridHierarchy.create(Problem(n=n, dtype=jnp.float32), num_levels=1)
    mesh = sharding.make_mesh(8, dp=2)
    step = sharding.sharded_hnet_train_step(mesh)
    state = train_hnet.init_state(hier.finest, seed=0)
    rng = np.random.default_rng(1)
    B = 4
    u_star = jnp.asarray(rng.standard_normal((B, n + 1, n + 1)), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((B, n + 1, n + 1)), dtype=jnp.float32)
    bc_value = jnp.zeros((B, n + 1, n + 1), dtype=jnp.float32)
    bc_index = jnp.ones((B, n + 1, n + 1), dtype=jnp.float32)
    state2, loss = step(hier.finest, state, u_star, f, bc_value, bc_index)
    assert np.isfinite(float(loss))
    # a second step with the new state also runs (shapes/shardings stable)
    state3, loss2 = step(hier.finest, state2, u_star, f, bc_value, bc_index)
    assert np.isfinite(float(loss2))


def test_shardmap_explicit_halo_jacobi_matches_gspmd():
    """The explicit shard_map + ppermute halo-exchange sweep equals the
    single-device Jacobi step on the padded layout."""
    n = 64
    problem = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    mesh2d = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("x", "y")
    )
    dh = sharding.DistributedHierarchy(
        GridHierarchy.create(problem),
        sharding.make_mesh(8),
        replicate_below=0,
    )
    lv = hier.finest
    Hp, Wp = dh.shapes[0]
    rng = np.random.default_rng(0)
    u = np.zeros((Hp, Wp), np.float32)
    u[: n + 1, : n + 1] = rng.standard_normal((n + 1, n + 1))
    f = np.zeros((Hp, Wp), np.float32)
    f[: n + 1, : n + 1] = rng.standard_normal((n + 1, n + 1))
    pid_pad = np.zeros((Hp, Wp), np.int8)
    pid_pad[: n + 1, : n + 1] = np.asarray(lv.pid)

    step = sharding.shardmap_jacobi_step(mesh2d, n + 1, n + 1, lv.a0, lv.a1)
    out = np.asarray(step(jnp.asarray(u), jnp.asarray(f), jnp.asarray(pid_pad)))

    # reference: single-device sweep with boundary-keep semantics
    from multigrid_feanet_tpu.ops import stencil as st

    au = np.asarray(st.apply_stencil_bitplane(jnp.asarray(pid_pad), jnp.asarray(u),
                                              lv.a0, lv.a1))
    d = np.asarray(st.stencil_diagonal(
        st.make_stencil_table((lv.a0, lv.a1), dtype=jnp.float32), jnp.asarray(pid_pad)))
    r = f - au
    interior = np.zeros((Hp, Wp), bool)
    interior[1:n, 1:n] = True
    expected = np.where(interior, u + (2.0 / 3.0) / d * r, u)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_shardmap_overlap_jacobi_bitwise():
    """The halo/compute-overlapped step (interior + rim split, ppermutes
    issued before the interior compute) equals the synchronous
    shardmap_jacobi_step to within a couple of ULPs (identical tap order per node;
    XLA fuses the sliced regions into different kernels, whose
    FMA-contraction choices can differ in the last bit), hom and
    bi-material."""
    n = 64
    for bim in (False, True):
        problem = Problem(
            n=n, inclusion=("circle", (0.0, 0.0), 0.5) if bim else None,
            dtype=jnp.float32)
        hier = GridHierarchy.create(problem)
        lv = hier.finest
        mesh2d = jax.sharding.Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
        dh = sharding.DistributedHierarchy(
            hier, sharding.make_mesh(8), replicate_below=0)
        Hp, Wp = dh.shapes[0]
        rng = np.random.default_rng(1)
        u = np.zeros((Hp, Wp), np.float32)
        u[: n + 1, : n + 1] = rng.standard_normal((n + 1, n + 1))
        f = np.zeros((Hp, Wp), np.float32)
        f[: n + 1, : n + 1] = rng.standard_normal((n + 1, n + 1))
        pid_pad = np.zeros((Hp, Wp), np.int8)
        if bim:
            pid_pad[: n + 1, : n + 1] = np.asarray(lv.pid)
        a0 = lv.a0 if bim else 1.0
        a1 = lv.a1 if bim else None

        sync = sharding.shardmap_jacobi_step(mesh2d, n + 1, n + 1, a0, a1)
        over = sharding.shardmap_jacobi_step_overlap(mesh2d, n + 1, n + 1, a0, a1)
        args = (jnp.asarray(u), jnp.asarray(f), jnp.asarray(pid_pad))
        a, b = np.asarray(over(*args)), np.asarray(sync(*args))
        # a couple of ulps at O(1) magnitudes
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=5e-7)
