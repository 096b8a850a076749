"""Repeat-run determinism of the hot paths (the TPU build's substitute for
the reference's single-threaded reproducibility).

XLA programs are deterministic given identical inputs, but that guarantee is
worth testing at the integration level: the sharded V-cycle (GSPMD inserts
collective-permute halo exchanges and psum norm reductions whose reduction
order could in principle vary) and the Pallas kernels (manual DMA + scratch
reuse; stale scratch must never leak into outputs) must produce bitwise-
identical results across repeated invocations and across fresh compilations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
from multigrid_feanet_tpu.parallel import sharding
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy

INTERFACE = ("circle", (0.0, 0.0), 0.5)


def test_sharded_solve_bitwise_deterministic():
    mesh = sharding.make_mesh(8, dp=2)
    hier = GridHierarchy.create(Problem(n=32, inclusion=INTERFACE, dtype=jnp.float32))
    dh = sharding.DistributedHierarchy(hier, mesh, replicate_below=17)
    f = stencil.apply_mass(jnp.ones((33, 33), jnp.float32), hier.finest.h)
    u1, k1, r1 = dh.solve(f, nu1=1, nu2=1, eps=1e-5, max_cycles=30)
    u2, k2, r2 = dh.solve(f, nu1=1, nu2=1, eps=1e-5, max_cycles=30)
    assert k1 == k2 and r1 == r2
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    # a freshly constructed hierarchy (fresh compilation) must agree too
    dh2 = sharding.DistributedHierarchy(hier, mesh, replicate_below=17)
    u3, k3, _ = dh2.solve(f, nu1=1, nu2=1, eps=1e-5, max_cycles=30)
    assert k3 == k1
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u3))


def test_pallas_sweep_bitwise_deterministic():
    n = 64
    phase = np.zeros((n, n), np.float32)
    phase[20:40, 20:40] = 1.0
    pid = stencil.pattern_ids(jnp.asarray(phase))
    ps = PallasStencil(n, pid=pid, coefficients=(1.0, 20.0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    outs = [ps.sweep(u, f) for _ in range(3)]
    for u_new, rsq in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(u_new))
        assert float(outs[0][1]) == float(rsq)


def test_pallas_solve_deterministic():
    hier = GridHierarchy.create(Problem(n=64, dtype=jnp.float32))
    ph = PallasHierarchy(hier, pallas_threshold=32)
    key = jax.random.PRNGKey(1)
    u0 = jax.random.uniform(key, (65, 65), jnp.float32)
    f0 = jnp.zeros((65, 65), jnp.float32)
    u1, h1 = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=40)
    u2, h2 = ph.solve(f0, u0=u0, eps=1e-6, max_cycles=40)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(h1, h2)
