"""H-Net smoother: parity with the reference's trained checkpoint + training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi

REF_CKPT = "/root/reference/Model/learn_iterator/iso_poisson/iso_poisson_33x33.pth"
REF_DATA = "/root/reference/Data/IsoPoisson/poisson2d_33x33.h5"


def _level(n=32):
    return GridHierarchy.create(Problem(n=n, dtype=jnp.float32), num_levels=1).finest


def test_apply_hnet_masking_and_linearity():
    lv = _level(16)
    key = jax.random.PRNGKey(0)
    params = hnet.init_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 17))
    out = hnet.apply_hnet(params, x, lv.geo)
    # boundary ring zeroed by masking
    assert float(jnp.abs(out[0]).max()) == 0.0
    assert float(jnp.abs(out[:, -1]).max()) == 0.0
    # linear: H(a x) = a H(x)
    out2 = hnet.apply_hnet(params, 2.5 * x, lv.geo)
    np.testing.assert_allclose(np.asarray(out2), 2.5 * np.asarray(out), rtol=1e-5)


def test_compose_kernels_matches_chained_convs():
    lv = _level(16)
    params = hnet.init_params(jax.random.PRNGKey(2))
    composed = hnet.compose_kernels(params)  # (7, 7)
    assert composed.shape == (7, 7)
    # applying the composed kernel to a delta field reproduces the chain
    # away from boundaries (no masking in the interior)
    x = jnp.zeros((17, 17)).at[8, 8].set(1.0)
    chained = hnet.apply_hnet(params, x, jnp.ones_like(x))
    np.testing.assert_allclose(
        np.asarray(chained[8 - 3 : 8 + 4, 8 - 3 : 8 + 4]), np.asarray(composed),
        rtol=1e-5, atol=1e-6,
    )


def test_reference_checkpoint_accelerates_jacobi():
    """Parity anchor: the reference's trained 33x33 H-Net reduces iteration
    counts ~10x vs plain Jacobi (2142 -> 204 at n=32, BASELINE.md,
    M-FEANet-learn_iterator.ipynb cells 6/12).  Run one dataset sample from
    the checked-in h5 with the imported checkpoint."""
    params = hnet.import_torch_checkpoint(REF_CKPT)
    assert params.shape == (3, 3, 3)
    ds = datasets.IsoPoissonDataset.from_h5(REF_DATA)
    u_star, f, bc_value, bc_index = ds[0]
    lv = _level(32)
    ff = stencil.apply_mass(jnp.asarray(f), lv.h)
    bc = jnp.asarray(bc_value)

    eps = 1e-5
    # plain Jacobi iterations to eps
    _, hist_jac = jacobi.solve_jacobi(lv, ff, bc_value=bc, eps=eps, max_iters=20_000)

    # H-Jacobi: iterate until the residual (same convention) drops below eps
    u = jnp.zeros((33, 33), jnp.float32)
    n_h = 0
    res = np.inf
    while res > eps and n_h < 5_000:
        u = hnet.h_relax(lv, params, u, ff, 1, bc)
        r = ff - lv.apply(u)
        res = float(jacobi.interior_norm(r))
        n_h += 1
    assert hist_jac[-1] <= eps
    assert res <= eps
    # ~10x speedup, and in the reference's observed range (~200 vs ~2100)
    assert n_h * 5 < len(hist_jac), (n_h, len(hist_jac))
    # converges to the dataset solution
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_star), atol=5e-4)


def test_training_reduces_loss():
    from multigrid_feanet_tpu.learn import train_hnet

    n = 16
    lv = _level(n)
    ds = datasets.generate_isopoisson(n, num_samples=10, seed=0)
    params, losses = train_hnet.train(
        lv, ds, num_epochs=8, batch_size=5, seed=0, k_max=4, verbose=False
    )
    assert losses[-1] < losses[0] * 0.9, losses
