"""Experiment-level parity anchors."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"))


def test_mm_poisson_exact_iteration_parity():
    """MM_poisson.ipynb cell 5: 1,486 Jacobi iterations to 1e-5 on TestPoisson
    sample 0 with f64 nets; residual history head 3.77563246, 2.79437585..."""
    from poisson import run

    u, hist, err = run(sample=0, eps=1e-5, use_f64=True)
    assert len(hist) == 1486
    np.testing.assert_allclose(
        hist[:5],
        [3.77563246, 2.79437585, 2.27748734, 1.95233144, 1.72602168],
        rtol=1e-6,
    )
    assert err < 1e-4


def test_mg_test_quick():
    """A reduced n=32 version of the mg_test comparison using the reference
    H-Net checkpoint: MG converges in <= 12 cycles, H-Jacobi beats Jacobi."""
    from mg_test import hjacobi_solve, mg_solve, REF_HNET
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.data import datasets
    from multigrid_feanet_tpu.models import hnet
    from multigrid_feanet_tpu.ops import stencil
    from multigrid_feanet_tpu.solvers import jacobi

    ds = datasets.IsoPoissonDataset.from_h5(
        "/root/reference/Data/IsoPoisson/poisson2d_33x33.h5"
    )
    u_star, f_raw, bc_value, bc_index = ds[0]
    n = 32
    hier = GridHierarchy.create(Problem(n=n))
    f = stencil.apply_mass(jnp.asarray(f_raw), hier.finest.h)
    bc = jnp.asarray(bc_value)
    params = hnet.import_torch_checkpoint(REF_HNET)
    eps = 1e-5

    _, hist_j = jacobi.solve_jacobi(hier.finest, f, bc_value=bc, eps=eps, max_iters=20_000)
    _, hist_h = hjacobi_solve(hier.finest, params, f, bc, eps)
    _, hist_mgj = mg_solve(hier, params, f, bc, eps, mode="jac")
    _, hist_mgh = mg_solve(hier, params, f, bc, eps, mode="hjac")
    # reference n=32: 2,142 Jacobi vs 204 H-Jacobi (learn_iterator cells 6/12)
    assert 1800 < len(hist_j) < 2600, len(hist_j)
    assert len(hist_h) * 5 < len(hist_j)
    assert len(hist_mgj) <= 12
    assert len(hist_mgh) <= len(hist_mgj)
