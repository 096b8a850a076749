"""Experiment: train the H-Net learned smoother on the IsoPoisson dataset and
evaluate its Jacobi speedup.

Reproduces M-FEANet-learn_iterator.ipynb: train HJacIterator (Adadelta,
MSE-sum, random k sweeps) on Data/IsoPoisson/poisson2d_33x33.h5, then compare
Jacobi vs H-Jacobi iteration counts to EPS 1e-5 at n=32 (reference:
2,142 -> 204, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.learn import train_hnet
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi
from multigrid_feanet_tpu.utils import checkpoint

DATA = "/root/reference/Data/IsoPoisson/poisson2d_33x33.h5"


def main(epochs=200, batch_size=5, k_max=20, seed=0, sample=0, eps=1e-5):
    os.makedirs("results/learn_iterator", exist_ok=True)
    ds = datasets.IsoPoissonDataset.from_h5(DATA)
    n = ds.f.shape[-1] - 1
    hier = GridHierarchy.create(Problem(n=n), num_levels=1)
    lv = hier.finest

    params, losses = train_hnet.train(
        lv, ds, num_epochs=epochs, batch_size=batch_size, seed=seed, k_max=k_max,
        log_every=25,
    )
    checkpoint.save("results/learn_iterator/hnet.npz", params)
    np.save("results/learn_iterator/loss.npy", losses)

    # evaluation on one dataset sample
    u_star, f_raw, bc_value, bc_index = ds[sample]
    f = stencil.apply_mass(jnp.asarray(f_raw), lv.h)
    bc = jnp.asarray(bc_value)
    _, hist_jac = jacobi.solve_jacobi(lv, f, bc_value=bc, eps=eps, max_iters=20_000)
    u = jnp.zeros_like(f)
    n_h, res = 0, np.inf
    while res > eps and n_h < 10_000:
        u = hnet.h_relax(lv, params, u, f, 1, bc)
        res = float(jacobi.interior_norm(f - lv.apply(u)))
        n_h += 1
    out = {
        "final_train_loss": float(losses[-1]),
        "jacobi_iters": len(hist_jac),
        "hjacobi_iters": n_h,
        "speedup": len(hist_jac) / max(n_h, 1),
        "max_err_vs_dataset": float(jnp.abs(u - jnp.asarray(u_star)).max()),
    }
    print(json.dumps(out, indent=2))
    with open("results/learn_iterator/summary.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return out


if __name__ == "__main__":
    main()
