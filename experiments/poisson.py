"""Experiment: single-level Jacobi Poisson solve on the TestPoisson dataset.

Reproduces MM_poisson.ipynb: load a sample from
Data/TestPoisson/poisson2d_33x33.h5 (f64), weighted-Jacobi iterate to
EPS 1e-5, record the residual history and the error against the stored
solution (reference converges in 1,486 iterations, BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi

DATA = "/root/reference/Data/TestPoisson/poisson2d_33x33.h5"


def run(sample: int = 0, eps: float = 1e-5, use_f64: bool = True):
    ds = datasets.TestPoissonDataset.from_h5(DATA)
    d_idx, d_val, t_idx, t_val, material, source, solution = ds[sample]
    n = source.shape[0] - 1
    dtype = jnp.float64 if use_f64 else jnp.float32
    hier = GridHierarchy.create(Problem(n=n, dtype=dtype), num_levels=1)
    lv = hier.finest
    f = stencil.apply_mass(jnp.asarray(source, dtype=dtype), lv.h)
    bc = jnp.asarray(d_val, dtype=dtype)  # used directly as boundary_value (MM_poisson cell 5)
    u, hist = jacobi.solve_jacobi(lv, f, bc_value=bc, eps=eps, max_iters=100_000)
    err = float(np.abs(np.asarray(u) - solution).max())
    return u, hist, err


def main():
    os.makedirs("results", exist_ok=True)
    u, hist, err = run()
    out = {"iters": len(hist), "final_res": float(hist[-1]), "max_err_vs_dataset": err}
    print(out)
    with open("results/poisson.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
