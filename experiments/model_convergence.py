"""Experiment: V-cycle and Jacobi convergence-factor studies.

Reproduces the reference's MM_Model_convergence.ipynb:
- cell 5: V(1,1) q vs grid size n = 2^1..2^9 (h-independence, q -> ~0.263)
- cell 6: weighted-Jacobi q vs grid size
- cells 9-17: V(nu1, nu2) schedule sweep at n = 2^6

Run:  python experiments/model_convergence.py [--sizes "[1,...,9]"]
Emits a JSON results file and (optionally) the residual-history plot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.solvers import jacobi, multigrid


def random_init(n, key=0, dtype=jnp.float32):
    """Reference-style random init: coef = 1e5 + 5e4*U(2);
    coef0*U(H,W) + coef1 (MM_Model_convergence.ipynb cell 3)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    coef = 100000.0 + 50000.0 * jax.random.uniform(k1, (2,))
    return (coef[0] * jax.random.uniform(k2, (n + 1, n + 1)) + coef[1]).astype(dtype)


def vcycle_q_sweep(sizes=(1, 2, 3, 4, 5, 6, 7, 8, 9), nu=(1, 1), eps=1e-6):
    out = {}
    for s in sizes:
        n = 2**s
        hier = GridHierarchy.create(Problem(n=n))
        f = jnp.zeros((n + 1, n + 1), jnp.float32)
        t0 = time.time()
        _, hist = multigrid.solve(hier, f, u0=random_init(n, key=s), nu1=nu[0], nu2=nu[1], eps=eps)
        out[n] = {
            "q": multigrid.convergence_factor(hist),
            "cycles": len(hist),
            "seconds": time.time() - t0,
        }
        print(f"V{nu} n=2^{s}: q={out[n]['q']:.4f} cycles={out[n]['cycles']} t={out[n]['seconds']:.3f}s")
    return out


def jacobi_q_sweep(sizes=(1, 2, 3, 4), eps=1e-5, cap_iters=2000):
    out = {}
    for s in sizes:
        n = 2**s
        hier = GridHierarchy.create(Problem(n=n), num_levels=1)
        f = jnp.zeros((n + 1, n + 1), jnp.float32)
        kwargs = dict(eps=eps) if s < 5 else dict(eps=None, max_iters=cap_iters)
        t0 = time.time()
        _, hist = jacobi.solve_jacobi(hier.finest, f, u0=random_init(n, key=100 + s), **kwargs)
        out[n] = {"q": float(hist[-1] / hist[-2]), "iters": len(hist), "seconds": time.time() - t0}
        print(f"Jacobi n=2^{s}: q={out[n]['q']:.5f} iters={out[n]['iters']}")
    return out


def schedule_sweep(n=64, schedules=((0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)),
                   eps=1e-6):
    hier = GridHierarchy.create(Problem(n=n))
    f = jnp.zeros((n + 1, n + 1), jnp.float32)
    out = {}
    for nu1, nu2 in schedules:
        _, hist = multigrid.solve(hier, f, u0=random_init(n, key=10 * nu1 + nu2),
                                  nu1=nu1, nu2=nu2, eps=eps)
        out[f"V({nu1},{nu2})"] = multigrid.convergence_factor(hist)
        print(f"V({nu1},{nu2}): q={out[f'V({nu1},{nu2})']:.4f}")
    return out


def main():
    os.makedirs("results", exist_ok=True)
    results = {
        "vcycle_q_vs_n": vcycle_q_sweep(),
        "jacobi_q_vs_n": jacobi_q_sweep(),
        "schedule_sweep_n64": schedule_sweep(),
    }
    with open("results/model_convergence.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print("wrote results/model_convergence.json")


if __name__ == "__main__":
    main()
