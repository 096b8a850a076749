"""Manufactured-solution discretization-error convergence (O(h^2)).

Ports the math of the reference's MATLAB manufactured-Poisson oracle
(reference: Archive/FEM/matlab_manufacturedPoisson/poisson.m + u_exact.m):
on the unit-coefficient Poisson problem -lap(u) = f with

    u*(x, y) = C / ((pi k)^2 + (pi l)^2) * sin(k pi (x+1)) * sin(l pi (y+1))
    f (x, y) = C * sin(k pi (x+1)) * sin(l pi (y+1)),   C=5, k=1, l=2

(coordinates shifted to our [-1, 1]^2 domain; zero Dirichlet boundary), the
bilinear-quad FEM solution converges to u* at the optimal rate: the nodal L2
error scales as O(h^2).  This is the one oracle family with an analytic
answer, so the asserted quantity is the *discretization* error slope — the
algebraic solve is driven far below it with the direct-coarse MG in f64.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import coarse, multigrid

C, K, L = 5.0, 1.0, 2.0


def _fields(n):
    x = np.linspace(-1.0, 1.0, n + 1)
    X, Y = np.meshgrid(x, x, indexing="ij")
    shape_fn = np.sin(K * np.pi * (X + 1.0)) * np.sin(L * np.pi * (Y + 1.0))
    u_star = C / ((np.pi * K) ** 2 + (np.pi * L) ** 2) * shape_fn
    f = C * shape_fn
    return jnp.asarray(u_star), jnp.asarray(f)


def _l2_error(n):
    problem = Problem(n=n, inclusion=None, dtype=jnp.float64)
    hier = GridHierarchy.create(problem, num_levels=max(1, int(np.log2(n)) - 3))
    inv = coarse.coarse_inverse(hier.levels[-1], dtype=jnp.float64)
    u_star, F = _fields(n)
    f = stencil.apply_mass(F.astype(jnp.float64), hier.finest.h)
    u, hist = multigrid.solve(hier, f, eps=1e-9, max_cycles=60, coarse_inv=inv)
    assert hist[-1] <= 1e-9  # algebraic error far below discretization error
    h = hier.finest.h
    return float(np.sqrt(np.sum((np.asarray(u) - np.asarray(u_star)) ** 2)) * h)


def test_manufactured_solution_h2_convergence():
    ns = [16, 32, 64, 128]
    errs = [_l2_error(n) for n in ns]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(ns) - 1)]
    # optimal rate for bilinear quads is 2; allow the usual pre-asymptotic slack
    for r in rates:
        assert 1.85 < r < 2.15, (rates, errs)


def test_manufactured_solution_absolute_error():
    # the n=64 error itself must be small (the solve really approximates u*)
    err = _l2_error(64)
    assert err < 5e-4, err
