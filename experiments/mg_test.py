"""Experiment: Jacobi vs H-Jacobi vs MG(Jacobi) vs MG(H-Jacobi) on the
IsoPoisson dataset — the reference's headline comparison
(M-FEANet-mg_test.ipynb cells 9, 10, 21, 22, 24; BASELINE.md:
24,367 / 2,246 Jacobi/H-Jacobi iterations and 9 / 5 V-cycles at n=128).

The reference's 129x129 dataset file is gitignored upstream; it is
regenerated here with the FEM oracle (same protocol).  The trained H-Net is
imported from the reference checkpoint (trained at 33x33, applied at any n —
it is a stationary conv stack).
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
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.solvers import jacobi, multigrid

REF_HNET = "/root/reference/Model/learn_iterator/iso_poisson/iso_poisson_33x33.pth"


def hjacobi_solve(lv, params, f, bc_value, eps, max_iters=50_000, chunk=128):
    """H-Jacobi iteration in chunked on-device scans (one dispatch per chunk,
    not per sweep)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_chunk(u, f, bc_value, k: int):
        def body(u, _):
            u = hnet.h_relax(lv, params, u, f, 1, bc_value)
            return u, jacobi.interior_norm(f - lv.apply(u))

        return jax.lax.scan(body, u, None, length=k)

    u = jnp.zeros_like(f)
    hist = []
    done = 0
    while done < max_iters:
        k = min(chunk, max_iters - done)
        u, norms = run_chunk(u, f, bc_value, k)
        norms = jax.device_get(norms)
        hist.append(norms)
        done += k
        hit = norms <= eps
        if hit.any():
            hist[-1] = norms[: int(hit.argmax()) + 1]
            break
        if not np.isfinite(norms[-1]):
            break
    return u, np.concatenate(hist)


def mg_solve(hier, params, f, bc_value, eps, mode="jac", max_cycles=100):
    """V-cycle whose smoother is Jacobi or H-Jacobi (reference mg_test cell
    19 MultiGrid) — now the fused whole-solve jit (solvers/hmg.py): one
    compiled while_loop, one host fetch, instead of one dispatch per cycle
    (~30 ms tunnel latency each)."""
    from multigrid_feanet_tpu.solvers import hmg

    return hmg.solve(hier, params, f, bc_value=bc_value, eps=eps, mode=mode,
                     max_cycles=max_cycles)


def main(n=128, eps=5e-5, sample=0):
    os.makedirs("results", exist_ok=True)
    cache = f"results/isopoisson_{n + 1}x{n + 1}.h5"
    if os.path.exists(cache):
        ds = datasets.IsoPoissonDataset.from_h5(cache)
    else:
        print(f"generating {n + 1}x{n + 1} IsoPoisson dataset (FEM oracle)...")
        ds = datasets.generate_isopoisson(n, num_samples=4, seed=7)
        datasets.save_isopoisson(ds, cache)
    u_star, f_raw, bc_value, bc_index = ds[sample]

    hier = GridHierarchy.create(Problem(n=n))
    lv = hier.finest
    f = stencil.apply_mass(jnp.asarray(f_raw), lv.h)
    bc = jnp.asarray(bc_value)
    params = hnet.import_torch_checkpoint(REF_HNET)

    out = {}
    t0 = time.time()
    _, hist = jacobi.solve_jacobi(lv, f, bc_value=bc, eps=eps, max_iters=60_000)
    out["jacobi"] = {"iters": len(hist), "seconds": time.time() - t0}
    t0 = time.time()
    _, hist = hjacobi_solve(lv, params, f, bc, eps)
    out["hjacobi"] = {"iters": len(hist), "seconds": time.time() - t0}
    for mode in ("jac", "hjac"):
        t0 = time.time()
        _, hist = mg_solve(hier, params, f, bc, eps, mode=mode)
        out[f"mg_{mode}"] = {
            "cycles": len(hist),
            "q": float(hist[-1] / hist[-2]) if len(hist) > 1 else None,
            "seconds": time.time() - t0,
        }
    print(json.dumps(out, indent=2))
    with open("results/mg_test.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return out


if __name__ == "__main__":
    main()
