"""Experiment: per-kernel profiling and roofline report.

Times the framework's hot kernels (fused Jacobi sweep k=1/4/8, residual,
transfers, full V-cycle) with amortized in-jit loops and reports nnz/s and
effective HBM bandwidth against the chip's roofline — the structured
replacement for the reference's `time.time()` notebook brackets
(SURVEY.md section 5).  Optionally writes a TensorBoard trace.

  PYTHONPATH=.:/root/.axon_site python experiments/profile_kernels.py [--n 4096] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
from multigrid_feanet_tpu.ops.transfer import prolong_bilinear, restrict_full_weighting
from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy
from multigrid_feanet_tpu.utils import profiling


def amortized(fn_step, x0, iters=100):
    """Seconds per step of a carry-chained in-jit loop (defeats both
    dispatch overhead and loop-invariant hoisting)."""

    @jax.jit
    def run(x):
        def body(c, _):
            return fn_step(c), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree.map(jnp.sum, c)

    r = run(x0)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = time.time()
    r = run(x0)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()
    n = args.n

    phase = geometry.circle_phase(2.0, n)
    pid = stencil.pattern_ids(jnp.asarray(phase))
    ps = PallasStencil(n, pid=pid, interpret=False)
    rng = np.random.default_rng(0)
    f_pad = ps.pad(jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32))
    u_pad = ps.pad(jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32))

    stats = []
    with profiling.trace(args.trace):
        dt = amortized(lambda u: ps.sweep_padded(u, f_pad)[0], u_pad)
        stats.append(profiling.stencil_roofline(n, dt, 13.0, "pallas_sweep_k1"))
        for k in (4, 8):
            dt = amortized(lambda u, k=k: ps.sweep_k_padded(u, f_pad, k)[0], u_pad)
            stats.append(profiling.stencil_roofline(n, dt / k * k, 13.0 / k, f"pallas_sweep_k{k}"))
            stats[-1].seconds_per_call = dt
            stats[-1].nnz_per_s = 9 * (n - 1) ** 2 * k / dt
        dt = amortized(lambda u: ps.residual_padded(u, f_pad)[0], u_pad)
        stats.append(profiling.stencil_roofline(n, dt, 13.0, "pallas_residual"))

        r = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
        dt = amortized(lambda x: x * (1 + 1e-12 * jnp.sum(restrict_full_weighting(x))), r)
        stats.append(profiling.KernelStats("restrict_full_weighting", dt))
        vc = jnp.asarray(rng.standard_normal((n // 2 + 1, n // 2 + 1)), jnp.float32)
        dt = amortized(lambda x: x * (1 + 1e-12 * jnp.sum(prolong_bilinear(x))), vc)
        stats.append(profiling.KernelStats("prolong_bilinear", dt))

        hier = GridHierarchy.create(Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5)))
        ph = PallasHierarchy(hier, pallas_threshold=256)
        f_lv = ph._to_level(0, jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32))
        dt = amortized(lambda u: ph.v_cycle(u, f_lv, 1, 1), ph._zeros(0), iters=20)
        stats.append(profiling.KernelStats("v_cycle_full", dt))

    report = {"n": n, "device": str(jax.devices()[0]),
              "kernels": [s.as_dict() for s in stats]}
    os.makedirs("results", exist_ok=True)
    with open("results/profile_kernels.json", "w") as fh:
        json.dump(report, fh, indent=2)
    for s in stats:
        extra = f"  {s.nnz_per_s / 1e9:8.1f} Gnnz/s" if s.nnz_per_s else ""
        print(f"{s.name:28s} {s.seconds_per_call * 1e6:9.1f} us{extra}")


if __name__ == "__main__":
    main()
