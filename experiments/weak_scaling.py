"""Weak-scaling harness: fused-sweep throughput vs device count.

Protocol (BASELINE.json: >=80% nnz/s efficiency at 2+ hosts): fix the
per-device tile (default 4096^2 nodes) and grow the global grid with the
mesh; measure fused Jacobi sweeps/s on the distributed operator and report
nnz/s and efficiency relative to the single-device rate.

On this container only one real TPU chip is reachable, so multi-device rows
run on the virtual CPU mesh (fake-pod — correctness/compile validation, not
timing truth); on a real pod slice the same script produces the scaling
table over ICI.  Single-chip TPU rates come from bench.py.
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
from jax.sharding import PartitionSpec as P

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.parallel import sharding
from multigrid_feanet_tpu.solvers import jacobi as jac


def measure(mesh, n_global: int, iters: int = 50) -> float:
    """Seconds per distributed fused Jacobi sweep at n_global."""
    hier = GridHierarchy.create(Problem(n=n_global, dtype=jnp.float32), num_levels=1)
    dh = sharding.DistributedHierarchy(hier, mesh, replicate_below=0)
    lv = dh.levels[0]
    Hp, Wp = dh.shapes[0]
    f = jnp.zeros((Hp, Wp), jnp.float32)
    u0 = jnp.zeros((Hp, Wp), jnp.float32)

    @jax.jit
    def run(u, f):
        u = dh._c(0, u)
        f = dh._c(0, f)

        def body(u, _):
            return dh._c(0, jac.jacobi_step(lv, u, f)), None

        u, _ = jax.lax.scan(body, u, None, length=iters)
        return u

    out = run(u0, f)
    out.block_until_ready()
    t0 = time.time()
    out = run(u0, f)
    out.block_until_ready()
    return (time.time() - t0) / iters


def main(per_device_n: int = 1024, device_counts=(1, 2, 4, 8)):
    rows = []
    base_rate = None
    for d in device_counts:
        if d > len(jax.devices()):
            break
        mesh = sharding.make_mesh(d, dp=1)
        sx, sy = mesh.shape["x"], mesh.shape["y"]
        # weak scaling: keep the per-device tile fixed by scaling the global
        # edge with the larger mesh axis (total nodes grow ~ devices)
        n_global = per_device_n * max(sx, sy)
        dt = measure(mesh, n_global)
        nnz = 9 * (n_global - 1) ** 2
        rate = nnz / dt
        if base_rate is None:
            base_rate = rate / d
        rows.append({
            "devices": d, "mesh": [sx, sy], "n_global": n_global,
            "sweep_us": dt * 1e6, "nnz_per_s": rate,
            "efficiency": rate / (base_rate * d),
        })
        print(rows[-1])
    os.makedirs("results", exist_ok=True)
    with open("results/weak_scaling.json", "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh, indent=2)


if __name__ == "__main__":
    main()
