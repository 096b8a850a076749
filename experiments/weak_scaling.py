"""Weak scaling of the DISTRIBUTED V-CYCLE (sharded Pallas path) + an
analytic comm-volume model predicting multi-host efficiency.

Protocol (BASELINE.json: >= 80% efficiency at 2+ hosts): fix the per-shard
tile (rows_per_shard x (n+1) nodes) and grow the global grid with the mesh
row axis; each shard then does identical work per V(1,1) cycle, so weak
efficiency = t_cycle(1 shard) / t_cycle(nx shards).

What runs where:
- CPU fake-pod (this container): ShardedPallasHierarchyV2 at nx = 1..8 with
  interpret-mode kernels — validates that the comm structure (ppermute
  halos, all_gather agglomeration) scales, but CPU timing is not TPU truth.
- single real chip: the nx=1 sharded solve (measured in
  results/vcycle_v2_tpu.json at <1% overhead vs single-device) anchors the
  per-cycle COMPUTE time of the model.
- real pod slice: the same script, unchanged, produces the true table
  (parallel/sharding.init_distributed + the DCN-outer/ICI-inner make_mesh).

Comm model per V(1,1) cycle (from parallel/pallas_shard.py):
- per sharded level: 3 halo exchanges (u before swrr, fcb, u1 before
  psweep), each moving 5 rows x Wp x 4 B per shard boundary over ICI, plus
  one 8-row strip assembly;
- one all_gather of the agglomerated coarse RHS: Hloc_S x Wp x 4 B per
  shard.
Efficiency(nx) = t_compute / (t_compute + n_coll/cycle * latency +
bytes/cycle / BW), with ICI ~ 45 GB/s and ~1.5 us/collective, DCN ~ 25 GB/s
and ~10 us.  At the production 4097^2 config (2.48 ms compute/cycle,
measured single-chip) the model gives ~0.94 weak efficiency over 8-chip
ICI and ~0.84 with ALL comm pessimistically priced at DCN (in the
DCN-outer/ICI-inner make_mesh layout the halos actually stay on ICI, so
the true 2-host figure sits between the two) — meeting the >= 80%
BASELINE target.  Latency dominates (31 collectives/cycle), not volume
(~0.4 MB/cycle vs ~850 MB HBM), so deeper-is-cheaper: chunked eps checks
and coarse agglomeration keep the collective count O(levels).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python experiments/weak_scaling.py
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
from jax.sharding import Mesh

from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.parallel.pallas_shard import ShardedPallasHierarchyV2


def comm_model(sh: ShardedPallasHierarchyV2, nu1=1, nu2=1,
               bw_gbps=45.0, lat_us=1.5):
    """Per-cycle comm bytes / collective count / predicted efficiency.

    Exchange counts mirror parallel/pallas_shard.py exactly and are pinned
    to the compiled HLO of the solve's while body by
    tests/test_comm_budget.py: the fine level runs nu1 + nu2 u-halo
    exchanges per cycle (its f exchange is peeled, once per solve); each
    zero-initial-guess coarse level runs 1 (fcb) + (nu2 - 1) + 1 (finished
    correction) exchanges — its pre-smoothed iterate is never exchanged
    because zero-guess halos are zeros; the agglomerated subtree is one
    all_gather; the free-residual convergence test is one psum."""
    Wp = sh.Wp
    n_ex_fine = nu1 + nu2
    n_ex_coarse = (nu2 + 1) if nu1 == 1 else (nu1 + nu2 + 1)
    n_ex = n_ex_fine + n_ex_coarse * (sh.S - 1)
    n_coll = 2 * n_ex  # two ppermutes per exchange
    bytes_total = n_ex * 5 * Wp * 4
    n_coll += 1  # agglomeration all_gather
    bytes_total += sh.Hloc[sh.S] * Wp * 4
    n_coll += 1  # free-residual psum (the convergence test's all-reduce)
    bytes_total += 4
    t_comm_us = n_coll * lat_us + bytes_total / (bw_gbps * 1e3)
    return {"collectives_per_cycle": n_coll,
            "comm_bytes_per_cycle": bytes_total,
            "comm_us_per_cycle": t_comm_us}


def main(rows_per_shard=128, cycles=4):
    devs = jax.devices()
    out = {"backend": jax.default_backend(), "rows_per_shard": rows_per_shard,
           "protocol": "fixed per-shard tile, V(1,1) distributed Pallas V-cycle",
           "note": ("efficiency_measured on the CPU fake-pod is comm-structure "
                    "validation only (N virtual devices time-share the host "
                    "cores and interpret-mode kernels dominate); TPU truth = "
                    "the predicted_efficiency_* model rows anchored on the "
                    "measured single-chip cycle time"),
           "rows": []}
    base_t = None
    for nx in (1, 2, 4, 8):
        if nx > len(devs):
            break
        n = rows_per_shard * nx
        if n < 128:
            continue
        mesh = Mesh(np.array(devs[:nx]), ("x",))
        prob = Problem(n=n, dtype=jnp.float32)
        sh = ShardedPallasHierarchyV2(
            prob, mesh, axis="x", num_levels=max(2, int(np.log2(n)) - 3),
            pallas_threshold=32, rows=32, rows_coarse=32, shard_below=64)
        u0 = jax.random.normal(jax.random.PRNGKey(0), (n + 1, n + 1), jnp.float32)
        f0 = jnp.zeros((n + 1, n + 1), jnp.float32)
        sh.solve(f0, u0=u0, eps=0.0, max_cycles=cycles)  # compile
        t0 = time.time()
        sh.solve(f0, u0=u0, eps=0.0, max_cycles=cycles)
        t_cyc = (time.time() - t0) / cycles
        if base_t is None:
            base_t = t_cyc
        model = comm_model(sh)
        # NOT a performance measurement: N virtual CPU devices time-share
        # the host under interpret-mode kernels (VERDICT r3 #5b)
        row = {"nx": nx, "n": n, "S": sh.S, "t_cycle_s": t_cyc,
               "efficiency_cpu_structural_only": base_t / t_cyc, **model}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)

    # model-predicted 2-host efficiency for the production 4097^2 config,
    # anchored on the measured single-chip per-cycle time (bench.py:
    # vcycle_4097_ms_per_cycle_net)
    t_compute_us = 2484.0
    for name, bw, lat in (("ici_8chip", 45.0, 1.5), ("dcn_2host", 25.0, 10.0)):
        mesh1 = Mesh(np.array(devs[:1]), ("x",))
        sh = ShardedPallasHierarchyV2(Problem(n=4096, dtype=jnp.float32),
                                      mesh1, axis="x", num_levels=9,
                                      pallas_threshold=32, shard_below=512)
        m = comm_model(sh, bw_gbps=bw, lat_us=lat)
        eff = t_compute_us / (t_compute_us + m["comm_us_per_cycle"])
        out[f"predicted_efficiency_{name}"] = eff
        print(f"{name}: predicted weak efficiency {eff:.4f} "
              f"({m['comm_us_per_cycle']:.1f} us comm / cycle)", flush=True)

    os.makedirs("results", exist_ok=True)
    json.dump(out, open("results/weak_scaling.json", "w"), indent=2)
    print("wrote results/weak_scaling.json")


if __name__ == "__main__":
    main()
