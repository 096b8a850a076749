"""Scale-robust learned inter-grid operator (round 4, VERDICT r3 #4).

Trains the 16-pattern R/P kernels with the multi-size f=0 error-decay loss
(learn/train_intergrid.py::train_step_decay_multisize) on the interface
problem at n = 16/32/64 jointly, then evaluates with the REFERENCE'S OWN
protocols (experiments/intergrid_budget.py):

- mgTest (train-small/test-large): n=64, f ≡ 1, q = (res[9]/res[6])^(1/4).
  Target: beat 0.569 (the best of the reference's 16 imported checkpoints)
  and 0.633 (linear transfers).
- held-out RHS convergence at n = 16, 32, 64, 128: cycles to 5e-5 from
  u0 = 0 on mass-convolved RHS samples — must converge at EVERY size
  (the round-3 joint model diverged at n=64).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/intergrid_robust.py
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
from multigrid_feanet_tpu.data import rhs as rhs_mod
from multigrid_feanet_tpu.learn import train_intergrid
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.utils import checkpoint

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "intergrid_robust")

SIZES = (16, 32, 64)
BATCHES = (16, 8, 2)
STEPS = 1500


def _hier(n):
    return GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                dtype=jnp.float32))


def main():
    os.makedirs(OUT, exist_ok=True)
    hiers = tuple(_hier(n) for n in SIZES)
    shapes = tuple((b, n + 1, n + 1) for b, n in zip(BATCHES, SIZES))
    state = train_intergrid.init_state(seed=0)

    losses = []
    t0 = time.time()
    for it in range(STEPS):
        state, loss = train_intergrid.train_step_decay_multisize(
            hiers, state, shapes=shapes)
        losses.append(float(loss))
        if it % 50 == 0:
            print(f"step {it}: qm {losses[-1]:.4f}  {time.time()-t0:.0f}s",
                  flush=True)
    params = state.params
    checkpoint.save(os.path.join(OUT, "intergrid_robust.npz"), params)

    # ---- reference evaluators ----
    from experiments.intergrid_budget import eval_cycles_n16, eval_mgtest_q

    report = {"steps": STEPS, "train_sizes": list(SIZES),
              "final_qm": losses[-1]}
    linear = intergrid.IntergridParams.init()
    for name, p in (("linear", linear), ("robust", params)):
        q64, _ = eval_mgtest_q(_hier(64), p)
        report[f"mgtest_q_n64_{name}"] = q64
        conv = {}
        for n_eval in (16, 32, 64, 128):
            h = _hier(n_eval)
            F = rhs_mod.make_dataset(jax.random.PRNGKey(123), n_eval + 1, 2)
            cyc, hist = eval_cycles_n16(h, p, jnp.asarray(F[0]),
                                        max_cycles=300)
            conv[n_eval] = {"cycles": cyc, "final": float(hist[-1])}
            print(f"{name} n={n_eval}: cycles {cyc} final {hist[-1]:.2e}",
                  flush=True)
        report[f"heldout_{name}"] = conv
        print(f"{name}: mgTest q(n=64) = {q64:.4f}", flush=True)
    report["reference_best_imported_q_n64"] = 0.569
    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
