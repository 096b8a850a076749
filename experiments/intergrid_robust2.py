"""Round-4 config B/C for the scale-robust inter-grid operator: multi-size
RHS-protocol q_m with the detach window moved to the asymptotic cycles
(m=10, m0=6 — the window the reference's own mgTest evaluator scores),
warm-started from (B) the best per-kernel round-3 model and (C) linear.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/intergrid_robust2.py
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

OUT = "results/intergrid_robust"
SIZES = (16, 32, 64)
BATCHES = (16, 8, 2)
STEPS = 1200


def _hier(n):
    return GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                dtype=jnp.float32))


def run(tag, init_params, lr):
    hiers = tuple(_hier(n) for n in SIZES)
    shapes = tuple((b, n + 1, n + 1) for b, n in zip(BATCHES, SIZES))
    Fs = [rhs_mod.make_dataset(jax.random.PRNGKey(7 + i), n + 1, 256)
          for i, n in enumerate(SIZES)]
    state = train_intergrid.init_state(seed=0, lr=lr)
    if init_params is not None:
        state = state._replace(params=init_params)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(STEPS):
        Fb = tuple(jnp.asarray(F[rng.choice(len(F), b, replace=False)])
                   for F, b in zip(Fs, BATCHES))
        state, loss = train_intergrid.train_step_rhs_multisize(
            hiers, state, Fb, shapes=shapes, lr=lr)
        if it % 100 == 0:
            print(f"[{tag}] step {it}: qm {float(loss):.4f} "
                  f"{time.time()-t0:.0f}s", flush=True)
    checkpoint.save(os.path.join(OUT, f"intergrid_{tag}.npz"), state.params)
    return state.params


def main():
    os.makedirs(OUT, exist_ok=True)
    from experiments.intergrid_budget import eval_cycles_n16, eval_mgtest_q

    # warm start B: round-3 best per-kernel model (kernel4, q=0.5910)
    st0 = train_intergrid.init_state(seed=0)
    k4_state, _, _ = checkpoint.load_training("results/intergrid_budget/kernel4", st0)
    models = {
        "warm_k4": run("warm_k4", k4_state.params, 3e-4),
        "from_linear": run("from_linear", None, 1e-3),
    }
    report = {}
    for name, p in models.items():
        q64, _ = eval_mgtest_q(_hier(64), p)
        conv = {}
        for n_eval in (16, 32, 64, 128):
            F = rhs_mod.make_dataset(jax.random.PRNGKey(123), n_eval + 1, 2)
            cyc, hist = eval_cycles_n16(_hier(n_eval), p,
                                        jnp.asarray(F[0]), max_cycles=300)
            conv[n_eval] = {"cycles": cyc, "final": float(hist[-1])}
        report[name] = {"mgtest_q_n64": q64, "heldout": conv}
        print(f"{name}: mgTest q(n=64) = {q64:.4f}  heldout "
              f"{[(k, v['cycles']) for k, v in conv.items()]}", flush=True)
    with open(os.path.join(OUT, "summary2.json"), "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
