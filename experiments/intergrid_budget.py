"""Learned inter-grid operators at the REFERENCE'S FULL TRAINING BUDGET,
with the reference's own evaluators, side by side with its published
numbers.

Protocol (reference: MM-FEANet-interface_multigrid_rhs_kernel_split_res
.ipynb cells 2-11): interface problem (coefficients [1, 20], circle r=0.5)
at n=2^4; 1,000-sample RHS dataset (6 families, data/rhs.py), batch 64,
Adam(1e-3), q_m loss (m=6, m0=2 detach schedule); per-kernel curriculum —
for each of the 16 pattern kernels, train ONLY that R/P channel for 300
epochs from the linear init (the reference's freeze_kernels zeroes the
other channels' grads; its rewrite_kernels writes the linear kernels into
.grad, which the next zero_grad discards — an upstream no-op, so separate
one-kernel models are exactly what it produced: Model/learn_intergrid_
operator/multigrid_rhs_res/model_mg_interface_kernel{k}.pth).  A joint
all-kernel run (300 epochs) is added for comparison.

Evaluators:
- cells 15-16: n=16 V-cycles to EPS 5e-5, f = mass(RHS sample), u0 = 0.
- cells 18-20 (mgTest, train-small/test-large): n=64, f ≡ 1, u0 = 0,
  q = (res[9]/res[6])^(1/4).
Both run for: linear transfers, each of our 16 per-kernel models, our
joint model, and the reference's own 16 checkpoints (imported).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/intergrid_budget.py
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
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.utils import checkpoint

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "intergrid_budget")
REF_DIR = "/root/reference/Model/learn_intergrid_operator/multigrid_rhs_res"

N_TRAIN = 16
EPOCHS = 300
RHS_COUNT = 1000
BATCH = 64


def _hier(n):
    return GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32))


def eval_cycles_n16(hier16, params, F_sample, eps=5e-5, max_cycles=200):
    """Reference cells 15-16: cycles to EPS on a mass-convolved RHS."""
    f = stencil.apply_mass(F_sample[None], hier16.finest.h)
    u = jnp.zeros_like(f)
    hist = []
    for k in range(max_cycles):
        u = intergrid.learned_v_cycle(hier16, params, u, f)
        r = f - hier16.finest.apply(u)
        res = float(jnp.sqrt(jnp.sum(r[..., 1:-1, 1:-1] ** 2)))
        hist.append(res)
        if not np.isfinite(res):
            return -1, hist
        if res <= eps:
            break
    return len(hist), hist


def eval_mgtest_q(hier64, params, n_cycles=12):
    """Reference cells 18-20: n=64, f==1, q = (res[9]/res[6])^(1/4)."""
    H = hier64.finest.n_nodes
    f = stencil.apply_mass(jnp.ones((1, H, H), jnp.float32), hier64.finest.h)
    u = jnp.zeros_like(f)
    hist = []
    for _ in range(n_cycles):
        u = intergrid.learned_v_cycle(hier64, params, u, f)
        r = f - hier64.finest.apply(u)
        hist.append(float(jnp.sqrt(jnp.sum(r[..., 1:-1, 1:-1] ** 2))))
    return float(np.power(hist[9] / hist[6], 0.25)), hist


def main():
    os.makedirs(OUT, exist_ok=True)
    hier16 = _hier(N_TRAIN)
    hier64 = _hier(64)
    H = N_TRAIN + 1
    F = rhs_mod.make_dataset(jax.random.PRNGKey(0), H, RHS_COUNT)
    F_eval = rhs_mod.make_dataset(jax.random.PRNGKey(99), H, 4)

    models = {"linear": intergrid.IntergridParams.init()}

    # --- per-kernel curriculum: 16 runs x 300 epochs, linear init each ---
    for k in range(16):
        ck = os.path.join(OUT, f"kernel{k}")
        t0 = time.time()
        params, losses = train_intergrid.train(
            hier16, F, num_epochs=EPOCHS, batch_size=BATCH, seed=k,
            train_kernel=k, verbose=False, ckpt_dir=ck, ckpt_every=25)
        models[f"ours_kernel{k}"] = params
        print(f"kernel {k}: {time.time()-t0:.0f} s, "
              f"q_m {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)

    # --- joint run (all channels) ---
    t0 = time.time()
    params, losses = train_intergrid.train(
        hier16, F, num_epochs=EPOCHS, batch_size=BATCH, seed=100,
        train_kernel=None, verbose=False,
        ckpt_dir=os.path.join(OUT, "joint"), ckpt_every=25)
    models["ours_joint"] = params
    print(f"joint: {time.time()-t0:.0f} s, q_m {losses[0]:.4f} -> {losses[-1]:.4f}",
          flush=True)

    # --- reference checkpoints ---
    for k in range(16):
        p = os.path.join(REF_DIR, f"model_mg_interface_kernel{k}.pth")
        if os.path.exists(p):
            models[f"ref_kernel{k}"] = intergrid.import_torch_checkpoint(p)

    # --- evaluate everything ---
    table = {}
    for name, params in models.items():
        cyc, _ = eval_cycles_n16(hier16, params, F_eval[0])
        q64, _ = eval_mgtest_q(hier64, params)
        table[name] = {"n16_cycles_to_5e-5": cyc, "mgtest_q_n64": q64}
        print(f"{name:16s}  n16 cycles: {cyc:4d}   mgTest q(n=64): {q64:.4f}",
              flush=True)

    json.dump(table, open(os.path.join(OUT, "summary.json"), "w"), indent=2)
    print("wrote", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
