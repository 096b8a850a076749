"""Experiment: train the learned inter-grid operators (R/P kernels).

Reproduces the reference training protocol
(MM-FEANet-interface_multigrid_rhs_kernel_split_res.ipynb): Adam(1e-3) on
the q_m loss over RHS batches with the m0/m detach schedule, optionally with
the per-kernel curriculum (--train_kernel k trains only pattern-kernel k, as
the reference's freeze_kernels/rewrite_kernels do).  Adds what the reference
lacks: checkpoint/resume every epoch and a divergence guard.

  python experiments/learn_intergrid.py --n 64 --epochs 50
  python experiments/learn_intergrid.py --train_kernel 3   # curriculum
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from config import IntergridTrainConfig, from_args
from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.data import rhs as rhs_mod
from multigrid_feanet_tpu.learn import train_intergrid
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.solvers import jacobi
from multigrid_feanet_tpu.utils import checkpoint


def evaluate_q(hier, params, n_cycles=12):
    """Convergence factor of the learned cycle on f=1 (mid-decay ratio)."""
    from multigrid_feanet_tpu.ops import stencil

    f = stencil.apply_mass(jnp.ones((1, hier.finest.n_nodes, hier.finest.n_nodes),
                                    jnp.float32), hier.finest.h)
    u = jnp.zeros_like(f)
    hist = []
    for _ in range(n_cycles):
        u = intergrid.learned_v_cycle(hier, params, u, f)
        hist.append(float(jacobi.interior_norm(f - hier.finest.apply(u))[0]))
    return hist[6] / hist[5], hist


def main(cfg: IntergridTrainConfig | None = None):
    cfg = cfg or from_args(IntergridTrainConfig)
    os.makedirs(cfg.out_dir, exist_ok=True)
    hier = GridHierarchy.create(
        Problem(n=cfg.n, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    )
    H = hier.finest.n_nodes
    F = np.asarray(rhs_mod.make_dataset(jax.random.PRNGKey(cfg.seed), H, cfg.rhs_count),
                   dtype=np.float32)

    ckpt_path = os.path.join(cfg.out_dir, "state.npz")
    state = train_intergrid.init_state(cfg.seed, lr=cfg.lr)
    start_epoch = 0
    meta_path = os.path.join(cfg.out_dir, "progress.json")
    if os.path.exists(ckpt_path) and os.path.exists(meta_path):
        state = checkpoint.load(ckpt_path, like=state)
        start_epoch = json.load(open(meta_path))["epoch"] + 1
        print(f"resuming from epoch {start_epoch}")

    losses = []
    from multigrid_feanet_tpu.data import datasets as ds_mod

    class _Arr:
        def __init__(self, a):
            self.a = a

        def __len__(self):
            return len(self.a)

        def __getitem__(self, i):
            return self.a[i]

    for epoch in range(start_epoch, cfg.epochs):
        total, nb = 0.0, 0
        for Fb in ds_mod.batches(_Arr(F), cfg.batch_size, shuffle=True, seed=cfg.seed + epoch):
            state, loss = train_intergrid.train_step(
                hier, state, Fb, m=cfg.m, m0=cfg.m0, train_kernel=cfg.train_kernel,
                lr=cfg.lr,
            )
            loss = float(loss)
            if not np.isfinite(loss):
                print(f"DIVERGED at epoch {epoch}; stopping (last good state kept)")
                break
            total += loss
            nb += 1
        else:
            losses.append(total / max(nb, 1))
            checkpoint.save(ckpt_path, state)
            json.dump({"epoch": epoch, "loss": losses[-1]}, open(meta_path, "w"))
            if epoch % 10 == 0:
                print(f"epoch {epoch}: q_m {losses[-1]:.5f}")
            continue
        break

    q, hist = evaluate_q(hier, state.params)
    q0, _ = evaluate_q(hier, intergrid.IntergridParams.init())
    out = {"trained_q": q, "init_q": q0, "losses": losses}
    print(json.dumps({k: v for k, v in out.items() if k != "losses"}, indent=2))
    json.dump(out, open(os.path.join(cfg.out_dir, "summary.json"), "w"), indent=2)


if __name__ == "__main__":
    main()
