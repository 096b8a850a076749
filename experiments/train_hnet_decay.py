"""Error-decay (spectral) training of the H-MG smoother at scale.

Round-3 finding: the reference's standalone-trained 129^2 H-Net HURTS
V-cycle convergence at 4097^2 (30 cycles vs plain MG's 23).  This script
trains THROUGH the V-cycle on the f=0 error-decay protocol
(learn/train_hnet.py::make_decay_step) jointly over several grid sizes, so
one parameter set transfers across scales, then evaluates the asymptotic
per-cycle factor q at held-out (larger) sizes.

Run (CPU works; sizes are modest because the loss differentiates through
m V-cycles): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
experiments/train_hnet_decay.py [--layers L] [--h-levels K] [--steps N]
[--tag NAME]

Round-4 variants (docs/kernel_notes_r4.md finding 1: the fused H legs are
VPU-compute-bound, so chain depth and the ``h_levels`` prefix are the
wall-clock levers, not bandwidth):
  --layers 1            single-conv corrector, ~1/3 the chain VPU work
  --h-levels 1          H-relax on the finest level only, plain weighted
                        Jacobi below (params MUST be trained for the
                        restricted prefix: all-level params collapse to
                        q~0.22 when restricted)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES_TRAIN = (64, 128, 256, 512)
SIZES_EVAL = (128, 256, 512, 1024)
OUT_DIR = "results/learn_iterator"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--h-levels", type=int, default=None)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--tag", type=str, default=None,
                    help="output suffix (default: decay for the L=3 "
                         "all-level config, else decay_L{l}_hl{k})")
    args = ap.parse_args()
    tag = args.tag
    if tag is None:
        tag = ("decay" if args.layers == 3 and args.h_levels is None
               else f"decay_L{args.layers}_hl{args.h_levels}")
    STEPS = args.steps
    import jax
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.learn import train_hnet as th
    from multigrid_feanet_tpu.utils import checkpoint

    hiers = [GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
             for n in SIZES_TRAIN]
    init_fn, step = th.make_decay_step(hiers, m=6, batch=2, warm=2,
                                       h_levels=args.h_levels)
    state = init_fn(seed=0, num_layers=args.layers)

    losses = []
    t0 = time.time()
    for it in range(STEPS):
        state, loss = step(state)
        losses.append(float(loss))
        if it % 25 == 0:
            print(f"step {it}: log-q {losses[-1]:+.4f}  "
                  f"(q~{np.exp(losses[-1]):.4f})  {time.time()-t0:.0f}s",
                  flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    checkpoint.save(os.path.join(OUT_DIR, f"hnet_{tag}.npz"), state.params)
    np.save(os.path.join(OUT_DIR, f"{tag}_loss.npy"), np.asarray(losses))

    report = {"steps": STEPS, "train_sizes": list(SIZES_TRAIN),
              "layers": args.layers, "h_levels": args.h_levels,
              "final_loss_logq": losses[-1], "eval": {}}
    for n in SIZES_EVAL:
        h = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
        q_h, _ = th.measure_q(h, state.params, mode="hjac",
                              h_levels=args.h_levels)
        q_j, _ = th.measure_q(h, state.params, mode="jac")
        report["eval"][n] = {"q_hjac": q_h, "q_plain": q_j}
        print(f"n={n}: q_hjac={q_h:.4f}  q_plain={q_j:.4f}", flush=True)
    with open(os.path.join(OUT_DIR, f"{tag}_summary.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print("saved", os.path.join(OUT_DIR, f"hnet_{tag}.npz"))


if __name__ == "__main__":
    main()
