"""Error-decay (spectral) training of the H-MG smoother at scale.

Round-3 finding: the reference's standalone-trained 129^2 H-Net HURTS
V-cycle convergence at 4097^2 (30 cycles vs plain MG's 23).  This script
trains THROUGH the V-cycle on the f=0 error-decay protocol
(learn/train_hnet.py::make_decay_step) jointly over several grid sizes, so
one parameter set transfers across scales, then evaluates the asymptotic
per-cycle factor q at held-out (larger) sizes.

Run (CPU works; sizes are modest because the loss differentiates through
m V-cycles): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
experiments/train_hnet_decay.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES_TRAIN = (64, 128, 256, 512)
SIZES_EVAL = (128, 256, 512, 1024)
STEPS = 600
OUT_DIR = "results/learn_iterator"


def main():
    import jax
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.learn import train_hnet as th
    from multigrid_feanet_tpu.utils import checkpoint

    hiers = [GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
             for n in SIZES_TRAIN]
    init_fn, step = th.make_decay_step(hiers, m=6, batch=2, warm=2)
    state = init_fn(seed=0)

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
    checkpoint.save(os.path.join(OUT_DIR, "hnet_decay.npz"), state.params)
    np.save(os.path.join(OUT_DIR, "decay_loss.npy"), np.asarray(losses))

    report = {"steps": STEPS, "train_sizes": list(SIZES_TRAIN),
              "final_loss_logq": losses[-1], "eval": {}}
    for n in SIZES_EVAL:
        h = GridHierarchy.create(Problem(n=n, dtype=jnp.float32))
        q_h, _ = th.measure_q(h, state.params, mode="hjac")
        q_j, _ = th.measure_q(h, state.params, mode="jac")
        report["eval"][n] = {"q_hjac": q_h, "q_plain": q_j}
        print(f"n={n}: q_hjac={q_h:.4f}  q_plain={q_j:.4f}", flush=True)
    with open(os.path.join(OUT_DIR, "decay_summary.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print("saved", os.path.join(OUT_DIR, "hnet_decay.npz"))


if __name__ == "__main__":
    main()
