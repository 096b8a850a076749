"""Round-5 (VERDICT r4 #10): classical-init + learning — per-pattern
inter-grid kernels INITIALIZED from the operator-induced (BoxMG) weights,
then fine-tuned with the multi-size q_m loss.

The per-pattern approximation of the Dendy weights: a fine node's
transfer weight toward its coarse parent, computed from ITS OWN pattern's
stencil (edge classes are exact — their collapse uses only the node's own
stencil; corner (Fc) classes compose through the neighbours' edge weights,
approximated here with the same pattern's own edge weights — exact on the
homogeneous pattern, where the construction reproduces full-weighting /
bilinear identically).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/intergrid_boxmg_init.py
Writes results/intergrid_boxmg/summary.json.

MEASURED CONCLUSIONS (2026-08-21, negative result — VERDICT r4 #10):
- The untrained per-pattern approximation scores mgTest q(n=64) = 0.599
  with held-out convergence at n=16..64 — between linear (0.633) and the
  trained models (best ref checkpoint 0.569, our multi-size 0.547).
- Fine-tuning FROM this init with the multi-size q_m RHS recipe
  DESTABILIZES at both lr 3e-4 and 1e-4 (loss drifts upward, eval
  q -> ~1.0, held-out solves stall) — the asymmetric init sits near a
  cliff of this loss protocol.
- The full operator-induced transfers (q = 0.428) keep the leaderboard
  crown; the 0.599-vs-0.428 gap MEASURES how much of BoxMG's power lives
  in the neighbour composition that a per-pattern 3x3 kernel cannot
  express (the Fc weights depend on the ADJACENT nodes' collapse, not
  only the node's own pattern).
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
from multigrid_feanet_tpu.ops import stencil as st
from multigrid_feanet_tpu.utils import checkpoint

OUT = "results/intergrid_boxmg"
SIZES = (16, 32, 64)
BATCHES = (16, 8, 2)


def boxmg_pattern_init(coefficients=(1.0, 20.0)) -> intergrid.IntergridParams:
    """Per-pattern BoxMG-approximated transfer kernels.

    kernel[c] tap (dr, dc) = the P-weight of a fine node with pattern c at
    offset (dr, dc) from its coarse parent: centre 1 (injection), edges
    from the row/column collapse of table[c], corners wc + composition
    through the own-pattern edge weights.  conv = kernel/4 (the
    reference's w = [4, 1] convention), deconv = kernel."""
    table = st.make_stencil_table_np(coefficients)  # (16, 3, 3) f64
    K = np.zeros((16, 3, 3))
    for c in range(16):
        S = table[c]
        sx = S.sum(axis=0)  # column sums: [W, C, E]
        wxW, wxE = -sx[0] / sx[1], -sx[2] / sx[1]
        sy = S.sum(axis=1)  # row sums: [N, C, S]
        wyN, wyS = -sy[0] / sy[1], -sy[2] / sy[1]
        wc = -S / S[1, 1]
        wx = {0: wxW, 2: wxE}
        wy = {0: wyN, 2: wyS}
        k = np.zeros((3, 3))
        k[1, 1] = 1.0
        k[1, 0], k[1, 2] = wxW, wxE
        k[0, 1], k[2, 1] = wyN, wyS
        for dr in (0, 2):
            for dc in (0, 2):
                k[dr, dc] = (wc[dr, dc] + wc[dr, 1] * wx[dc]
                             + wc[1, dc] * wy[dr])
        K[c] = k
    return intergrid.IntergridParams(
        conv=jnp.asarray(K / 4.0, jnp.float32),
        deconv=jnp.asarray(K, jnp.float32),
        w=jnp.asarray([4.0, 1.0], jnp.float32))


def _hier(n):
    return GridHierarchy.create(
        Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                dtype=jnp.float32))


def finetune(tag, init_params, lr, steps):
    hiers = tuple(_hier(n) for n in SIZES)
    shapes = tuple((b, n + 1, n + 1) for b, n in zip(BATCHES, SIZES))
    Fs = [rhs_mod.make_dataset(jax.random.PRNGKey(7 + i), n + 1, 256)
          for i, n in enumerate(SIZES)]
    state = train_intergrid.init_state(seed=0, lr=lr)
    # deep-copy: the jitted step donates the state's buffers, and the
    # caller still holds (and later evaluates) the init params
    state = state._replace(
        params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      init_params))
    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
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

    p0 = boxmg_pattern_init()
    # sanity: homogeneous pattern reproduces FW/bilinear exactly
    np.testing.assert_allclose(np.asarray(p0.conv[0]),
                               intergrid.FULL_WEIGHTING_16, atol=1e-7)
    models = {"boxmg_init_untrained": p0,
              "boxmg_init_ft_lr1e4": finetune("boxmg_ft_lr1e4", p0, 1e-4,
                                              800)}
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
    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
