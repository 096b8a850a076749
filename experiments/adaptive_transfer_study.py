"""Content-adaptive (operator-induced / BoxMG) transfers on the bi-material
interface problem — the capability study.

Protocols (all the reference's own):
1. f=0 error-decay V(1,1) asymptotic q at n = 64..512
   (MM_Model_convergence.ipynb cells 3/5), linear vs adaptive+Galerkin.
2. The interface study's V(7,3) at n=64 (MM_Interface_error.ipynb cells
   14/20: 14 cycles, q = 0.662 with linear transfers).
3. The mgTest protocol (n=64, f==1, q = (r9/r6)^(1/4) — the reference's
   train-small/test-large evaluator, ...kernel_split_res.ipynb cell 18),
   scored against the learned-intergrid leaderboard
   (results/intergrid_robust/summary2.json: ours-trained 0.547, best
   imported reference checkpoint 0.569, linear 0.633).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
experiments/adaptive_transfer_study.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/adaptive_transfer"


def tail_q(hist, k=5):
    return float(np.exp(np.mean(np.diff(np.log(np.asarray(hist) + 1e-30))[-k:])))


def main():
    import jax
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.ops.adaptive_transfer import BoxMG
    from multigrid_feanet_tpu.ops.stencil import apply_mass
    from multigrid_feanet_tpu.solvers import multigrid as mg

    os.makedirs(OUT, exist_ok=True)
    report = {"decay_v11": {}, "interface_v73_n64": {}, "mgtest_n64": {}}
    rng = np.random.default_rng(0)

    # --- 1. f=0 decay, V(1,1), h-independence sweep ---
    for n in (64, 128, 256, 512):
        prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                       dtype=jnp.float32)
        hier = GridHierarchy.create(prob)
        f = jnp.zeros((n + 1, n + 1), jnp.float32)
        u0 = jnp.asarray(rng.standard_normal((n + 1, n + 1)),
                         jnp.float32) * hier.finest.geo
        _, h_lin = mg.solve(hier, f, u0=u0, nu1=1, nu2=1, eps=None,
                            max_cycles=20)
        t0 = time.time()
        bm = BoxMG(hier)
        setup_s = time.time() - t0
        _, h_ad = bm.solve(f, u0=u0, eps=0.0, max_cycles=20)
        report["decay_v11"][n] = {
            "q_linear": tail_q(h_lin), "q_adaptive_galerkin": tail_q(h_ad),
            "setup_s": setup_s}
        print(f"n={n}: V(1,1) q linear {tail_q(h_lin):.3f} -> adaptive "
              f"{tail_q(h_ad):.3f}  (setup {setup_s:.1f}s)", flush=True)

    # --- 2. interface V(7,3) at n=64 (reference: q(7,3)=0.662, 14 cycles) ---
    n = 64
    prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                   dtype=jnp.float32)
    hier = GridHierarchy.create(prob)
    f = jnp.zeros((n + 1, n + 1), jnp.float32)
    u0 = jnp.asarray(rng.standard_normal((n + 1, n + 1)),
                     jnp.float32) * hier.finest.geo
    _, h_lin = mg.solve(hier, f, u0=u0, nu1=7, nu2=3, eps=None, max_cycles=16)
    bm = BoxMG(hier)
    _, h_ad = bm.solve(f, u0=u0, nu1=7, nu2=3, eps=0.0, max_cycles=16)
    report["interface_v73_n64"] = {
        "q_linear": tail_q(h_lin), "q_adaptive_galerkin": tail_q(h_ad),
        "reference_q73": 0.662}
    print(f"V(7,3) n=64: q linear {tail_q(h_lin):.3f} -> adaptive "
          f"{tail_q(h_ad):.3f}  (reference linear baseline 0.662)",
          flush=True)

    # --- 3. mgTest protocol (f==1): vs the learned-intergrid leaderboard.
    # BoxMG contracts so fast it hits the f32 nonzero-f residual floor
    # (~1e-6 absolute at n=64) BEFORE cycle 6, which turns the r9/r6 ratio
    # into a floor artifact (q ~ 0.96) — run this protocol in f64.
    jax.config.update("jax_enable_x64", True)
    prob64 = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                     dtype=jnp.float64)
    hier64 = GridHierarchy.create(prob64)
    bm64 = BoxMG(hier64)
    ff = apply_mass(jnp.ones((n + 1, n + 1), jnp.float64), hier64.finest.h)
    u = jnp.zeros_like(ff)
    hist = []
    for _ in range(12):
        u = bm64.v_cycle(u, ff, 1, 1)
        r = ff - hier64.finest.apply(u)
        hist.append(float(jnp.sqrt(jnp.sum(jnp.asarray(r)[1:-1, 1:-1] ** 2))))
    q_mgtest = float(np.power(hist[9] / hist[6], 0.25))
    report["mgtest_n64"] = {
        "q_adaptive_galerkin": q_mgtest, "dtype": "float64",
        "history": hist,
        "leaderboard": {"linear": 0.633, "best_ref_checkpoint": 0.569,
                        "ours_trained_warm_k4": 0.547}}
    print(f"mgTest q(n=64): adaptive {q_mgtest:.3f}  (linear 0.633, best "
          f"imported ref ckpt 0.569, trained warm_k4 0.547)", flush=True)

    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print("saved", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
