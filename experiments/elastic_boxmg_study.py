"""Block-BoxMG elastic study (round 5, VERDICT r4 item #4): measure the
interface V/W-cycle factors of the operator-induced block hierarchy
against the plain bilinear hierarchy, f64 f=0 random-init decay (the
floor-free factor protocol).

Run CPU (small n):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                    JAX_ENABLE_X64=1 python experiments/elastic_boxmg_study.py
Run TPU (large n):  PYTHONPATH=/root/repo:/root/.axon_site \
                    JAX_ENABLE_X64=1 python experiments/elastic_boxmg_study.py --n 512 1024

Writes results/elastic_boxmg/summary.json.

Measured conclusions (2026-08-21, f64, E=212e3 nu=0.288 circle-20:1):
- plain bilinear V(2,2) interface: q 0.82 at n=64 (and h-degrading);
- block-BoxMG two-grid: q 0.43 — but the V-cycle COMPOUNDS the coarse
  interface problems' own difficulty (L=2/3/4/full: 0.43/0.47/0.62/0.80);
- block-BoxMG W(2,2): q 0.43-0.44, h-INDEPENDENT (n=64..128) — holds the
  two-grid factor at full depth;
- homogeneous: block weights reduce to bilinear quality (q 0.29 = plain,
  depth-stable) — the machinery is exact, the residual interface gap
  (0.43 vs 0.29) is the documented rigid-body-mode limitation of
  collapse-based coarsening for elasticity.
"""

import argparse
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp


def q_of(h, k=6):
    h = np.asarray(h)
    return float(np.exp(np.mean(np.diff(np.log(h))[-k:])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="*", default=[64, 128])
    ap.add_argument("--max-cycles", type=int, default=60)
    args = ap.parse_args()
    jax.config.update("jax_enable_x64", True)

    from multigrid_feanet_tpu.solvers import elastic as es
    from multigrid_feanet_tpu.solvers.elastic_boxmg import ElasticBoxMG

    E, NU = 212e3, 0.288
    INC = ("circle", (0.0, 0.0), 0.5)
    rng = np.random.default_rng(3)
    out = {"E": E, "nu": NU, "coefficients": [1.0, 20.0],
           "protocol": "f64 f=0 random-init decay, tail geomean (6 ratios)",
           "rows": []}
    for n in args.n:
        for inc_name, inc in (("interface", INC), ("homogeneous", None)):
            levels = es.build_elastic_hierarchy(
                n, E, NU, inclusion=inc, coefficients=(1.0, 20.0),
                dtype=jnp.float64)
            u0 = jnp.asarray(rng.standard_normal((2, n + 1, n + 1))
                             ) * levels[0].geo[None]
            f0 = jnp.zeros((2, n + 1, n + 1), jnp.float64)
            _, hp = es.solve(levels, f0, u0=u0, nu1=2, nu2=2, eps=1e-10,
                             max_cycles=args.max_cycles)
            bm = ElasticBoxMG(levels, direct_coarse=True)
            _, hv = bm.solve(f0, u0=u0, nu1=2, nu2=2, eps=1e-10,
                             max_cycles=args.max_cycles)
            _, hw = bm.solve(f0, u0=u0, nu1=2, nu2=2, eps=1e-10,
                             max_cycles=args.max_cycles, gamma=2)
            row = dict(n=n, problem=inc_name,
                       q_plain_v22=q_of(hp), cycles_plain=len(hp),
                       q_boxmg_v22=q_of(hv), cycles_boxmg_v=len(hv),
                       q_boxmg_w22=q_of(hw), cycles_boxmg_w=len(hw))
            out["rows"].append(row)
            print(row, flush=True)

    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "elastic_boxmg"
    path.mkdir(parents=True, exist_ok=True)
    (path / "summary.json").write_text(json.dumps(out, indent=1))
    print("wrote", path / "summary.json")


if __name__ == "__main__":
    main()
