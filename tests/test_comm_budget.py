"""Pins the distributed V-cycle's per-cycle collective budget to the
weak-scaling comm model (VERDICT r3 #5a).

``experiments/weak_scaling.py::comm_model`` predicts multi-host efficiency
from an analytic per-cycle collective count.  Before round 4 nothing tied
that count to the code (and the round-3 model in fact OVER-counted: it
priced 3 exchanges per level where the zero-initial-guess coarse path does
2).  Here the count is read off the compiled, SPMD-partitioned HLO of the
sharded solve: the while-loop body — executed exactly once per V-cycle —
is located as the unique computation containing all three collective kinds
(halo collective-permutes, the coarse-agglomeration all-gather, and the
free-residual all-reduce), and its op counts are asserted equal to the
model's budget.  If XLA's collective combiner or the solver's exchange
structure ever changes, this fails loudly and the model must be re-derived
— that is the point.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.parallel.pallas_shard import ShardedPallasHierarchyV2


def _while_body_collectives(txt: str):
    """Per-computation collective counts; returns the (cp, ag, ar) of the
    unique computation containing all three kinds — the solve's cycle
    body.  (Interpret-mode Pallas kernels introduce other while loops;
    none of them contain collectives.)"""
    cur, comps = None, {}
    for line in txt.splitlines():
        if line and not line[0].isspace() and "{" in line:
            cur = line.split("(")[0].strip().lstrip("%")
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)
    hits = []
    for name, lines in comps.items():
        body = "\n".join(lines)
        cp = len(re.findall(r"= *\S+ collective-permute\(", body))
        ag = len(re.findall(r"= *\S+ all-gather\(", body))
        ar = len(re.findall(r"= *\S+ all-reduce\(", body))
        if cp and ag and ar:
            hits.append((name, cp, ag, ar))
    assert len(hits) == 1, hits
    return hits[0][1:]


@pytest.mark.parametrize("n,exp_S", [(256, 3), (512, 4)])
def test_collective_budget_matches_comm_model(n, exp_S):
    from experiments.weak_scaling import comm_model

    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides the 8-device CPU fake-pod"
    mesh = Mesh(np.array(devs[:8]), ("x",))
    sh = ShardedPallasHierarchyV2(Problem(n=n, inclusion=None), mesh, "x",
                                  pallas_threshold=16, rows=32,
                                  shard_below=64, interpret=True)
    assert sh.S == exp_S
    f = jnp.zeros((n + 1, n + 1), jnp.float32)
    eps, mc = 1e-3, 8
    sh.solve(f, eps=eps, max_cycles=mc)
    run = sh._compiled[("solve", 1, 1, eps, mc)]
    txt = run.lower(f, f).compile().as_text()

    cp, ag, ar = _while_body_collectives(txt)
    model = comm_model(sh)
    # model budget = 2 ppermutes/exchange + 1 all_gather + 1 psum
    assert model["collectives_per_cycle"] == cp + ag + ar
    assert cp == 2 * (2 + 2 * (sh.S - 1))  # V(1,1): fine 2 ex, coarse 2 ex
    assert ag == 1 and ar == 1


def test_comm_model_bytes_match_exchange_shapes():
    """The model's per-exchange byte count equals the ppermuted slices in
    pallas_shard._exchange: 3 north rows + 2 south rows, Wp lanes, f32."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("x",))
    sh = ShardedPallasHierarchyV2(Problem(n=256, inclusion=None), mesh, "x",
                                  pallas_threshold=16, rows=32,
                                  shard_below=64, interpret=True)
    from experiments.weak_scaling import comm_model

    m = comm_model(sh)
    per_exchange = 5 * sh.Wp * 4
    n_ex = 2 + 2 * (sh.S - 1)
    expected = n_ex * per_exchange + sh.Hloc[sh.S] * sh.Wp * 4 + 4
    assert m["comm_bytes_per_cycle"] == expected
