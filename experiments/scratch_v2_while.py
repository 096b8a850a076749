"""Scratch: isolate the while_loop per-iteration penalty vs scan at 4097^2.
Variants: plain scan / while no-hist / while with hist / while of scan-chunks.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scratch_v2_while.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.problem import Problem
from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

n = 4096
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)

prob = Problem(n=n, inclusion=None)
ph2 = PallasHierarchyV2(prob, num_levels=7, pallas_threshold=128,
                        rows=64, direct_coarse=True)
p0 = ph2.pl[0]
fb = p0.pad(f)
N = 24


def timeit(fn, *args, iters=N):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time(); r = fn(*args); jax.block_until_ready(r)
    return (time.time() - t0) / iters


@jax.jit
def run_scan(ub, sp):
    def body(c, _):
        ub, sp, rsq = ph2._cycle0(c[0], c[1], fb, 1, 1)
        return (ub, sp), None
    return jax.lax.scan(body, (ub, sp), None, length=N)[0][0]


@jax.jit
def run_while(ub, sp):
    def cond(c):
        return c[2] < N

    def body(c):
        ub, sp, k = c
        ub, sp, rsq = ph2._cycle0(ub, sp, fb, 1, 1)
        return (ub, sp, k + 1)

    return jax.lax.while_loop(cond, body, (ub, sp, jnp.int32(0)))[0]


@jax.jit
def run_while_res(ub, sp):
    def cond(c):
        return (c[3] > 1e-30) & (c[2] < N)

    def body(c):
        ub, sp, k, res, hist = c
        ub, sp, rsq = ph2._cycle0(ub, sp, fb, 1, 1)
        res = jnp.sqrt(rsq).astype(jnp.float32)
        return (ub, sp, k + 1, res, hist.at[k].set(res))

    hist0 = jnp.full((N + 1,), jnp.inf, jnp.float32)
    return jax.lax.while_loop(
        cond, body, (ub, sp, jnp.int32(0), jnp.float32(jnp.inf), hist0))[0]


C = 4


@jax.jit
def run_while_chunk(ub, sp):
    def cond(c):
        return (c[3] > 1e-30) & (c[2] < N)

    def body(c):
        ub, sp, k, res = c

        def inner(cc, _):
            ub, sp, _ = cc
            ub, sp, rsq = ph2._cycle0(ub, sp, fb, 1, 1)
            return (ub, sp, rsq), None

        (ub, sp, rsq), _ = jax.lax.scan(inner, (ub, sp, jnp.float32(0)),
                                        None, length=C)
        return (ub, sp, k + C, jnp.sqrt(rsq))

    return jax.lax.while_loop(
        cond, body, (ub, sp, jnp.int32(0), jnp.float32(jnp.inf)))[0]


for name, fn in (("scan", run_scan), ("while_k", run_while),
                 ("while_res_hist", run_while_res),
                 (f"while_chunk{C}", run_while_chunk)):
    dt = timeit(fn, p0.pad(u), p0.zeros())
    print(f"{name:16s} {dt*1e3:6.2f} ms/cycle", flush=True)
