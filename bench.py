"""Benchmark entry point — run on real TPU hardware by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: fused stencil-SpMV (Jacobi sweep incl. free residual) nnz/s
on the 4097^2 bi-material interface operator — the BASELINE.json north-star
kernel.  vs_baseline compares against the reference's measured CPU solver
iteration rate (M-FEANet-mg_test.ipynb cell 9: 24,367 weighted-Jacobi
iterations in 10.37 s on a 129^2 grid -> 9*127^2 nnz / 425.6 us = 0.341
Gnnz/s; the reference has no GPU/TPU path).

Extras: homogeneous-kernel nnz/s and the 4097^2 Poisson V(1,1) solve to an
absolute interior residual of 1e-6 (f=0, random init — the reference's own
convergence protocol, MM_Model_convergence.ipynb cells 3/5), with cycle
count, convergence factor and wall-clock.
"""

import json
import time

import numpy as np

REF_CPU_NNZ_PER_S = 9 * 127 * 127 / (10.37 / 24367)


def main():
    import jax
    import jax.numpy as jnp
    from multigrid_feanet_tpu.core import geometry
    from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
    from multigrid_feanet_tpu.ops import stencil
    from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
    from multigrid_feanet_tpu.solvers.pallas_mg import PallasHierarchy

    n = 4096
    nnz = 9 * (n - 1) * (n - 1)  # interior stencil rows

    # --- fused stencil-SpMV sweep throughput (bi-material + homogeneous) ---
    def sweep_rate(ps):
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
        f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
        u_pad, f_pad = ps.pad(u), ps.pad(f)
        iters = 400

        @jax.jit
        def run(u_pad, f_pad):
            def body(u, _):
                un, rsq = ps.sweep_padded(u, f_pad)
                return un, rsq

            return jax.lax.scan(body, u_pad, None, length=iters)

        out, _ = run(u_pad, f_pad)
        out.block_until_ready()
        t0 = time.time()
        out, _ = run(u_pad, f_pad)
        out.block_until_ready()
        dt = (time.time() - t0) / iters
        return nnz / dt, dt

    def sweep_rate_fused(ps, k, iters=150):
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
        f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
        u_pad, f_pad = ps.pad(u), ps.pad(f)

        @jax.jit
        def run(u_pad, f_pad):
            def body(u, _):
                un, rsq = ps.sweep_k_padded(u, f_pad, k)
                return un, rsq

            return jax.lax.scan(body, u_pad, None, length=iters)

        out, _ = run(u_pad, f_pad)
        out.block_until_ready()
        t0 = time.time()
        out, _ = run(u_pad, f_pad)
        out.block_until_ready()
        dt = (time.time() - t0) / (iters * k)
        return nnz / dt, dt

    phase = geometry.circle_phase(2.0, n)
    pid = stencil.pattern_ids(jnp.asarray(phase))
    ps_bi = PallasStencil(n, pid=pid, coefficients=(1.0, 20.0), interpret=False)
    rate_bi, dt_bi = sweep_rate(ps_bi)
    rate_bi_k4, dt_bi_k4 = sweep_rate_fused(ps_bi, 4)
    ps_ho = PallasStencil(n, pid=None, interpret=False)
    rate_ho, dt_ho = sweep_rate(ps_ho)
    rate_ho_k8, dt_ho_k8 = sweep_rate_fused(ps_ho, 8)

    # --- 4097^2 Poisson V(1,1) to 1e-6 absolute residual ---
    problem = Problem(n=n, inclusion=None, dtype=jnp.float32)
    hier = GridHierarchy.create(problem)
    ph = PallasHierarchy(hier, pallas_threshold=256)
    f0 = jnp.zeros((n + 1, n + 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    u0 = (150000.0 * jax.random.uniform(key, (n + 1, n + 1))).astype(jnp.float32)
    ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=1e-6, max_cycles=60)  # compile
    t0 = time.time()
    u, hist = ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=1e-6, max_cycles=60)
    t_solve = time.time() - t0
    cycles = len(hist)
    q = float(hist[-1] / hist[-2]) if cycles > 1 else float("nan")

    result = {
        "metric": "jacobi_sweep_nnz_per_s_4097sq_bimaterial_fused4",
        "value": rate_bi_k4,
        "unit": "nnz/s",
        "vs_baseline": rate_bi_k4 / REF_CPU_NNZ_PER_S,
        "spmv_nnz_per_s_bimaterial_k1": rate_bi,
        "sweep_us_bimaterial": dt_bi * 1e6,
        "sweep_us_homogeneous": dt_ho * 1e6,
        "nnz_per_s_homogeneous": rate_ho,
        "nnz_per_s_homogeneous_fused8": rate_ho_k8,
        "vcycle_4097_solve_s": t_solve,
        "vcycle_4097_cycles": cycles,
        "vcycle_4097_final_res": float(hist[-1]),
        "vcycle_4097_q": q,
        "effective_hbm_gbps_bimaterial": 13 * ps_bi.Hp * ps_bi.Wp / dt_bi / 1e9,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
