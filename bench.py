"""Benchmark entry point — run on real TPU hardware by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: the round-2 element-factored Pallas Jacobi sweep
(ops/pallas_sweep.PallasLevel.sweep, donation ping-pong, includes the free
pre-update residual norm) in nnz/s on the 4097^2 bi-material interface
operator — the BASELINE.json north-star kernel.  vs_baseline compares
against the reference's measured CPU solver iteration rate
(M-FEANet-mg_test.ipynb cell 9: 24,367 weighted-Jacobi iterations in
10.37 s on a 129^2 grid -> 0.341 Gnnz/s; the reference has no GPU/TPU path).

Timing methodology: sweeps run inside one jitted lax.scan with TWO sweeps
per body (ping-pong returns buffers to their carry slots — no hidden XLA
copies) and are timed at two scan lengths; the difference cancels the
~20 ms fixed per-call dispatch latency of the remote-TPU tunnel.  Solve
wall-clock is min over 3 full calls (honest end-to-end, includes dispatch),
plus a dispatch-free per-cycle rate from differencing two eps targets.

Extras: the 4097^2 Poisson V(1,1) solve to an absolute interior residual
of 1e-6 (f=0, random init — the reference's own convergence protocol,
MM_Model_convergence.ipynb cells 3/5) on the fully-fused
PallasHierarchyV2, the round-1 temporally-fused k-sweep rates (kept for
cross-round continuity), cycle count, convergence factor, wall-clock.
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
    from multigrid_feanet_tpu.ops import heat, stencil
    from multigrid_feanet_tpu.ops.pallas_stencil import PallasStencil
    from multigrid_feanet_tpu.ops.pallas_sweep import PallasLevel
    from multigrid_feanet_tpu.solvers import elastic as elastic_mod
    from multigrid_feanet_tpu.solvers import hmg
    from multigrid_feanet_tpu.solvers.pallas_mg2 import PallasHierarchyV2

    n = 4096
    nnz = 9 * (n - 1) * (n - 1)  # interior stencil rows
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), dtype=jnp.float32)

    # --- V2 sweep throughput, dispatch-cancelled (primary) ---
    def v2_sweep_time(lv, lengths=(64, 320)):
        """Seconds per sweep via two-scan-length differencing."""
        f_pad = lv.pad(f)

        def make(length):
            @jax.jit
            def loop(a, b):
                def body(c, _):
                    a, b = c
                    x, _ = lv.sweep(a, f_pad, dst=b)
                    y, _ = lv.sweep(x, f_pad, dst=a)
                    return (y, x), None
                return jax.lax.scan(body, (a, b), None, length=length)[0]
            return loop

        ts = {}
        for length in lengths:
            loop = make(length)
            a, b = loop(lv.pad(u), lv.zeros())  # compile + warm
            jax.block_until_ready(a)
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                a, b = loop(a, b)  # chained args — never a repeated pure call
                jax.block_until_ready(a)
                best = min(best, time.time() - t0)
            ts[length] = best
        return (ts[lengths[1]] - ts[lengths[0]]) / (2 * (lengths[1] - lengths[0]))

    # Primary row: the PLAIN element-factored sweep (dform=False) — valid
    # as a standalone smoother and the r1..r4 continuity metric.  The
    # production SOLVER default since round 5 is the difference-form
    # kernel (dform=True, separate row below): its rounding scales with
    # the local variation of u instead of its magnitude, which is what
    # keeps V-cycles stable at 4097^2 (plain-form residuals destabilized
    # the interface solve outright — see docs/kernel_notes_r5.md).
    phase = geometry.circle_phase(2.0, n)
    lv_bi = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 20.0),
                        interpret=False, dform=False)
    dt_bi = v2_sweep_time(lv_bi)
    lv_bi_d = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 20.0),
                          interpret=False, dform=True)
    dt_bi_d = v2_sweep_time(lv_bi_d)
    lv_ho = PallasLevel(n, stride=1, phase=None, interpret=False, dform=False)
    dt_ho = v2_sweep_time(lv_ho)
    rate_bi, rate_ho = nnz / dt_bi, nnz / dt_ho

    # Q-stream variant (ops/pallas_qsweep.py, round 5): precomputed bf16
    # per-element coefficients instead of the int8 phase decode — EXACT
    # for the (1, 20) pair, +19% on the standalone bi-material sweep
    from multigrid_feanet_tpu.ops import pallas_qsweep as qs

    q_pad = qs.make_q_pad(lv_bi, phase, (1.0, 20.0), dtype=jnp.bfloat16)

    def q_sweep_time(lengths=(64, 320)):
        f_pad = lv_bi.pad(f)

        def make(length):
            @jax.jit
            def loop(a, b):
                def body(c, _):
                    a, b = c
                    x = qs.qsweep(lv_bi, a, f_pad, q_pad, dst=b)
                    y = qs.qsweep(lv_bi, x, f_pad, q_pad, dst=a)
                    return (y, x), None
                return jax.lax.scan(body, (a, b), None, length=length)[0]
            return loop

        ts = {}
        for length in lengths:
            loop = make(length)
            a, b = loop(lv_bi.pad(u), lv_bi.zeros())
            jax.block_until_ready(a)
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                a, b = loop(a, b)
                jax.block_until_ready(a)
                best = min(best, time.time() - t0)
            ts[length] = best
        return (ts[lengths[1]] - ts[lengths[0]]) / (2 * (lengths[1] - lengths[0]))

    dt_q16 = q_sweep_time()
    # bf16-storage sweep (f32 in-kernel compute): halves the HBM stream of
    # the stream-bound homogeneous form -> measured ~1.6x.  The bi-material
    # form and the fused V-cycle legs are VPU-compute-bound and do NOT
    # speed up (docs/kernel_notes_r4.md findings 5/6), so f32 stays the
    # production dtype for solves.
    lv_ho16 = PallasLevel(n, stride=1, phase=None, interpret=False,
                          dtype=jnp.bfloat16, dform=False)
    dt_ho16 = v2_sweep_time(lv_ho16)

    # --- round-1 temporally-fused k-sweep rates (continuity rows) ---
    def fused_rate(ps, k, iters=150):
        u_pad, f_pad = ps.pad(u), ps.pad(f)

        @jax.jit
        def run(u_pad, f_pad):
            def body(c, _):
                un, rsq = ps.sweep_k_padded(c, f_pad, k)
                return un, None
            return jax.lax.scan(body, u_pad, None, length=iters)[0]

        out = run(u_pad, f_pad)
        out.block_until_ready()
        t0 = time.time()
        out = run(out, f_pad)
        out.block_until_ready()
        return nnz / ((time.time() - t0) / (iters * k))

    pid = stencil.pattern_ids(jnp.asarray(phase))
    ps_bi = PallasStencil(n, pid=pid, coefficients=(1.0, 20.0), interpret=False)
    rate_bi_k4 = fused_rate(ps_bi, 4)
    ps_ho = PallasStencil(n, pid=None, interpret=False)
    rate_ho_k8 = fused_rate(ps_ho, 8)

    # --- 4097^2 Poisson V(1,1) to 1e-6 absolute residual (V2 solver) ---
    problem = Problem(n=n, inclusion=None, dtype=jnp.float32)
    ph = PallasHierarchyV2(problem, num_levels=9, pallas_threshold=32,
                           rows=64, rows_coarse=32, direct_coarse=True)
    f0 = jnp.zeros((n + 1, n + 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    u0 = (150000.0 * jax.random.uniform(key, (n + 1, n + 1))).astype(jnp.float32)
    ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=1e-6, max_cycles=60, chunk=2)
    t_solve = np.inf
    for _ in range(5):
        t0 = time.time()
        un, hist = ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=1e-6, max_cycles=60,
                            chunk=2)
        t_solve = min(t_solve, time.time() - t0)
    cycles = len(hist)
    q = float(hist[-1] / hist[-2]) if cycles > 1 else float("nan")
    # dispatch-free per-cycle rate: difference two FIXED cycle counts
    ts_fix = {}
    for mc in (8, 24):
        ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=0.0, max_cycles=mc, chunk=2)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            ph.solve(f0, u0=u0, nu1=1, nu2=1, eps=0.0, max_cycles=mc, chunk=2)
            best = min(best, time.time() - t0)
        ts_fix[mc] = best
    ms_per_cycle = (ts_fix[24] - ts_fix[8]) / 16 * 1e3

    # --- the bi-material INTERFACE problem at 4097^2 (the reference's
    # flagship problem at framework scale — round 5): plain V(1,1),
    # operator-induced BoxMG (Galerkin hierarchy, bf16 coefficient
    # streams), and the one-jit device-resident BoxMG setup cost.
    # f=0 random-init decay to 1e-6 absolute (the floor-free protocol).
    # NOTE: at this size the interface V-cycle is only STABLE at all with
    # the difference-form kernels (the production default) — the plain
    # form's magnitude-scaled rounding bias, kappa-amplified through the
    # coarse correction, diverges at q = 1.26 (docs/kernel_notes_r5.md).
    from multigrid_feanet_tpu.core.problem import GridHierarchy as _GH
    from multigrid_feanet_tpu.ops import boxmg as boxmg_mod
    from multigrid_feanet_tpu.solvers.pallas_boxmg import PallasBoxMG

    bi_prob0 = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                       dtype=jnp.float32)
    bi_hier = _GH.create(bi_prob0, 9)
    ph_bi = PallasHierarchyV2(bi_prob0, num_levels=9, pallas_threshold=32,
                              rows=64, rows_coarse=32, direct_coarse=True,
                              hier=bi_hier)
    u0bi = u0 * bi_hier.finest.geo
    ph_bi.solve(f0, u0=u0bi, eps=1e-6, max_cycles=120, chunk=2)
    t_vbi = np.inf
    for _ in range(3):
        t0 = time.time()
        uvb, hvb = ph_bi.solve(f0, u0=u0bi, eps=1e-6, max_cycles=120, chunk=2)
        jax.block_until_ready(uvb)
        t_vbi = min(t_vbi, time.time() - t0)
    hvb = np.asarray(hvb)
    q_vbi = float(np.exp(np.mean(np.diff(np.log(hvb + 1e-30))[-6:])))

    t0 = time.time()
    bx_setup = boxmg_mod.boxmg_setup(bi_hier, 9)
    jax.block_until_ready(bx_setup[-1][1])
    boxmg_setup_s = time.time() - t0  # includes the one-time XLA compile
    t0 = time.time()
    bm = PallasBoxMG(bi_prob0, num_levels=9, pallas_threshold=32, rows=64,
                     rows_coarse=32, hier=bi_hier, setup=bx_setup,
                     coef_dtype=jnp.bfloat16)
    boxmg_build_s = time.time() - t0
    bm.solve(f0, u0=u0bi, eps=1e-6, max_cycles=60, chunk=2)
    t_bx = np.inf
    for _ in range(3):
        t0 = time.time()
        ubx, hbx = bm.solve(f0, u0=u0bi, eps=1e-6, max_cycles=60, chunk=2)
        jax.block_until_ready(ubx)
        t_bx = min(t_bx, time.time() - t0)
    hbx = np.asarray(hbx)
    q_bx = float(np.exp(np.mean(np.diff(np.log(hbx + 1e-30))[-6:])))
    ts_bx = {}
    for mc in (6, 18):
        bm.solve(f0, u0=u0bi, eps=0.0, max_cycles=mc, chunk=2)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            uu, _ = bm.solve(f0, u0=u0bi, eps=0.0, max_cycles=mc, chunk=2)
            jax.block_until_ready(uu)
            best = min(best, time.time() - t0)
        ts_bx[mc] = best
    boxmg_ms_cycle = (ts_bx[18] - ts_bx[6]) / 12 * 1e3

    # scalar MG-preconditioned flexible CG on the interface problem (the
    # round-4 untested twin, now tested + benched — VERDICT r4 #3)
    ph_bi.solve_pcg(f0, u0=u0bi, eps=1e-6, max_iters=60)
    t_pcg_bi = np.inf
    for _ in range(3):
        t0 = time.time()
        upc, hpc = ph_bi.solve_pcg(f0, u0=u0bi, eps=1e-6, max_iters=60)
        jax.block_until_ready(upc)
        t_pcg_bi = min(t_pcg_bi, time.time() - t0)

    # --- heat theta-system on the fused Pallas kernels, 4097^2 ---
    # sweep: PallasLevel with the mass triple (M + theta dt K); march: 10
    # implicit steps, 2 V(1,1) cycles each, ONE lax.scan dispatch
    # (ops/heat.py::HeatSolver.march; on-chip parity vs the XLA path in
    # results/heat_march_tpu.json and tests/test_heat.py)
    bi_prob = Problem(n=n, inclusion=("circle", (0.0, 0.0), 0.5),
                      dtype=jnp.float32)
    hs = heat.HeatSolver(bi_prob, dt=1e-3, theta=0.5, backend="pallas",
                         pallas_kw=dict(num_levels=9, pallas_threshold=32,
                                        rows=64, rows_coarse=32))
    heat_sweep_us = v2_sweep_time(hs.ph.pl[0]) * 1e6
    steps = 10
    u0h = jnp.zeros((n + 1, n + 1), jnp.float32)
    hu = hs.march(u0h, f, steps, cycles_per_step=2)
    jax.block_until_ready(hu)
    heat_march_ms = np.inf
    for _ in range(3):
        t0 = time.time()
        hu = hs.march(u0h, f, steps, cycles_per_step=2)
        jax.block_until_ready(hu)
        heat_march_ms = min(heat_march_ms, (time.time() - t0) / steps * 1e3)

    # --- elastic block-Jacobi sweep (fused Pallas kernel), 2049^2 ---
    # (ops/pallas_elastic.py; on-chip parity vs the XLA block ops in
    # tests/test_pallas_elastic.py + experiments/tpu_parity.py)
    from multigrid_feanet_tpu.ops.pallas_elastic import PallasElasticLevel

    ne = 2048
    E_, nu_ = 212e3, 0.288  # Plane_Stress_modify.m:11-12
    phase_e = geometry.circle_phase(2.0, ne)
    ple = PallasElasticLevel(ne, E_, nu_, phase=phase_e,
                             coefficients=(1.0, 20.0), rows=64,
                             interpret=False)
    ue = jnp.asarray(rng.standard_normal((2, ne + 1, ne + 1)), jnp.float32)
    fe = jnp.asarray(rng.standard_normal((2, ne + 1, ne + 1)), jnp.float32)
    fex, fey = ple.pad(fe)

    def el_sweep_time(lengths=(32, 160)):
        def make(length):
            @jax.jit
            def loop(a, b, c, d):
                def body(carry, _):
                    (ax, ay), (bx, by) = carry
                    o1, _ = ple.sweep(ax, ay, fex, fey, dst=(bx, by))
                    o2, _ = ple.sweep(o1[0], o1[1], fex, fey, dst=(ax, ay))
                    return (o2, o1), None
                (aa, bb), _ = jax.lax.scan(body, ((a, b), (c, d)), None,
                                           length=length)
                return aa[0], aa[1], bb[0], bb[1]
            return loop

        ts = {}
        for length in lengths:
            loop = make(length)
            args = loop(*ple.pad(ue), ple.zeros(), ple.zeros())
            jax.block_until_ready(args[0])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                args = loop(*args)
                jax.block_until_ready(args[0])
                best = min(best, time.time() - t0)
            ts[length] = best
        return (ts[lengths[1]] - ts[lengths[0]]) / (2 * (lengths[1] - lengths[0]))

    elastic_sweep_us = el_sweep_time() * 1e6

    # --- elastic MG V(2,2) per-cycle rate at 2049^2 (PallasElasticMG) ---
    emg = elastic_mod.PallasElasticMG(
        ne, E_, nu_, inclusion=("circle", (0.0, 0.0), 0.5),
        coefficients=(1.0, 20.0), num_levels=9, pallas_threshold=512,
        rows=64, direct_coarse=True)
    ue0 = jax.random.normal(jax.random.PRNGKey(1), (2, ne + 1, ne + 1),
                            jnp.float32)
    fe0 = jnp.zeros((2, ne + 1, ne + 1), jnp.float32)
    ts_e = {}
    for mc in (4, 12):
        emg.solve(fe0, u0=ue0, nu1=2, nu2=2, eps=0.0, max_cycles=mc)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _, he = emg.solve(fe0, u0=ue0, nu1=2, nu2=2, eps=0.0,
                              max_cycles=mc)
            best = min(best, time.time() - t0)
        ts_e[mc] = best
    elastic_cycle_ms = (ts_e[12] - ts_e[4]) / 8 * 1e3
    # TRANSIENT tail factor at 12 cycles (kept for cross-round continuity)
    elastic_q = float(np.exp(np.mean(np.diff(np.log(np.asarray(he)))[-4:])))
    # true asymptotic factor: long window (round 5 — the 12-cycle tail is
    # a transient; f64 long-window measures ~0.82 at n=64..128,
    # results/elastic_boxmg/summary.json; block-BoxMG W(2,2) cures to 0.43)
    _, he_long = emg.solve(fe0, u0=ue0, nu1=2, nu2=2, eps=0.0, max_cycles=60)
    elastic_q_asym = float(np.exp(np.mean(
        np.diff(np.log(np.asarray(he_long)))[-8:])))
    # production elastic path: MG-preconditioned flexible CG (the plain
    # V(2,2) tail degrades with n as bilinear transfers kink across the
    # 20:1 jump; Krylov acceleration restores ~sqrt of the cycle factor)
    emg.solve_pcg(fe0, u0=ue0, nu1=2, nu2=2, eps=0.0, max_iters=16)
    t_pcg = np.inf
    for _ in range(3):
        t0 = time.time()
        _, hp = emg.solve_pcg(fe0, u0=ue0, nu1=2, nu2=2, eps=0.0,
                              max_iters=16)
        t_pcg = min(t_pcg, time.time() - t0)
    hp = np.asarray(hp)
    elastic_pcg_contraction = float(np.exp(np.mean(np.diff(np.log(hp + 1e-30))[-6:])))
    elastic_pcg_drop16 = float(hp[-1] / hp[0])

    # --- H-MG: V-cycles with the learned H-Net smoother at 4097^2 ---
    # Round 4: the FUSED whole-solve (solvers/hmg.py::PallasHMG, two fused
    # kernel passes per level per cycle) driving the error-decay-trained
    # SINGLE-CONV (L=1) H-Net: the fused H legs are VPU-compute-bound
    # (docs/kernel_notes_r4.md finding 1), and the L=1 chain reaches the
    # same q ~ 0.055 as the 3-layer net at 1/3 the chain cost
    # (results/learn_iterator/decay_L1_hlNone_summary.json) — 2.73 vs
    # 4.49 ms/cycle, making the learned smoother a wall-clock WIN over
    # plain MG (11 cycles / ~60 ms vs 23 cycles / ~73 ms).
    from multigrid_feanet_tpu.utils import checkpoint as ckpt
    hp = jnp.asarray(
        ckpt.load("results/learn_iterator/hnet_decay_L1_hlNone.npz")[0])
    hm = hmg.PallasHMG(problem, num_levels=9, pallas_threshold=32, rows=64,
                       rows_coarse=32, direct_coarse=True)
    hm.solve(hp, f0, u0=u0, eps=1e-6, max_cycles=40)
    t_hmg = np.inf
    for _ in range(3):
        t0 = time.time()
        uh, hh = hm.solve(hp, f0, u0=u0, eps=1e-6, max_cycles=40)
        t_hmg = min(t_hmg, time.time() - t0)
    hmg_q = float((hh[-1] / hh[0]) ** (1.0 / (len(hh) - 1)))

    # --- nonzero-f 4097^2 -> 1e-6 via mixed-precision IR (BASELINE's
    # hard row: f32 V-cycles floor at ~1e-4 absolute; solve_ir breaks it
    # with f64 residuals + f32 correction solves) ---
    from multigrid_feanet_tpu.ops.stencil import apply_mass
    from multigrid_feanet_tpu.solvers.pallas_mg import solve_ir

    f1 = apply_mass(jnp.ones((n + 1, n + 1), jnp.float32), problem.size / n)
    with jax.enable_x64(True):
        solve_ir(ph, f1, nu1=1, nu2=1, eps=1e-6, cycles_per_correction=6,
                 max_outer=12)
        t_ir = np.inf
        for _ in range(3):
            t0 = time.time()
            u_ir, ir_hist = solve_ir(ph, f1, nu1=1, nu2=1, eps=1e-6,
                                     cycles_per_correction=6, max_outer=12)
            t_ir = min(t_ir, time.time() - t0)

    # --- measured HBM anchors (copy = achievable streaming peak at the
    # sweep's block shape; triad = the sweep's exact stream count) ---
    from multigrid_feanet_tpu.ops import pallas_membench as mb

    copy_peak = mb.copy_gbps(rows_total=lv_bi.Hp, Wp=lv_bi.Wp, R=64)
    triad = mb.triad_gbps(rows_total=lv_bi.Hp, Wp=lv_bi.Wp, R=64)

    # --- periodic (torus) fused sweep at 4096^2 (ops/pallas_torus.py) ---
    from multigrid_feanet_tpu.ops.pallas_torus import PallasTorusLevel

    tl = PallasTorusLevel(n, rows=64)
    fpb = tl.pad(f[:n, :n])

    def torus_time(lengths=(64, 320)):
        def make(length):
            @jax.jit
            def loop(a, b):
                def body(c, _):
                    a, b = c
                    x, _ = tl.sweep(a, fpb, dst=b)
                    y, _ = tl.sweep(x, fpb, dst=a)
                    return (y, x), None
                return jax.lax.scan(body, (a, b), None, length=length)[0]
            return loop

        ts = {}
        for length in lengths:
            loop = make(length)
            a, b = loop(tl.pad(u[:n, :n]), tl.zeros())
            jax.block_until_ready(a)
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                a, b = loop(a, b)
                jax.block_until_ready(a)
                best = min(best, time.time() - t0)
            ts[length] = best
        return (ts[lengths[1]] - ts[lengths[0]]) / (2 * (lengths[1] - lengths[0]))

    torus_us = torus_time() * 1e6

    result = {
        "metric": "jacobi_sweep_nnz_per_s_4097sq_bimaterial_v2",
        "value": rate_bi,
        "unit": "nnz/s",
        "vs_baseline": rate_bi / REF_CPU_NNZ_PER_S,
        "sweep_us_bimaterial": dt_bi * 1e6,
        "sweep_us_bimaterial_dform": dt_bi_d * 1e6,
        "nnz_per_s_bimaterial_dform": nnz / dt_bi_d,
        "sweep_us_bimaterial_qbf16": dt_q16 * 1e6,
        "nnz_per_s_bimaterial_qbf16": nnz / dt_q16,
        "sweep_us_homogeneous": dt_ho * 1e6,
        "nnz_per_s_homogeneous": rate_ho,
        "sweep_us_homogeneous_bf16": dt_ho16 * 1e6,
        "nnz_per_s_homogeneous_bf16": nnz / dt_ho16,
        "nnz_per_s_bimaterial_fused4_r1": rate_bi_k4,
        "nnz_per_s_homogeneous_fused8_r1": rate_ho_k8,
        "vcycle_4097_solve_s": t_solve,
        "vcycle_4097_cycles": cycles,
        "vcycle_4097_final_res": float(hist[-1]),
        "vcycle_4097_q": q,
        "vcycle_4097_ms_per_cycle_net": ms_per_cycle,
        "vcycle_4097_bimaterial_s": t_vbi,
        "vcycle_4097_bimaterial_cycles": len(hvb),
        "vcycle_4097_bimaterial_q": q_vbi,
        "boxmg_4097_s": t_bx,
        "boxmg_4097_cycles": len(hbx),
        "boxmg_4097_q": q_bx,
        "boxmg_4097_ms_per_cycle": boxmg_ms_cycle,
        "boxmg_4097_setup_s": boxmg_setup_s,
        "boxmg_4097_build_s": boxmg_build_s,
        "pcg_4097_bimaterial_iters": len(hpc),
        "pcg_4097_bimaterial_s": t_pcg_bi,
        "pcg_4097_bimaterial_final_res": float(hpc[-1]),
        "heat_sweep_us_4097_bimaterial": heat_sweep_us,
        "heat_march_ms_per_step_4097": heat_march_ms,
        "elastic_sweep_us_2049_bimaterial": elastic_sweep_us,
        "elastic_mg_ms_per_cycle_2049": elastic_cycle_ms,
        "elastic_mg_q_v22": elastic_q,
        "elastic_mg_q_v22_asymptotic": elastic_q_asym,
        "elastic_pcg_contraction_2049": elastic_pcg_contraction,
        "elastic_pcg_drop_16it": elastic_pcg_drop16,
        "elastic_pcg_16it_s": t_pcg,
        "hmg_4097_solve_s": t_hmg,
        "hmg_4097_cycles": len(hh),
        "hmg_4097_final_res": float(hh[-1]),
        "hmg_4097_q": hmg_q,
        "vcycle_4097_f1_ir_s": t_ir,
        "vcycle_4097_f1_ir_corrections": len(ir_hist) - 1,
        "vcycle_4097_f1_ir_final_res": float(ir_hist[-1]),
        "effective_hbm_gbps_bimaterial": 13 * lv_bi.Hp * lv_bi.Wp / dt_bi / 1e9,
        "measured_copy_peak_gbps": copy_peak,
        "measured_triad_gbps": triad,
        "torus_sweep_us_4096": torus_us,
        # sweep time over the time the measured triad rate needs for the
        # sweep's own 12 B/node stream count — the honest roofline
        # fraction; the residue is the stencil's VPU work
        # (docs/kernel_notes_r4.md findings 1/5)
        "sweep_stream_fraction_of_triad": (
            12 * lv_bi.Hp * lv_bi.Wp / triad / 1e9) / dt_bi,
        "sweep_vs_copy_peak": (13 * lv_bi.Hp * lv_bi.Wp / dt_bi / 1e9)
        / copy_peak,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
