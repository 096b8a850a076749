"""Round-5 probe (VERDICT r4 #5): per-element COEFFICIENT-STREAM variants
of the bi-material Jacobi sweep vs the production int8-phase form.

The production kernel streams the raw element phase (int8, 1 B/node) and
materializes Q = a0 + da*phase in-kernel — an int8->f32 convert (VPU
unpack) plus one FMA per element.  The probe swaps that for a precomputed
Q stream (f32: +3 B/node, no convert; bf16: +1 B/node, cheap native
convert), trading stream bytes for VPU ops on a kernel measured at ~55%
of its triad bound (docs/kernel_notes_r4.md finding 5).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/probes/sweep_qstream_r5.py
Writes results/sweep_variants_r5.json.

The temporal-fusion arm of the directive is answered by existing data:
the r1 4-sweep fused bi-material kernel measures 359 Gnnz/s vs 402 for
the single V2 sweep (BENCH_r04 nnz_per_s_bimaterial_fused4_r1), and the
r4 deep-window pswrr (3 applies/pass) measured ~4% slower end-to-end than
split passes (kernel_notes_r4 finding 2) — the bi-material form is
VPU-bound, so amortizing HBM with more in-register applies loses.
"""

import functools
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops.pallas_sweep import (
    PallasLevel, _interior_mask, _lagged_spec, _roll_m, _roll_p, _SMEM_SPEC,
    _default_bounds)


from multigrid_feanet_tpu.ops.pallas_qsweep import _run_qsweep  # noqa: E402

def main():
    print("devices:", jax.devices(), flush=True)
    n = 4096
    nnz = 9 * (n - 1) * (n - 1)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    phase = geometry.circle_phase(2.0, n)
    lv = PallasLevel(n, stride=1, phase=phase, coefficients=(1.0, 20.0),
                     interpret=False, dform=False)
    out = {}

    def timeit(loopfn, a, b):
        a, b = loopfn(a, b)
        jax.block_until_ready(a)
        ts = {}
        for length in (64, 320):
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                a, b = loopfn(a, b, length)
                jax.block_until_ready(a)
                best = min(best, time.time() - t0)
            ts[length] = best
        return (ts[320] - ts[64]) / (2 * 256)

    # baseline: production int8-phase kernel
    f_pad = lv.pad(f)

    @functools.partial(jax.jit, static_argnames=("length",))
    def base_loop(a, b, length=64):
        def body(c, _):
            a, b = c
            x, _ = lv.sweep(a, f_pad, dst=b)
            y, _ = lv.sweep(x, f_pad, dst=a)
            return (y, x), None
        return jax.lax.scan(body, (a, b), None, length=length)[0]

    dt = timeit(base_loop, lv.pad(u), lv.zeros())
    out["int8_phase_us"] = dt * 1e6
    out["int8_phase_gnnz"] = nnz / dt / 1e9
    print(f"int8 phase: {dt*1e6:.1f} us", flush=True)

    # Q-stream variants
    q_np = (np.asarray(phase, np.float32) * 19.0 + 1.0)
    for qd, tag in ((jnp.float32, "qf32"), (jnp.bfloat16, "qbf16")):
        buf = np.zeros(lv.buf_shape, np.float32)
        buf[lv.R : lv.R + n, 0:n] = q_np
        q_pad = jnp.asarray(buf, qd)
        cfg = dict(R=lv.R, H=lv.H, W=lv.W, Wp=lv.Wp, omega=lv.omega, s=1,
                   interpret=False)

        @functools.partial(jax.jit, static_argnames=("length",))
        def q_loop(a, b, length=64, q_pad=q_pad, cfg=cfg):
            def body(c, _):
                a, b = c
                x = _run_qsweep(a, f_pad, q_pad, b, **cfg)
                y = _run_qsweep(x, f_pad, q_pad, a, **cfg)
                return (y, x), None
            return jax.lax.scan(body, (a, b), None, length=length)[0]

        dtq = timeit(q_loop, lv.pad(u), lv.zeros())
        out[f"{tag}_us"] = dtq * 1e6
        out[f"{tag}_gnnz"] = nnz / dtq / 1e9
        print(f"{tag}: {dtq*1e6:.1f} us", flush=True)

    # correctness spot-check of the f32 Q kernel vs production
    buf = np.zeros(lv.buf_shape, np.float32)
    buf[lv.R : lv.R + n, 0:n] = q_np
    q_pad = jnp.asarray(buf, jnp.float32)
    got = _run_qsweep(lv.pad(u), f_pad, q_pad, lv.zeros(), R=lv.R, H=lv.H,
                      W=lv.W, Wp=lv.Wp, omega=lv.omega, s=1, interpret=False)
    want, _ = lv.sweep(lv.pad(u), f_pad, dst=lv.zeros())
    err = float(jnp.max(jnp.abs(lv.unpad(got) - lv.unpad(want))))
    out["qf32_vs_int8_maxerr"] = err
    print("qf32 parity maxerr:", err, flush=True)

    out["temporal_fusion_note"] = (
        "VPU-bound: r1 fused-4 bi-material = 359 Gnnz/s vs 402 single "
        "(BENCH_r04); r4 pswrr (3 applies/pass) ~4% slower than split "
        "(kernel_notes_r4 finding 2)")
    path = pathlib.Path(__file__).resolve().parents[2] / "results"
    (path / "sweep_variants_r5.json").write_text(json.dumps(out, indent=1))
    print("wrote", path / "sweep_variants_r5.json", flush=True)


if __name__ == "__main__":
    main()
