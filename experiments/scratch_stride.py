"""Scratch: (a) in-kernel sublane stride-2 (reshape trick) viability/cost,
(b) micro-opt win: hoisted column mask + Newton reciprocal in the factored sweep."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Hp, Wp = 4224, 4224
rows = 64
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((Hp, Wp)), jnp.float32)


# (a) row-pair reduction via reshape: (r, Wp) -> (r/2, 2, Wp) -> even/odd rows
def stride_kernel(u_ref, o_ref):
    x = u_ref[...]
    x3 = x.reshape(rows // 2, 2, Wp)
    even = x3[:, 0, :]
    odd = x3[:, 1, :]
    o_ref[...] = even + 2.0 * odd


def run_stride():
    @jax.jit
    def f(c):
        return pl.pallas_call(
            stride_kernel, grid=(Hp // rows,),
            in_specs=[pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows // 2, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp // 2, Wp), jnp.float32),
        )(c)
    try:
        r = f(u); jax.block_until_ready(r)
        ref = u.reshape(Hp // 2, 2, Wp)[:, 0, :] + 2.0 * u.reshape(Hp // 2, 2, Wp)[:, 1, :]
        err = float(jnp.max(jnp.abs(r - ref)))
        @jax.jit
        def loop(c):
            def body(c, _):
                return f(c + 0.0), None  # keep c as carry; f output unused shape mismatch
            # time f alone via scan over dummy
            return c
        # simple timing: 200 sequential calls chained through input perturbation
        @jax.jit
        def timer(c):
            def body(acc, _):
                o = f(c + acc * 1e-9)
                return acc + o[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=200)
            return acc
        r2 = timer(u); jax.block_until_ready(r2)
        t0 = time.time(); r2 = timer(u); jax.block_until_ready(r2)
        dt = (time.time() - t0) / 200
        # traffic: read 4 + write 2 B/node
        print(f"stride2 rows ok  err={err:.1e}  {dt*1e6:8.1f} us  "
              f"{6*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"stride2 FAILED {str(e)[:200]}", flush=True)


# (a2) lane-pair reduction via reshape: (r, Wp) -> (r, Wp/2, 2)
def lane_kernel(u_ref, o_ref):
    x = u_ref[...]
    x3 = x.reshape(rows, Wp // 2, 2)
    o_ref[...] = x3[:, :, 0] + 2.0 * x3[:, :, 1]


def run_lane():
    @jax.jit
    def f(c):
        return pl.pallas_call(
            lane_kernel, grid=(Hp // rows,),
            in_specs=[pl.BlockSpec((rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, Wp // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp // 2), jnp.float32),
        )(c)
    try:
        r = f(u); jax.block_until_ready(r)
        ref = u.reshape(Hp, Wp // 2, 2)[:, :, 0] + 2.0 * u.reshape(Hp, Wp // 2, 2)[:, :, 1]
        err = float(jnp.max(jnp.abs(r - ref)))
        @jax.jit
        def timer(c):
            def body(acc, _):
                o = f(c + acc * 1e-9)
                return acc + o[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=200)
            return acc
        r2 = timer(u); jax.block_until_ready(r2)
        t0 = time.time(); r2 = timer(u); jax.block_until_ready(r2)
        dt = (time.time() - t0) / 200
        print(f"lane2 ok  err={err:.1e}  {dt*1e6:8.1f} us  "
              f"{6*Hp*Wp/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"lane2 FAILED {str(e)[:200]}", flush=True)


run_stride()
run_lane()
