"""HBM-bandwidth anchor kernels (VERDICT r3 #2).

The production sweep's "effective GB/s" is only meaningful against the
bandwidth this chip actually achieves under the same execution structure —
an automatic-pipeline Pallas kernel streaming (R, Wp) f32 blocks.  This
module provides that anchor:

- ``copy_gbps``: out = in + 1 (8 B/node: one read + one write; the +1
  defeats value-level result caching) — the achievable streaming peak for
  the sweep's block shape.
- ``triad_gbps``: out = a + 0.5 * b (12 B/node: two reads + one write) —
  the Jacobi sweep's exact stream count, zero stencil math, so the gap
  between triad and the sweep is pure in-kernel compute/window overhead.

Both run as one jitted lax.scan over k kernel calls with donated
ping-pong buffers (the production solve-loop structure) and report
bytes / second from two scan lengths (dispatch-cancelled, same timing
methodology as bench.py).
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(src_ref, dst_ref, out_ref):
    # +1.0 keeps the stream structure of a pure copy while making every
    # iteration's values distinct — a value-preserving chain would let the
    # remote tunnel serve repeated calls from cache (see copy_gbps note)
    out_ref[...] = src_ref[...] + 1.0


def _triad_kernel(a_ref, b_ref, dst_ref, out_ref):
    out_ref[...] = a_ref[...] + 0.5 * b_ref[...]


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def _run_copy(src, dst, *, R, interpret):
    nb = src.shape[0] // R
    Wp = src.shape[1]
    return pl.pallas_call(
        _copy_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(src, dst)


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def _run_triad(a, b, dst, *, R, interpret):
    nb = a.shape[0] // R
    Wp = a.shape[1]
    return pl.pallas_call(
        _triad_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(a, b, dst)


def _scan_time(loop, args, lengths):
    """Min-of-3 wall time per inner call via two-scan-length differencing.

    The loop fn must return ``(*carry_buffers, probe_scalar)`` where the
    probe is a (cheap) reduction of the final carry.  The probe is fetched
    to HOST (``float()``) inside the timed region: ``block_until_ready`` on
    donation-aliased outputs does NOT force execution through the remote
    tunnel (the whole chained scan is lazily deferred — measured: a
    640-copy chain "completes" in 0.1 ms without the fetch, and the probe
    values prove every iteration runs once fetched).  The 4-byte fetch
    costs one RTT, cancelled by the differencing."""
    ts = {}
    for length in lengths:
        fn = loop(length)
        out = fn(*args)
        float(out[-1])
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = fn(*out[:-1])
            float(out[-1])
            best = min(best, time.time() - t0)
        ts[length] = best
    return (ts[lengths[1]] - ts[lengths[0]]) / (2 * (lengths[1] - lengths[0]))


def _probe(x):
    # tiny strided reduction — negligible work, depends on the full chain
    return jnp.sum(x[::37, ::41])


def copy_gbps(rows_total: int = 4160, Wp: int = 4224, R: int = 64,
              lengths=(64, 320), interpret=None) -> float:
    """Measured streaming bandwidth (GB/s, read + write) of the pure-copy
    kernel at the production sweep's block shape.

    Buffers are RANDOM, not zeros: the remote-TPU tunnel elides repeated
    pure calls on value-identical inputs (measured: a 128-copy scan of
    zero buffers "completes" in 50 us), so constant inputs benchmark the
    cache, not the chip."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (rows_total, Wp), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (rows_total, Wp),
                          jnp.float32)

    def loop(length):
        @jax.jit
        def fn(a, b):
            def body(c, _):
                a, b = c
                x = _run_copy(a, dst=b, R=R, interpret=interpret)
                y = _run_copy(x, dst=a, R=R, interpret=interpret)
                return (y, x), None
            ya, xb = jax.lax.scan(body, (a, b), None, length=length)[0]
            return ya, xb, _probe(ya)
        return fn

    dt = _scan_time(loop, (a, b), lengths)
    return 8.0 * rows_total * Wp / dt / 1e9


def triad_gbps(rows_total: int = 4160, Wp: int = 4224, R: int = 64,
               lengths=(64, 320), interpret=None) -> float:
    """Measured bandwidth (GB/s, 2 reads + 1 write) of the triad kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a = jax.random.normal(jax.random.PRNGKey(0), (rows_total, Wp), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (rows_total, Wp), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2), (rows_total, Wp), jnp.float32)

    def loop(length):
        @jax.jit
        def fn(a, b, c):
            def body(carry, _):
                a, b, c = carry
                # THREE triads per body so the buffer rotation composes to
                # the identity on carry slots (x sits in c's buffer, y in
                # a's, z in b's).  A non-slot-stable rotation makes XLA
                # insert a full-buffer copy per carry slot per iteration —
                # measured 5x slowdown (411 vs ~1300 GB/s).
                x = _run_triad(a, b, dst=c, R=R, interpret=interpret)
                y = _run_triad(x, b, dst=a, R=R, interpret=interpret)
                z = _run_triad(y, x, dst=b, R=R, interpret=interpret)
                return (y, z, x), None
            ya, zb, xc = jax.lax.scan(body, (a, b, c), None, length=length)[0]
            return ya, zb, xc, _probe(ya)
        return fn

    dt = _scan_time(loop, (a, b, c), lengths)
    dt = dt * 2.0 / 3.0  # _scan_time assumes 2 kernels/body; we run 3
    return 12.0 * rows_total * Wp / dt / 1e9
