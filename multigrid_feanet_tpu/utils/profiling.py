"""Tracing / profiling helpers: jax.profiler traces and stencil rooflines.

The reference's only instrumentation is wall-clock brackets in notebooks
(SURVEY.md section 5); here profiling is first-class: structured timing of
jitted callables, per-kernel roofline numbers (nnz/s, effective HBM GB/s)
and optional TensorBoard-format traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import numpy as np


@dataclasses.dataclass
class KernelStats:
    name: str
    seconds_per_call: float
    nnz_per_s: float | None = None
    effective_gbps: float | None = None

    def as_dict(self):
        return dataclasses.asdict(self)


def time_callable(fn: Callable, *args, iters: int = 100, warmup: int = 1) -> float:
    """Median-free simple timing of a jitted callable; blocks on the result.
    The callable should internally amortize (e.g. lax.scan over sweeps) when
    per-dispatch overhead matters."""
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    return (time.time() - t0) / iters


def stencil_roofline(n: int, seconds_per_sweep: float, bytes_per_node: float = 13.0,
                     name: str = "stencil_sweep") -> KernelStats:
    """nnz/s and effective HBM bandwidth for one fused sweep over an
    (n+1)^2 grid with 9-point interior rows."""
    nnz = 9 * (n - 1) * (n - 1)
    nodes = (n + 1) * (n + 1)
    return KernelStats(
        name=name,
        seconds_per_call=seconds_per_sweep,
        nnz_per_s=nnz / seconds_per_sweep,
        effective_gbps=bytes_per_node * nodes / seconds_per_sweep / 1e9,
    )


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context (TensorBoard format); no-op if logdir is
    None or the profiler is unavailable."""
    if logdir is None:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def divergence_guard(res: float) -> bool:
    """True if the iteration has diverged (inf/nan residual) — the
    reference's guard (M-FEANet-mg_test.ipynb cells 21-22)."""
    return not np.isfinite(res)
