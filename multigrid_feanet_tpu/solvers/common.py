"""Shared conventions for the fused whole-solve drivers.

Every one-dispatch solver in this package (solvers/pallas_mg2.py,
solvers/hmg.py::PallasHMG, solvers/elastic.py::PallasElasticMG, and the heat
wrapper) rides the same *free-residual* protocol: each cycle's first fused
sweep emits the squared interior residual norm of its INCOMING iterate, so
the while_loop needs no extra residual pass and the host syncs once per
solve.  The cost is a one-cycle lag — the norm of cycle k's output is only
known once cycle k+1's first sweep has run — which yields the shared
convention implemented by :func:`trim_history`:

- ``history[j]`` = interior residual norm after cycle ``j + 1`` (the
  reference's convention, MM_Model_convergence.ipynb cell 5);
- ``len(history)`` = cycles to reach ``eps`` (or the recorded cap);
- the returned ``u`` includes AT LEAST one extra cycle beyond
  ``history[-1]`` (plus up to ``chunk - 1`` more when chunked), so it is
  always at least as converged as the last history entry.

tests/test_solve_semantics.py pins these invariants across the solvers.

This module also owns the per-hierarchy compiled-closure cache for
module-level solve entry points (:func:`instance_cache`): keying a global
dict by ``id(obj)`` alone is unsafe — ids are reused after garbage
collection, so a dead hierarchy's compiled closure (baked-in operator
fields!) could serve a different live one — and unbounded.  A
``weakref.finalize`` hook evicts each entry when its owner is collected,
which restores both correctness and boundedness.  (Instance-attribute
caches like ``PallasHierarchyV2._compiled`` are already safe: their
lifetime is their owner's.)
"""

from __future__ import annotations

import weakref

import numpy as np

__all__ = ["trim_history", "instance_cache"]


def trim_history(hist, eps: float) -> np.ndarray:
    """Trim a fused solve's raw residual history to the shared convention.

    ``hist`` is the device history buffer: ``hist[i]`` = interior residual
    norm after ``i`` cycles (``hist[0]`` = the initial residual, emitted
    free by the first cycle's first sweep), with -1.0 sentinels marking
    never-written entries.  Returns ``history`` with ``history[j]`` =
    residual after cycle ``j + 1``, cut at the first entry ``<= eps``.
    """
    vals = np.asarray(hist)
    k = int(np.sum(vals >= 0.0))
    below = np.nonzero(vals[:k] <= eps)[0]
    c = int(below[0]) if below.size else k - 1
    return vals[1 : c + 1]


_CACHES: dict = {}


def instance_cache(obj) -> dict:
    """A dict cache tied to ``obj``'s lifetime (evicted at collection via
    ``weakref.finalize``), for module-level solvers that compile closures
    over a caller-owned hierarchy."""
    key = id(obj)
    cache = _CACHES.get(key)
    if cache is None:
        cache = {}
        _CACHES[key] = cache
        weakref.finalize(obj, _CACHES.pop, key, None)
    return cache
