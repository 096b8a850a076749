"""Weighted-Jacobi smoother and convergence-driven solve loops.

The smoother math matches the reference's ``JacobiBlock.jacobi_convolution``
(reference: FEANet/jacobi.py:39-47):

    u <- reset(u);  u <- reset(u + omega / diag(A) * (f - A u))

but the solve driver is TPU-native: iterations run on-device inside
``lax.scan`` chunks with residual norms carried as device arrays; the host
only syncs once per chunk to test convergence (the reference syncs with
``.item()`` every iteration, reference: MM_Model_convergence.ipynb cell 3
``solve_jacobi``).  One stencil application per iteration serves both the
update and the recorded residual (the reference recomputes A u a second time
per iteration purely for the residual check).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Level

DEFAULT_OMEGA = 2.0 / 3.0


def interior_norm(r: jax.Array) -> jax.Array:
    """L2 norm of the interior residual (boundary ring excluded), matching the
    reference's ``torch.norm(residual[:, :, 1:-1, 1:-1])``."""
    ri = r[..., 1:-1, 1:-1]
    return jnp.sqrt(jnp.sum(ri * ri, axis=(-2, -1)))


def jacobi_step(level: Level, u: jax.Array, f: jax.Array, bc_value=0.0,
                omega: float = DEFAULT_OMEGA) -> jax.Array:
    """One weighted-Jacobi sweep with Dirichlet reset."""
    u = reset_boundary(u, level.geo, bc_value)
    r = f - level.apply(u)
    u = u + (omega / level.diag) * r
    return reset_boundary(u, level.geo, bc_value)


def relax(level: Level, u: jax.Array, f: jax.Array, num_sweeps: int, bc_value=0.0,
          omega: float = DEFAULT_OMEGA) -> jax.Array:
    """``num_sweeps`` (static) Jacobi sweeps, unrolled for XLA fusion."""
    for _ in range(num_sweeps):
        u = jacobi_step(level, u, f, bc_value, omega)
    return u


@partial(jax.jit, static_argnames=("chunk", "omega"))
def _jacobi_chunk(level: Level, u, f, bc_value, chunk: int, omega: float):
    """Run ``chunk`` sweeps; return final u and the post-sweep residual norms.

    Inside the scan, the residual computed for sweep k's update equals the
    post-update residual of sweep k-1, so each sweep costs a single stencil
    apply; one extra apply after the scan yields the final norm.
    """

    def body(u, _):
        ur = reset_boundary(u, level.geo, bc_value)
        r = f - level.apply(ur)
        u_new = reset_boundary(ur + (omega / level.diag) * r, level.geo, bc_value)
        return u_new, interior_norm(r)

    u, pre_norms = jax.lax.scan(body, u, None, length=chunk)
    final = interior_norm(f - level.apply(reset_boundary(u, level.geo, bc_value)))
    post_norms = jnp.concatenate([pre_norms[1:], final[None]])
    return u, post_norms


def solve_jacobi(level: Level, f: jax.Array, u0: jax.Array | None = None, bc_value=0.0,
                 eps: float | None = 1e-5, max_iters: int = 200_000, chunk: int = 256,
                 omega: float = DEFAULT_OMEGA):
    """Iterate to ``eps`` (absolute interior L2 residual) or ``max_iters``.

    Returns ``(u, res_history)`` where ``res_history[k]`` is the residual norm
    after k+1 sweeps — same convention as the reference driver loops.
    """
    H = level.n_nodes
    if u0 is None:
        u0 = jnp.zeros((H, H), dtype=f.dtype)
    u = u0
    bc_value = jnp.asarray(bc_value, dtype=f.dtype)
    history = []
    done = 0
    while done < max_iters:
        k = min(chunk, max_iters - done)
        u, norms = _jacobi_chunk(level, u, f, bc_value, k, omega)
        norms = jax.device_get(norms)
        history.append(norms)
        done += k
        if eps is not None:
            hit = norms <= eps
            if hit.any():
                stop = int(hit.argmax()) + 1
                history[-1] = norms[:stop]
                break
        if not jnp.isfinite(norms[-1]):
            break
    import numpy as np

    return u, np.concatenate(history)
