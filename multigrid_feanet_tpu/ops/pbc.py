"""Periodic-boundary-condition operators and Jacobi solver.

Reference semantics (FEANet/jacobi.py:50-97 ``JacobiBlockPBC``; validated
against Archive/FEA-Net/MM-FEANet/FEANet-periodic.ipynb): fields live on an
(n+1)^2 grid whose last row/column duplicate the first (wrap copy); the
operator is applied on a circularly padded (n+3)^2 field and cropped.

TPU-native form: all compute happens on the *unique* n x n torus grid with
`jnp.pad(mode='wrap')` ghosts — one representation, no crop/copy dance; the
(n+1)^2 wrapped view exists only at the API boundary for reference parity
(:func:`to_wrapped` / :func:`from_wrapped`).

The periodic problem is singular (constant nullspace); the reference's
compatibility shift f <- f - h^2 * sum(f_unique) (MM-FEANet-learnP-pbc.ipynb
cell 5) is :func:`compatibility_shift`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import stencil


def from_wrapped(u: jax.Array) -> jax.Array:
    """(n+1, n+1) wrapped field -> (n, n) unique torus grid."""
    return u[..., :-1, :-1]


def to_wrapped(u_unique: jax.Array) -> jax.Array:
    """(n, n) unique torus grid -> (n+1, n+1) wrapped field
    (reference: JacobiBlockPBC.reset_boundary, FEANet/jacobi.py:79-85)."""
    pad = [(0, 0)] * (u_unique.ndim - 2) + [(0, 1), (0, 1)]
    return jnp.pad(u_unique, pad, mode="wrap")


def _taps_periodic(u: jax.Array, kernel: jax.Array) -> jax.Array:
    """9-tap stencil with circular wrap on (..., n, n)."""
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)], mode="wrap")
    out = None
    for a in range(3):
        for b in range(3):
            t = kernel[a, b] * up[..., a : a + H, b : b + W]
            out = t if out is None else out + t
    return out


def apply_stencil_periodic(table: jax.Array, u_unique: jax.Array) -> jax.Array:
    """A @ u on the torus (homogeneous operator — the reference's PBC path
    supports homogeneous problems only, FEANet/jacobi.py:51)."""
    return _taps_periodic(u_unique, table)


def apply_mass_periodic(f_unique: jax.Array, h: float) -> jax.Array:
    """Consistent load vector with periodic wrap (reference: FNet applied to
    the circularly padded field, FEANet-periodic.ipynb cell 2)."""
    k = (h * h) * jnp.asarray(stencil.MASS_KERNEL, dtype=f_unique.dtype)
    return _taps_periodic(f_unique, k)


def compatibility_shift(f_unique: jax.Array, h: float) -> jax.Array:
    """f <- f - h^2 * sum(f) : project the RHS onto the compatible range of
    the singular periodic operator.  (reference: MM-FEANet-learnP-pbc.ipynb
    cell 5; sum over the unique grid)"""
    return f_unique - h * h * jnp.sum(f_unique, axis=(-2, -1), keepdims=True)


def pbc_interior_norm(r_unique: jax.Array) -> jax.Array:
    """The reference's residual norm crops [1:-1, 1:-1] of the (n+3)^2 padded
    field — i.e. the FULL (n+1)^2 wrapped grid, duplicate last row/column
    included (FEANet-periodic.ipynb cell 5)."""
    rw = to_wrapped(r_unique)
    return jnp.sqrt(jnp.sum(rw * rw, axis=(-2, -1)))


def jacobi_step_pbc(table: jax.Array, u_unique: jax.Array, f_conv: jax.Array,
                    omega: float = 2.0 / 3.0) -> jax.Array:
    """u <- u + omega / diag * (f - A u) on the torus.
    (reference: JacobiBlockPBC.jacobi_convolution, FEANet/jacobi.py:87-97)"""
    d = table[1, 1]
    r = f_conv - apply_stencil_periodic(table, u_unique)
    return u_unique + (omega / d) * r


def solve_jacobi_pbc(table: jax.Array, f_conv: jax.Array, u0: jax.Array | None = None,
                     eps: float = 5e-6, max_iters: int = 10_000, chunk: int = 256,
                     omega: float = 2.0 / 3.0):
    """Chunked-scan Jacobi solve on the torus; history convention matches the
    reference's driver (residual recorded after each sweep)."""
    import functools

    if u0 is None:
        u0 = jnp.zeros_like(f_conv)

    @functools.partial(jax.jit, static_argnames=("k", "omega"))
    def _chunk(u, f, k: int, omega: float):
        def body(u, _):
            r = f - apply_stencil_periodic(table, u)
            u_new = u + (omega / table[1, 1]) * r
            return u_new, pbc_interior_norm(r)

        u, pre = jax.lax.scan(body, u, None, length=k)
        final = pbc_interior_norm(f - apply_stencil_periodic(table, u))
        return u, jnp.concatenate([pre[1:], final[None]])

    u = u0
    history = []
    done = 0
    while done < max_iters:
        k = min(chunk, max_iters - done)
        u, norms = _chunk(u, f_conv, k, omega)
        norms = jax.device_get(norms)
        history.append(norms)
        done += k
        if eps is not None:
            hit = norms <= eps
            if hit.any():
                history[-1] = norms[: int(hit.argmax()) + 1]
                break
        if not np.isfinite(norms[-1]):
            break
    return u, np.concatenate(history)
