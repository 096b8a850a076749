"""Inter-grid transfer operators: full-weighting restriction and bilinear
prolongation, as pure strided-slice arithmetic (no convolution framework ops
needed — XLA fuses these into a handful of VPU FMAs).

Semantics match the reference exactly:

- Restriction (reference: MM_Model_convergence.ipynb cell 3 ``Restrict``,
  FEANet/multigrid.py:115-122): crop the interior ring, stride-2 3x3
  full-weighting [[1,2,1],[2,4,2],[1,2,1]]/16, zero-pad the coarse boundary.
  The solver applies the h^2 scaling (x4) outside.
- Prolongation (reference: MM_Model_convergence.ipynb cell 3 ``Interpolate``):
  bilinear upsample (n_c+1) -> (2*n_c+1) with align_corners=True, i.e.
  injection at coincident nodes and midpoint averaging, followed by a
  Dirichlet boundary reset of the interpolated correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def restrict_full_weighting(r: jax.Array) -> jax.Array:
    """(..., n+1, n+1) -> (..., n/2+1, n/2+1), zero boundary ring.

    Separable [1,2,1]/4 along each axis, sampled at even fine nodes; only
    coarse-interior outputs are computed, the coarse boundary ring is zero —
    identical to crop + stride-2 conv + zero-pad in the reference.
    """
    n = r.shape[-1] - 1
    # along last axis: out[..., J] = (r[..., 2J-1] + 2 r[..., 2J] + r[..., 2J+1]) / 4
    rx = (r[..., 1 : n - 2 : 2] + 2.0 * r[..., 2 : n - 1 : 2] + r[..., 3:n:2]) / 4.0
    ry = (
        rx[..., 1 : n - 2 : 2, :] + 2.0 * rx[..., 2 : n - 1 : 2, :] + rx[..., 3:n:2, :]
    ) / 4.0
    pad = [(0, 0)] * (r.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(ry, pad)


def prolong_bilinear(v: jax.Array, geo_fine: jax.Array | None = None) -> jax.Array:
    """(..., m, m) -> (..., 2m-1, 2m-1) bilinear (align_corners) upsample.

    Coincident nodes are injected, odd nodes are neighbour midpoints.  If
    ``geo_fine`` is given, the result is masked by it (Dirichlet reset of the
    interpolated correction with zero boundary values, as in the reference's
    ``Interpolate`` -> ``reset_boundary``).
    """
    m = v.shape[-1]
    out_shape = v.shape[:-2] + (2 * m - 1, 2 * m - 1)
    out = jnp.zeros(out_shape, dtype=v.dtype)
    out = out.at[..., ::2, ::2].set(v)
    out = out.at[..., 1::2, ::2].set(0.5 * (v[..., :-1, :] + v[..., 1:, :]))
    out = out.at[..., ::2, 1::2].set(0.5 * (v[..., :, :-1] + v[..., :, 1:]))
    out = out.at[..., 1::2, 1::2].set(
        0.25 * (v[..., :-1, :-1] + v[..., :-1, 1:] + v[..., 1:, :-1] + v[..., 1:, 1:])
    )
    if geo_fine is not None:
        out = out * geo_fine
    return out
