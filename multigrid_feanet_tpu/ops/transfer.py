"""Inter-grid transfer operators: full-weighting restriction and bilinear
prolongation.

Semantics match the reference exactly:

- Restriction (reference: MM_Model_convergence.ipynb cell 3 ``Restrict``,
  FEANet/multigrid.py:115-122): crop the interior ring, stride-2 3x3
  full-weighting [[1,2,1],[2,4,2],[1,2,1]]/16, zero-pad the coarse boundary.
  The solver applies the h^2 scaling (x4) outside.
- Prolongation (reference: MM_Model_convergence.ipynb cell 3 ``Interpolate``):
  bilinear upsample (n_c+1) -> (2*n_c+1) with align_corners=True, i.e.
  injection at coincident nodes and midpoint averaging, followed by a
  Dirichlet boundary reset of the interpolated correction.

Implementation note (TPU): both operators are SEPARABLE and implemented as
two single-axis passes.  On TPU, a single-axis strided slice costs ~1 memory
pass, while 2-D strided slices/scatters (``x[::2, ::2]``,
``.at[::2, ::2].set``) and 1-channel ``lax.conv_general_dilated`` lower
catastrophically (measured 17-44 ms vs ~0.7 ms per pass at 4097^2 on v5e).
Keep every op single-axis."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fw_1d_last(x: jax.Array) -> jax.Array:
    """[1, 2, 1]/4 filter + stride-2 downsample along the last axis:
    out[..., J] = (x[..., 2J-1] + 2 x[..., 2J] + x[..., 2J+1]) / 4 for the
    coarse-interior J = 1..n/2-1."""
    n = x.shape[-1] - 1
    t = (x[..., :-2] + 2.0 * x[..., 1:-1] + x[..., 2:]) * 0.25  # t[k] ~ fine col k+1
    # fine col 2J for J=1.. -> t index 2J-1 = 1, 3, ..., n-3
    return t[..., 1 : n - 2 : 2]


def restrict_full_weighting(r: jax.Array) -> jax.Array:
    """(..., n+1, n+1) -> (..., n/2+1, n/2+1), zero boundary ring."""
    out = _fw_1d_last(r)
    out = jnp.swapaxes(_fw_1d_last(jnp.swapaxes(out, -1, -2)), -1, -2)
    pad = [(0, 0)] * (r.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(out, pad)


def _interleave_last(a: jax.Array, b: jax.Array) -> jax.Array:
    """out[..., 2j] = a[..., j], out[..., 2j+1] = b[..., j]; a and b have the
    same shape (..., m) -> (..., 2m)."""
    stacked = jnp.stack([a, b], axis=-1)  # (..., m, 2)
    return stacked.reshape(*a.shape[:-1], 2 * a.shape[-1])


def _up_1d_last(v: jax.Array) -> jax.Array:
    """Align-corners linear upsample along the last axis: (..., m) ->
    (..., 2m-1); even = injection, odd = midpoint."""
    mid = 0.5 * (v[..., :-1] + v[..., 1:])
    body = _interleave_last(v[..., :-1], mid)  # (..., 2m-2)
    return jnp.concatenate([body, v[..., -1:]], axis=-1)


def prolong_bilinear(v: jax.Array, geo_fine: jax.Array | None = None) -> jax.Array:
    """(..., m, m) -> (..., 2m-1, 2m-1) bilinear (align_corners) upsample.
    If ``geo_fine`` is given, the result is masked by it (Dirichlet reset of
    the interpolated correction with zero boundary values)."""
    out = _up_1d_last(v)
    out = jnp.swapaxes(_up_1d_last(jnp.swapaxes(out, -1, -2)), -1, -2)
    if geo_fine is not None:
        out = out * geo_fine
    return out
