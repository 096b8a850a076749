"""Domain geometry: interior masks, Dirichlet boundary values, phase maps.

TPU-native equivalent of the reference's ``Geometry`` (reference:
FEANet/geo.py:5-34) and the inclusion-placement logic of
``MeshCenterInterface`` (reference: FEANet/mesh.py:62-76), vectorized —
no per-element python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def interior_mask(n_nodes: int, dtype=jnp.float32) -> jax.Array:
    """(H, W) mask: 1 at interior nodes, 0 on the square boundary.
    (reference: FEANet/geo.py:13-20)

    Built host-side: each eagerly-executed device op at a new shape costs an
    XLA compile, which dominates hierarchy construction on a remote TPU."""
    m = np.zeros((n_nodes, n_nodes), dtype=dtype)
    m[1:-1, 1:-1] = 1.0
    return jnp.asarray(m)


def reset_boundary(u: jax.Array, geo: jax.Array, bc_value: jax.Array | float = 0.0) -> jax.Array:
    """Re-impose Dirichlet values: u * geo + bc_value * (1 - geo).

    The reference computes ``u * geometry_idx + boundary_value`` (reference:
    FEANet/jacobi.py:27-29) where ``boundary_value`` is a field that is zero
    at interior nodes (reference: FEANet/geo.py:22-30); masking by (1 - geo)
    preserves that contract for scalar and interior-nonzero array inputs
    alike (a bare ``+ bc_value`` silently perturbs the interior for any
    nonzero scalar)."""
    return u * geo + bc_value * (1.0 - geo)


def node_coords(size: float, n_elems: int) -> tuple[np.ndarray, np.ndarray]:
    """Node coordinate grids (y[i], x[j]) on [-size/2, size/2], both ascending."""
    c = np.linspace(-size / 2.0, size / 2.0, n_elems + 1)
    return np.meshgrid(c, c, indexing="ij")


def element_centroids(size: float, n_elems: int) -> tuple[np.ndarray, np.ndarray]:
    """Element centroid coordinate grids (y[r], x[c]), ascending."""
    h = size / n_elems
    c = np.linspace(-size / 2.0 + h / 2.0, size / 2.0 - h / 2.0, n_elems)
    return np.meshgrid(c, c, indexing="ij")


def circle_phase(size: float, n_elems: int, center=(0.0, 0.0), radius: float = 0.5) -> np.ndarray:
    """(n, n) element phase map: 1 inside the circular inclusion.
    (reference: FEANet/mesh.py:62-68 place_circle; strict r^2 < radius^2)"""
    yy, xx = element_centroids(size, n_elems)
    r2 = (xx - center[0]) ** 2 + (yy - center[1]) ** 2
    return (r2 < radius**2).astype(np.int8)


def rect_phase(size: float, n_elems: int, center=(0.0, 0.0), r: float = 0.5) -> np.ndarray:
    """(n, n) element phase map: 1 inside the axis-aligned square inclusion.
    (reference: FEANet/mesh.py:70-76 place_rect)"""
    yy, xx = element_centroids(size, n_elems)
    return ((np.abs(xx - center[0]) < r) & (np.abs(yy - center[1]) < r)).astype(np.int8)
