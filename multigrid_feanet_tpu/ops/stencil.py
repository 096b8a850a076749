"""Stencil assembly and application for structured-quad Q1 FEM operators.

The assembled stiffness matrix A of a bilinear-quad FEM discretization on a
uniform n x n element grid is, row-wise, a spatially varying 3x3 stencil: the
row of node p couples only the 8 neighbours, with coefficients that are sums
of element-stiffness (Ke) entries of the (up to) 4 elements surrounding p,
each scaled by that element's material coefficient.

With two material phases there are 2^4 = 16 possible surrounding-element
phase patterns, so A is fully described by

  * a ``(16, 3, 3)`` stencil *table* (one 3x3 kernel per pattern), and
  * a per-node int8 *pattern-id* field ``pid`` in ``[0, 16)``.

This mirrors the math of the reference's ``MeshCenterInterface.generate_kernel``
(reference: FEANet/mesh.py:103-117) and ``KNet`` 16-channel masked convolution
(reference: FEANet/model.py:8-47), but the application here is a gather of the
16-entry table followed by a 9-tap fused multiply-add over shifted views —
~9 bytes of HBM traffic per node (u read + int8 pid read + out write) instead
of the reference's 16-channel conv pair.

Pattern-id encoding
-------------------
Grid indices are (row i, col j), row-major, both ascending.  Element ``(r, c)``
spans nodes ``r..r+1`` x ``c..c+1``.  The four elements around node ``(i, j)``
are, in bit order::

    bit 0: element (i-1, j-1)   "SW"
    bit 1: element (i-1, j  )   "SE"
    bit 2: element (i,   j-1)   "NW"
    bit 3: element (i,   j  )   "NE"

``pid = b0 + 2*b1 + 4*b2 + 8*b3``.  This differs from the reference's
arbitrary ``ref_pattern_dict`` ordering (reference: FEANet/mesh.py:23-26);
:func:`reference_pattern_permutation` maps between the two for checkpoint
import / parity tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Reference element stiffness matrix for the Q1 Laplace operator on a square
# element, local nodes ordered counter-clockwise.  Diagonal 2/3, edge-adjacent
# -1/6, diagonally-opposite -1/3 (independent of element size h in 2D).
# (reference: FEANet/mesh.py:28-31)
KE = -(1.0 / 6.0) * np.array(
    [
        [-4.0, 1.0, 2.0, 1.0],
        [1.0, -4.0, 1.0, 2.0],
        [2.0, 1.0, -4.0, 1.0],
        [1.0, 2.0, 1.0, -4.0],
    ],
    dtype=np.float64,
)

# Q1 consistent-mass-matrix row as a 3x3 kernel (times h^2), used to turn a
# raw source field f into the FEM load vector M_f @ f.
# (reference: FEANet/model.py:54-56)
MASS_KERNEL = np.array(
    [[1.0, 4.0, 1.0], [4.0, 16.0, 4.0], [1.0, 4.0, 1.0]], dtype=np.float64
) / 36.0

# Offsets (dr, dc) of the four elements around a node, in pid bit order.
_ELEM_OFFSETS = ((-1, -1), (-1, 0), (0, -1), (0, 0))

# Unit-Ke tap tables for the *bitplane* operator form.  The per-node stencil
# is affine in the 4 surrounding element-phase bits:
#     A u = a0 * S9(u) + (a1 - a0) * sum_e bit_e(pid) .* S4_e(u)
# where S4_e maps tap offset (dr, dc) -> contribution of a coefficient-1
# element in quadrant e (bit order SW, SE, NW, NE) and S9 = sum_e S4_e is the
# homogeneous 9-point FEM Laplace stencil.  This evaluates the bi-material
# operator in 25 FMA taps with no gather — the production form on TPU (both
# here and in the Pallas kernel, ops/pallas_stencil.py).
_C, _E, _D = 2.0 / 3.0, -1.0 / 6.0, -1.0 / 3.0
UNIT_S4 = (
    {(0, 0): _C, (-1, 0): _E, (0, -1): _E, (-1, -1): _D},  # SW
    {(0, 0): _C, (-1, 0): _E, (0, 1): _E, (-1, 1): _D},  # SE
    {(0, 0): _C, (1, 0): _E, (0, -1): _E, (1, -1): _D},  # NW
    {(0, 0): _C, (1, 0): _E, (0, 1): _E, (1, 1): _D},  # NE
)
UNIT_S9 = {}
for _t in UNIT_S4:
    for _k, _v in _t.items():
        UNIT_S9[_k] = UNIT_S9.get(_k, 0.0) + _v


def _element_local_nodes(r: int, c: int):
    """Local CCW node ordering of element (r, c): node (i, j) -> local index."""
    return {
        (r, c): 0,
        (r, c + 1): 1,
        (r + 1, c + 1): 2,
        (r + 1, c): 3,
    }


def make_stencil_table(coefficients=(1.0, 20.0), dtype=jnp.float32) -> jax.Array:
    """Assemble the (16, 3, 3) stencil table for two-phase coefficients.

    Entry ``table[pid, 1+dr, 1+dc]`` is the coupling of a node to its
    ``(dr, dc)`` neighbour when the 4 surrounding elements have the phase
    pattern encoded in ``pid``:

        A[p, q] = sum over elements e containing both p and q of
                  a[phase(e)] * Ke[loc_e(p), loc_e(q)]

    Equivalent to the reference's explicit 9-entry formulas
    (reference: FEANet/mesh.py:103-117) but derived by direct enumeration,
    validated in tests against a dense quadrature-assembled FEM matrix.
    """
    return jnp.asarray(make_stencil_table_np(coefficients), dtype=dtype)


def make_stencil_table_np(coefficients=(1.0, 20.0)) -> np.ndarray:
    """Host-side (16, 3, 3) f64 stencil table (see ``make_stencil_table``)."""
    a = np.asarray(coefficients, dtype=np.float64)
    table = np.zeros((16, 3, 3), dtype=np.float64)
    for pid in range(16):
        bits = [(pid >> k) & 1 for k in range(4)]
        for (dr, dc), phase_bit in zip(_ELEM_OFFSETS, bits):
            loc = _element_local_nodes(dr, dc)
            lp = loc[(0, 0)]
            for (qi, qj), lq in loc.items():
                table[pid, qi + 1, qj + 1] += a[phase_bit] * KE[lp, lq]
    return table


def make_homogeneous_stencil(dtype=jnp.float32) -> jax.Array:
    """The single 3x3 stencil of the homogeneous (single-phase, a=1) Laplace
    operator: the classical FEM 9-point stencil 1/3 * [[-1,-1,-1],[-1,8,-1],[-1,-1,-1]].
    (reference: FEANet/mesh.py:175-189 via MeshSquare)"""
    return make_stencil_table((1.0, 1.0), dtype=dtype)[0]


def reference_pattern_permutation() -> np.ndarray:
    """perm[k] = our pid for the reference's pattern key k.

    The reference enumerates patterns as ``[e1, e2, e3, e4]`` where, in our
    (row i up, col j right) index space, e1=(i-1,j), e2=(i-1,j-1), e3=(i,j-1),
    e4=(i,j)  (derived from reference FEANet/mesh.py:44-47 axis orientation —
    x descending with j — and :78-93 quadrant tests).  Our bits are
    (SW, SE, NW, NE) = (e2, e1, e3, e4).
    """
    ref_patterns = {
        0: [0, 0, 0, 0], 1: [1, 1, 1, 1], 2: [0, 0, 0, 1], 3: [0, 0, 1, 0],
        4: [1, 0, 0, 0], 5: [0, 1, 0, 0], 6: [0, 0, 1, 1], 7: [1, 1, 0, 0],
        8: [0, 1, 1, 0], 9: [1, 0, 0, 1], 10: [0, 1, 0, 1], 11: [1, 0, 1, 0],
        12: [1, 1, 1, 0], 13: [1, 1, 0, 1], 14: [0, 1, 1, 1], 15: [1, 0, 1, 1],
    }
    perm = np.zeros(16, dtype=np.int32)
    for k, (e1, e2, e3, e4) in ref_patterns.items():
        perm[k] = e2 + 2 * e1 + 4 * e3 + 8 * e4
    return perm


def pattern_ids(phase: jax.Array) -> jax.Array:
    """Per-node pattern-id field from a per-element phase bitmap.

    ``phase``: (n, n) int/bool element phases. Returns (n+1, n+1) int8 pids.
    Elements outside the domain count as phase 0 (boundary rows are masked by
    the Dirichlet reset anyway; the reference likewise leaves boundary-node
    patterns at 0, FEANet/mesh.py:80-82).

    Vectorized replacement for the reference's per-node python loop
    (reference: FEANet/mesh.py:78-93): the 4-bit pattern of node (i, j) is
    just the 2x2 window of the zero-padded phase map.
    """
    p = jnp.pad(phase.astype(jnp.int8), 1)  # (n+2, n+2)
    sw = p[:-1, :-1]
    se = p[:-1, 1:]
    nw = p[1:, :-1]
    ne = p[1:, 1:]
    return (sw + 2 * se + 4 * nw + 8 * ne).astype(jnp.int8)


def pattern_ids_np(phase: np.ndarray) -> np.ndarray:
    """Host-side ``pattern_ids`` (same bit layout) for hierarchy
    construction: eager device ops pay one XLA compile per level shape on a
    remote TPU, so level fields are built in numpy and shipped once."""
    p = np.pad(np.asarray(phase).astype(np.int8), 1)
    return (p[:-1, :-1] + 2 * p[:-1, 1:] + 4 * p[1:, :-1]
            + 8 * p[1:, 1:]).astype(np.int8)


def gather_coefficients(table: jax.Array, pid: jax.Array) -> jax.Array:
    """Gather per-node 3x3 stencils: (16,3,3) table + (H,W) pid -> (H,W,3,3)."""
    return jnp.take(table.reshape(table.shape[0], 9), pid.astype(jnp.int32), axis=0).reshape(
        *pid.shape, 3, 3
    )


def apply_stencil(table: jax.Array, pid: jax.Array | None, u: jax.Array) -> jax.Array:
    """A @ u as a 9-tap spatially-varying stencil.

    ``u``: (..., H, W);  ``pid``: (H, W) int8 or None for a homogeneous
    operator (then ``table`` is a single (3, 3) stencil).  Boundary nodes use
    zero-padded neighbours, matching the reference's padding=1 convolution
    (reference: FEANet/model.py:15-16) — those rows are never used, since
    Dirichlet resets overwrite them and residual norms exclude them.
    """
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    if pid is None:
        coeff = None
    else:
        coeff = gather_coefficients(table, pid)  # (H, W, 3, 3)
    out = jnp.zeros_like(u)
    for dr in range(3):
        for dc in range(3):
            shifted = up[..., dr : dr + H, dc : dc + W]
            if pid is None:
                out = out + table[dr, dc] * shifted
            else:
                out = out + coeff[..., dr, dc] * shifted
    return out


def _taps(u: jax.Array, taps: dict) -> jax.Array:
    """Apply a {(dr, dc): weight} stencil to (..., H, W) with zero ghosts."""
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    out = None
    for (dr, dc), w in taps.items():
        t = w * up[..., 1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]
        out = t if out is None else out + t
    return out


def apply_stencil_bitplane(pid: jax.Array, u: jax.Array, a0: float, a1: float) -> jax.Array:
    """A @ u for the two-phase operator in bitplane form (no gather).

    Numerically identical to :func:`apply_stencil` with
    ``make_stencil_table((a0, a1))`` but lowered to pure shifts/FMAs —
    the fast XLA form on TPU (gathers of per-node tables do not vectorize).
    """
    da = float(a1) - float(a0)
    acc = float(a0) * _taps(u, UNIT_S9)
    p = pid.astype(jnp.int32)
    for e, taps in enumerate(UNIT_S4):
        bit = ((p >> e) & 1).astype(u.dtype)
        acc = acc + (da * bit) * _taps(u, taps)
    return acc


def apply_stencil_bitplane_affine(pid: jax.Array, u: jax.Array,
                                  base: jax.Array, bit_scale: float) -> jax.Array:
    """A @ u for any operator AFFINE in the 4 element-phase bits:

        A u = base * u  (a fixed 3x3 stencil)  +  bit_scale * sum_e bit_e(pid) S4_e(u)

    Generalizes :func:`apply_stencil_bitplane` (base = a0*S9, bit_scale =
    a1-a0) to e.g. the theta-scheme heat system M + theta*dt*K, whose mass
    part is phase-independent: base = h^2*MASS + theta*dt*a0*S9, bit_scale
    = theta*dt*(a1-a0).  Pure shifts/FMAs, no per-node gather."""
    acc = apply_stencil(base.astype(u.dtype), None, u)
    p = pid.astype(jnp.int32)
    for e, taps in enumerate(UNIT_S4):
        bit = ((p >> e) & 1).astype(u.dtype)
        acc = acc + (bit_scale * bit) * _taps(u, taps)
    return acc


def stencil_diagonal(table: jax.Array, pid: jax.Array | None, shape=None) -> jax.Array:
    """diag(A) as a field — the center entry of each node's stencil.
    (reference: FEANet/jacobi.py:31-37)"""
    if pid is None:
        assert shape is not None
        return jnp.full(shape, table[1, 1], dtype=table.dtype)
    return jnp.take(table[:, 1, 1], pid.astype(jnp.int32))


def apply_mass(f: jax.Array, h: float) -> jax.Array:
    """Consistent load vector M_f @ f as a fixed 3x3 stencil (h^2-scaled).
    (reference: FNet, FEANet/model.py:49-61)"""
    k = (h * h) * jnp.asarray(MASS_KERNEL, dtype=f.dtype)
    return apply_stencil(k, None, f)


def split_by_pattern(u: jax.Array, pid: jax.Array, num_patterns: int = 16) -> jax.Array:
    """One-hot split of a field by pattern id: (..., H, W) -> (..., P, H, W).

    Channel p holds ``u`` where ``pid == p`` and 0 elsewhere.  This is the
    16-channel representation the learned inter-grid operators consume
    (reference: KNet.split_x, FEANet/model.py:37-47 — there the identity conv
    net1 followed by the global_pattern mask).
    """
    onehot = jax.nn.one_hot(pid.astype(jnp.int32), num_patterns, dtype=u.dtype, axis=0)
    return u[..., None, :, :] * onehot


def apply_stencil_conv(table: jax.Array, pid: jax.Array, u: jax.Array) -> jax.Array:
    """Reference-parity path: A @ u via the 16-channel masked convolution,
    expressed with lax.conv_general_dilated.  Used only for cross-validation
    against :func:`apply_stencil`; the gather form is the production path.
    (reference: KNet.forward, FEANet/model.py:22-30)
    """
    squeeze = u.ndim == 2
    if squeeze:
        u = u[None]
    batch_shape = u.shape[:-2]
    H, W = u.shape[-2:]
    x = u.reshape(-1, 1, H, W)
    split = split_by_pattern(x[:, 0], pid)  # (N, 16, H, W)
    # The masked-conv form selects the kernel by the *input* node's pattern
    # (the mask hits u before the 16->1 conv), so each channel kernel is the
    # 180-degree rotation of that pattern's row stencil; the two forms agree
    # because A is symmetric.  The reference's kernel_dict stores exactly
    # these rotated stencils (FEANet/mesh.py:103-117).
    rot = table[:, ::-1, ::-1]
    rhs = rot.reshape(16, 1, 3, 3).transpose(1, 0, 2, 3)  # (O=1, I=16, 3, 3)
    out = jax.lax.conv_general_dilated(
        split, rhs.astype(u.dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out.reshape(*batch_shape, H, W)
    return out[0] if squeeze else out
