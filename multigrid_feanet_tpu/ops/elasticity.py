"""Vector-valued (2-DOF/node) elasticity stencils: plane stress / plane
strain Q1 elements as spatially-varying 3x3 blocks of 2x2 couplings.

This extends the FEA-Net stencil representation to the reference's
"material response" family (reference oracles:
Archive/FEM/matlab_elasticity/Plane_Stress_modify.m:11-12 — E = 212e3,
nu = 0.288 plane stress — and solve_plane_strain.m).  The same 16-pattern
bi-material logic as the scalar Laplace operator applies, with per-element
scale factors multiplying the element stiffness (e.g. a stiff inclusion):

    table[pid]: (3, 3, 2, 2) — tap (dr, dc) couples displacement components
    (out_c, in_c) of a node to its (dr, dc) neighbour.

Application is a 36-tap FMA (2 out x 9 taps x 2 in); the weighted-Jacobi
smoother inverts the 2x2 diagonal blocks per node in closed form.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.ops import stencil as scalar_stencil

_GAUSS = 1.0 / np.sqrt(3.0)
_QPTS = [(-_GAUSS, -_GAUSS), (_GAUSS, -_GAUSS), (_GAUSS, _GAUSS), (-_GAUSS, _GAUSS)]


def elasticity_d_matrix(E: float, nu: float, plane: str = "stress") -> np.ndarray:
    if plane == "stress":
        c = E / (1.0 - nu * nu)
        return c * np.array([[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, (1.0 - nu) / 2.0]])
    if plane == "strain":
        c = E / ((1.0 + nu) * (1.0 - 2.0 * nu))
        return c * np.array(
            [[1.0 - nu, nu, 0.0], [nu, 1.0 - nu, 0.0], [0.0, 0.0, (1.0 - 2.0 * nu) / 2.0]]
        )
    raise ValueError(plane)


def element_stiffness_elastic(E: float, nu: float, h: float, plane: str = "stress") -> np.ndarray:
    """8x8 Q1 element stiffness (local nodes CCW from lower-left, DOFs
    (ux, uy) interleaved), 2x2 Gauss quadrature on an h x h square."""
    D = elasticity_d_matrix(E, nu, plane)
    ke = np.zeros((8, 8))
    for (xi, eta) in _QPTS:
        dN_dxi = 0.25 * np.array([-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)])
        dN_deta = 0.25 * np.array([-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)])
        dN_dx = dN_dxi * (2.0 / h)
        dN_dy = dN_deta * (2.0 / h)
        B = np.zeros((3, 8))
        for a in range(4):
            B[0, 2 * a] = dN_dx[a]
            B[1, 2 * a + 1] = dN_dy[a]
            B[2, 2 * a] = dN_dy[a]
            B[2, 2 * a + 1] = dN_dx[a]
        ke += B.T @ D @ B * (h / 2.0) ** 2
    return ke


def make_elastic_stencil_table(E: float, nu: float, h: float, coefficients=(1.0, 1.0),
                               plane: str = "stress", dtype=jnp.float32) -> jax.Array:
    """(16, 3, 3, 2, 2) bi-material block-stencil table.  ``coefficients``
    scale the element stiffness per phase (stiffness-ratio inclusions)."""
    ke = element_stiffness_elastic(E, nu, h, plane)
    a = np.asarray(coefficients, dtype=np.float64)
    table = np.zeros((16, 3, 3, 2, 2))
    # elements around the center node, pid bit order (SW, SE, NW, NE) as in
    # ops/stencil.py; local CCW node maps per element offset
    elem_offsets = ((-1, -1), (-1, 0), (0, -1), (0, 0))
    for pid in range(16):
        bits = [(pid >> k) & 1 for k in range(4)]
        for (dr, dc), bit in zip(elem_offsets, bits):
            loc = {
                (dr, dc): 0,
                (dr, dc + 1): 1,
                (dr + 1, dc + 1): 2,
                (dr + 1, dc): 3,
            }
            lp = loc[(0, 0)]
            for (qi, qj), lq in loc.items():
                blk = ke[2 * lp : 2 * lp + 2, 2 * lq : 2 * lq + 2]
                table[pid, qi + 1, qj + 1] += a[bit] * blk
    return jnp.asarray(table, dtype=dtype)


def pattern_block_table(table: jax.Array, pid: jax.Array | None):
    """Gather (H, W, 3, 3, 2, 2) per-node blocks (or broadcast pattern 0)."""
    if pid is None:
        return table[0]
    flat = table.reshape(table.shape[0], -1)
    return jnp.take(flat, pid.astype(jnp.int32), axis=0).reshape(*pid.shape, 3, 3, 2, 2)


def apply_elastic_stencil(table: jax.Array, pid: jax.Array | None, u: jax.Array) -> jax.Array:
    """A @ u for displacement fields u: (..., 2, H, W) -> (..., 2, H, W).

    Bitplane-free general form: 36 shifted FMAs with per-node gathered
    blocks when ``pid`` is given, constant blocks otherwise.
    """
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    if pid is None:
        coeff = None
    else:
        coeff = pattern_block_table(table, pid)  # (H, W, 3, 3, 2, 2)
    out = jnp.zeros_like(u)
    for dr in range(3):
        for dc in range(3):
            shifted = up[..., dr : dr + H, dc : dc + W]  # (..., 2, H, W)
            for oc in range(2):
                for ic in range(2):
                    if pid is None:
                        # table: (16, 3, 3, 2, 2) -> pattern 0, or already (3, 3, 2, 2)
                        w = table[0, dr, dc, oc, ic] if table.ndim == 5 else table[dr, dc, oc, ic]
                        term = w * shifted[..., ic, :, :]
                    else:
                        term = coeff[..., dr, dc, oc, ic] * shifted[..., ic, :, :]
                    out = out.at[..., oc, :, :].add(term)
    return out


def block_diagonal(table: jax.Array, pid: jax.Array | None, shape=None) -> jax.Array:
    """Per-node 2x2 diagonal blocks D_ii: (..., H, W, 2, 2)."""
    if pid is None:
        assert shape is not None
        blk = table[0, 1, 1] if table.ndim == 5 else table[1, 1]
        return jnp.broadcast_to(blk, (*shape, 2, 2))
    return pattern_block_table(table, pid)[..., 1, 1, :, :]


def invert_2x2(blocks: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 2, 2) blocks."""
    a = blocks[..., 0, 0]
    b = blocks[..., 0, 1]
    c = blocks[..., 1, 0]
    d = blocks[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )
    return inv / det[..., None, None]


def jacobi_step_elastic(table: jax.Array, pid: jax.Array | None, dinv: jax.Array,
                        geo: jax.Array, u: jax.Array, f: jax.Array, bc_value=0.0,
                        omega: float = 2.0 / 3.0) -> jax.Array:
    """Block-Jacobi sweep: u <- reset(u + omega * Dinv (f - A u)).

    ``dinv``: precomputed (H, W, 2, 2) inverse diagonal blocks; ``geo``:
    (H, W) interior mask applied to both components.
    """
    gm = geo[..., None, :, :]
    u = u * gm + bc_value * (1.0 - gm)
    r = f - apply_elastic_stencil(table, pid, u)  # (..., 2, H, W)
    # Dinv @ r per node: (H, W, 2, 2) x (..., 2, H, W)
    rr = jnp.moveaxis(r, -3, -1)  # (..., H, W, 2)
    upd = jnp.einsum("...hwij,...hwj->...hwi", dinv, rr)
    u = u + omega * jnp.moveaxis(upd, -1, -3)
    return u * gm + bc_value * (1.0 - gm)


def elastic_interior_norm(r: jax.Array) -> jax.Array:
    ri = r[..., 1:-1, 1:-1]
    return jnp.sqrt(jnp.sum(ri * ri, axis=(-3, -2, -1)))


def unit_block_taps(E: float, nu: float, plane: str = "stress"):
    """(S9_blocks, S4_blocks): homogeneous block stencil (3,3,2,2) and the
    four per-quadrant element contributions (4,3,3,2,2), both for a
    coefficient-1 element.  Basis of the bitplane apply (h-independent)."""
    ke = element_stiffness_elastic(E, nu, 1.0, plane)
    elem_offsets = ((-1, -1), (-1, 0), (0, -1), (0, 0))
    s4 = np.zeros((4, 3, 3, 2, 2))
    for e, (dr, dc) in enumerate(elem_offsets):
        loc = {(dr, dc): 0, (dr, dc + 1): 1, (dr + 1, dc + 1): 2, (dr + 1, dc): 3}
        lp = loc[(0, 0)]
        for (qi, qj), lq in loc.items():
            s4[e, qi + 1, qj + 1] += ke[2 * lp : 2 * lp + 2, 2 * lq : 2 * lq + 2]
    return s4.sum(axis=0), s4


def elastic_factor_constants(E: float, nu: float, plane: str = "stress"):
    """The five scalars that generate every 2x2 block of the Q1 elastic
    element stiffness (h-independent): within one element, the coupling of
    node p to node q is

        same node:        [[al, s be], [s be, al]]
        col (x) neighbor: [[ga, -s ep], [s ep, de]]
        row (y) neighbor: [[de,  s ep], [-s ep, ga]]
        diagonal:         [[ze, -s be], [-s be, ze]]

    with s = +1 when p sits on the element's main (SW/NE) diagonal and -1
    on the anti-diagonal.  Basis of the factored/Pallas elastic apply."""
    ke = element_stiffness_elastic(E, nu, 1.0, plane)
    return (ke[0, 0], ke[0, 1], ke[0, 2], ke[1, 2], ke[1, 3], ke[0, 4])


def elastic_q_corners(phase, shape, a0: float, a1: float, dtype):
    """Per-node element coefficients (Q_ne, Q_nw, Q_se, Q_sw), each (H, W).
    Fictitious out-of-domain elements carry a0 (phase 0), matching the
    bitplane form's s9-everywhere + masked-da semantics."""
    H, W = shape
    if phase is None:
        q = jnp.full((H + 1, W + 1), float(a0), dtype)
    else:
        q = float(a0) + (float(a1) - float(a0)) * jnp.pad(
            jnp.asarray(phase).astype(dtype), 1)
    return q[1:, 1:], q[1:, :-1], q[:-1, 1:], q[:-1, :-1]


def apply_elastic_factored(phase, u: jax.Array, E: float, nu: float,
                           a0: float, a1: float, plane: str = "stress") -> jax.Array:
    """A @ u via the element-factored 5-constant form — sum over the 4
    surrounding elements e of  Q_e * (Ke block row of node p) applied to the
    element's nodes, with Q_e = a0 + (a1-a0) * phase_e.  Identical math to
    ``apply_elastic_bitplane`` with ~1/3 the field passes; the window form
    inside the Pallas sweep kernel (ops/pallas_elastic.py).

    ``phase``: (n, n) element bitmap (None = homogeneous); ``u``: (..., 2,
    H, W) with component 0 = column (x) displacement."""
    al, be, ga, ep, de, ze = elastic_factor_constants(E, nu, plane)
    H, W = u.shape[-2:]
    Qne, Qnw, Qse, Qsw = elastic_q_corners(phase, (H, W), a0, a1, u.dtype)
    C4 = Qne + Qnw + Qse + Qsw
    C4s = Qne + Qsw - Qnw - Qse
    Qe, Qw = Qne + Qse, Qnw + Qsw
    Qn, Qs = Qne + Qnw, Qse + Qsw
    dE, dW = Qne - Qse, Qsw - Qnw
    dN, dS = Qne - Qnw, Qsw - Qse

    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])

    def sh(c, dr, dc):  # u component c shifted so entry (i,j) = u[c, i+dr, j+dc]
        return up[..., c, 1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]

    out = []
    for c in range(2):  # out component: 0 = x (cols), 1 = y (rows)
        uc, vo = (0, 1) if c == 0 else (1, 0)  # same-comp, cross-comp
        sg = 1.0 if c == 0 else -1.0  # cross ep sign flips between rows
        g_ew, g_ns = (ga, de) if c == 0 else (de, ga)
        o = (al * C4 * sh(uc, 0, 0)
             + g_ew * (Qe * sh(uc, 0, 1) + Qw * sh(uc, 0, -1))
             + g_ns * (Qn * sh(uc, 1, 0) + Qs * sh(uc, -1, 0))
             + ze * (Qne * sh(uc, 1, 1) + Qnw * sh(uc, 1, -1)
                     + Qse * sh(uc, -1, 1) + Qsw * sh(uc, -1, -1))
             + be * C4s * sh(vo, 0, 0)
             - sg * ep * (dE * sh(vo, 0, 1) + dW * sh(vo, 0, -1))
             + sg * ep * (dN * sh(vo, 1, 0) + dS * sh(vo, -1, 0))
             - be * (Qne * sh(vo, 1, 1) - Qnw * sh(vo, 1, -1)
                     - Qse * sh(vo, -1, 1) + Qsw * sh(vo, -1, -1)))
        out.append(o)
    return jnp.stack(out, axis=-3)


def apply_elastic_bitplane(pid: jax.Array, u: jax.Array, E: float, nu: float,
                           a0: float, a1: float, plane: str = "stress") -> jax.Array:
    """A @ u for the two-phase elastic operator with no gathers:

        A u = a0 * S9b(u) + (a1 - a0) * sum_e bit_e(pid) .* S4b_e(u)

    the vector analogue of ops/stencil.apply_stencil_bitplane — the fast
    form on TPU (per-node block gathers do not vectorize)."""
    s9, s4 = unit_block_taps(E, nu, plane)
    H, W = u.shape[-2:]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    da = float(a1) - float(a0)

    def block_taps(table_np, scale_plane=None):
        # accumulate per output component and stack ONCE — .at[].add into a
        # (2, H, W) buffer per tap lowers to dozens of dynamic-update-slices
        # on TPU (measured 34 ms/sweep at 2049^2 vs ~2 ms for this form)
        comps = []
        for oc in range(2):
            acc_c = None
            for dr in range(3):
                for dc in range(3):
                    blk = table_np[dr, dc]
                    if not np.any(blk[oc]):
                        continue
                    shifted = up[..., dr : dr + H, dc : dc + W]  # (...,2,H,W)
                    term = (blk[oc, 0] * shifted[..., 0, :, :]
                            + blk[oc, 1] * shifted[..., 1, :, :])
                    acc_c = term if acc_c is None else acc_c + term
            if scale_plane is not None:
                acc_c = acc_c * scale_plane
            comps.append(acc_c)
        return jnp.stack(comps, axis=-3)

    acc = float(a0) * block_taps(s9)
    p = pid.astype(jnp.int32)
    for e in range(4):
        bit = ((p >> e) & 1).astype(u.dtype)
        acc = acc + da * block_taps(s4[e], scale_plane=bit)
    return acc
