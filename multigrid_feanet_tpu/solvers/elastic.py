"""Multigrid solver for the vector elasticity operator (plane stress/strain).

Same geometric V-cycle as the scalar path — full-weighting restriction and
bilinear prolongation applied per displacement component — with a 2x2
block-Jacobi smoother.  Extends the framework to the reference's elasticity
ground-truth family (Archive/FEM/matlab_elasticity/).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multigrid_feanet_tpu.core import geometry
from multigrid_feanet_tpu.ops import elasticity as el
from multigrid_feanet_tpu.ops import stencil as scalar_stencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear


@struct.dataclass
class ElasticLevel:
    n: int = struct.field(pytree_node=False)
    h: float = struct.field(pytree_node=False)
    # static material parameters enable the gather-free bitplane apply
    E: float = struct.field(pytree_node=False, default=1.0)
    nu: float = struct.field(pytree_node=False, default=0.3)
    plane: str = struct.field(pytree_node=False, default="stress")
    a0: Optional[float] = struct.field(pytree_node=False, default=None)
    a1: Optional[float] = struct.field(pytree_node=False, default=None)
    table: jax.Array = None  # (16, 3, 3, 2, 2)
    pid: Optional[jax.Array] = None
    geo: jax.Array = None  # (H, W)
    dinv: jax.Array = None  # (H, W, 2, 2)

    def apply(self, u):
        if self.pid is not None and self.a0 is not None:
            return el.apply_elastic_bitplane(self.pid, u, self.E, self.nu,
                                             self.a0, self.a1, self.plane)
        return el.apply_elastic_stencil(self.table, self.pid, u)


def build_elastic_hierarchy(n: int, E: float = 1.0, nu: float = 0.3, size: float = 2.0,
                            inclusion=None, coefficients=(1.0, 1.0), plane: str = "stress",
                            num_levels: Optional[int] = None, dtype=jnp.float32):
    """Tuple of ElasticLevels, finest to coarsest (n halving to 2)."""
    L = int(np.log2(n)) if num_levels is None else num_levels
    levels = []
    for l in range(L):
        nl = n >> l
        h = size / nl
        table = el.make_elastic_stencil_table(E, nu, h, coefficients, plane, dtype)
        if inclusion is None:
            pid = None
        else:
            kind, center, radius = inclusion
            phase_fn = geometry.circle_phase if kind == "circle" else geometry.rect_phase
            pid = scalar_stencil.pattern_ids(jnp.asarray(phase_fn(size, nl, center, radius)))
        geo = geometry.interior_mask(nl + 1, dtype=dtype)
        dblocks = el.block_diagonal(table, pid, shape=(nl + 1, nl + 1))
        a0, a1 = (float(coefficients[0]), float(coefficients[1])) if pid is not None else (None, None)
        levels.append(
            ElasticLevel(n=nl, h=h, E=float(E), nu=float(nu), plane=plane, a0=a0, a1=a1,
                         table=table, pid=pid, geo=geo, dinv=el.invert_2x2(dblocks))
        )
    return tuple(levels)


def relax(level: ElasticLevel, u, f, num_sweeps: int, bc_value=0.0, omega=2.0 / 3.0):
    import jax.numpy as jnp

    for _ in range(num_sweeps):
        gm = level.geo[..., None, :, :]
        u = u * gm + bc_value * (1.0 - gm)
        r = f - level.apply(u)
        # Dinv @ r per node on component PLANES — einsum over a trailing
        # (..., H, W, 2) layout costs two lane-dim transposes per sweep
        rx, ry = r[..., 0, :, :], r[..., 1, :, :]
        upd = jnp.stack(
            [level.dinv[..., 0, 0] * rx + level.dinv[..., 0, 1] * ry,
             level.dinv[..., 1, 0] * rx + level.dinv[..., 1, 1] * ry],
            axis=-3)
        u = u + omega * upd
        u = u * gm + bc_value * (1.0 - gm)
    return u


def v_cycle(levels, u, f, nu1: int = 1, nu2: int = 1, bc_value=0.0, omega=2.0 / 3.0,
            level: int = 0):
    lv = levels[level]
    bc = bc_value if level == 0 else 0.0
    u = relax(lv, u, f, nu1, bc, omega)
    if level < len(levels) - 1:
        r = f - lv.apply(u)
        f_c = 4.0 * restrict_full_weighting(r)  # per-component (leading dims batched)
        u_c = jnp.zeros_like(f_c)
        u_c = v_cycle(levels, u_c, f_c, nu1, nu2, 0.0, omega, level + 1)
        u = u + prolong_bilinear(u_c, lv.geo)
    return relax(lv, u, f, nu2, bc, omega)


def solve(levels, f, u0=None, nu1: int = 2, nu2: int = 2, eps: float = 1e-8,
          max_cycles: int = 400, chunk: int = 8, omega=2.0 / 3.0):
    """Chunked-scan elastic V-cycle solve; returns (u, residual history)."""
    if u0 is None:
        u0 = jnp.zeros_like(f)

    @functools.partial(jax.jit, static_argnames=("k", "nu1", "nu2"))
    def run_chunk(u, f, k: int, nu1: int, nu2: int):
        def body(u, _):
            u = v_cycle(levels, u, f, nu1, nu2, omega=omega)
            res = el.elastic_interior_norm(f - levels[0].apply(u))
            return u, res

        return jax.lax.scan(body, u, None, length=k)

    u = u0
    hist = []
    done = 0
    while done < max_cycles:
        k = min(chunk, max_cycles - done)
        u, norms = run_chunk(u, f, k, nu1, nu2)
        norms = jax.device_get(norms)
        hist.append(norms)
        done += k
        if eps is not None and (norms <= eps).any():
            hist[-1] = norms[: int((norms <= eps).argmax()) + 1]
            break
        if not np.isfinite(norms[-1]):
            break
    return u, np.concatenate(hist)
