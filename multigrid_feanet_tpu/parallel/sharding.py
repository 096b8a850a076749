"""Distributed execution: device mesh, spatial/batch sharding, distributed
V-cycle and training step.

The reference has zero distributed code (grep-verified: no torch.distributed/
NCCL/MPI anywhere); its only parallel axis is the batch dimension.  Here the
framework is designed mesh-first:

- mesh axes ``("dp", "x", "y")``: data-parallel batch x 2D spatial grid
  partition;
- stencil applications are expressed as shifts/slices with sharding
  constraints, so XLA GSPMD inserts the 1-deep halo exchanges
  (collective-permutes over ICI) automatically — the TPU-native equivalent
  of hand-written NCCL halo code;
- residual norms become psums of shard-local partials (GSPMD inserts them
  from the sharded reductions);
- coarse multigrid levels below ``replicate_below`` nodes are replicated —
  the agglomeration policy: once a level is smaller than a tile, every
  device redundantly owns it and no collectives ride the coarse solve.

Sharded buffers are zero-padded to mesh-divisible (and TPU-tile-aligned)
shapes; the (n+1)^2 logical grid lives in the top-left corner.  Only padded
shapes carry explicit sharding annotations — odd-shaped intermediates inside
jit are propagated by GSPMD, which has no divisibility requirement for them.

On a single host this is exercised with a virtual CPU mesh
(``xla_force_host_platform_device_count``), the fake-pod pattern; the same
program runs unchanged on a real pod slice over ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_feanet_tpu.core.problem import GridHierarchy, Problem
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.transfer import restrict_full_weighting, prolong_bilinear
from multigrid_feanet_tpu.solvers import jacobi as jac
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: jax.distributed.initialize (idempotent).

    On a real multi-host pod slice each host calls this once before any
    backend use; with no arguments JAX auto-detects the cluster environment
    (TPU metadata / SLURM / env vars).  Single-process (including the CPU
    fake-pod and the single-chip tunnel) is a no-op.  Returns the process
    count."""
    if jax.process_count() > 1:
        return jax.process_count()  # already initialized
    if coordinator_address is None and num_processes in (None, 1):
        return jax.process_count()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Factorize devices into a ("dp", "x", "y") mesh.

    Multi-host: when ``jax.process_count() > 1``, the mesh is laid out
    DCN-outer / ICI-inner — the "dp" axis spans hosts (its collectives are
    the gradient/batch reductions that tolerate DCN latency) while the
    spatial ("x", "y") axes stay within each host's ICI domain, so every
    halo exchange rides ICI (jax.experimental.mesh_utils.
    create_hybrid_device_mesh).  Single-host: dp=1 and the most-square
    spatial split over local devices."""
    n_proc = jax.process_count()
    if n_proc > 1:
        from jax.experimental import mesh_utils

        per_host = len(jax.local_devices())
        if dp is None:
            dp = n_proc
        assert dp % n_proc == 0, (dp, n_proc)
        spatial = (n_proc * per_host) // dp
        sx = int(np.sqrt(spatial))
        while spatial % sx:
            sx -= 1
        sy = spatial // sx
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // n_proc, sx, sy),
            dcn_mesh_shape=(n_proc, 1, 1),
        )
        return Mesh(arr, ("dp", "x", "y"))
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = 1
    spatial = n // dp
    sx = int(np.sqrt(spatial))
    while spatial % sx:
        sx -= 1
    sy = spatial // sx
    arr = np.array(devices).reshape(dp, sx, sy)
    return Mesh(arr, ("dp", "x", "y"))


def constrain(mesh: Mesh, x: jax.Array, spec: P) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class DistributedHierarchy:
    """GridHierarchy + per-level padding and sharding policy.

    Levels with at least ``replicate_below`` nodes per edge are 2D
    block-partitioned over the ("x", "y") mesh axes on zero-padded,
    mesh-divisible buffers; smaller levels are replicated and unpadded
    (coarse agglomeration).
    """

    def __init__(self, hier: GridHierarchy, mesh: Mesh, replicate_below: int = 257,
                 tile: tuple = (8, 128)):
        self.hier = hier
        self.mesh = mesh
        self.replicate_below = replicate_below
        self.sx = mesh.shape["x"]
        self.sy = mesh.shape["y"]
        # On TPU, keep shard tiles aligned to the (8, 128) register tiling;
        # on the CPU fake-pod any multiple works.
        self.tr = tile[0] if jax.default_backend() == "tpu" else 1
        self.tc = tile[1] if jax.default_backend() == "tpu" else 1
        self.levels = []
        self.shapes = []
        for lv in hier.levels:
            if self.is_sharded(lv.n):
                Hp = _round_up(lv.n + 1, self.sx * self.tr)
                Wp = _round_up(lv.n + 1, self.sy * self.tc)
                spec = P("x", "y")
                pid = None
                if lv.pid is not None:
                    pid = self._pad_to(lv.pid, Hp, Wp)
                geo = self._pad_to(lv.geo, Hp, Wp)
                diag = self._pad_to(lv.diag, Hp, Wp, fill=1.0)
                sh = NamedSharding(mesh, spec)
                pid = None if pid is None else jax.device_put(pid, sh)
                lvp = lv.replace(pid=pid, geo=jax.device_put(geo, sh),
                                 diag=jax.device_put(diag, sh))
            else:
                Hp = Wp = lv.n + 1
                lvp = lv
            self.levels.append(lvp)
            self.shapes.append((Hp, Wp))

    def is_sharded(self, n: int) -> bool:
        return n + 1 >= self.replicate_below

    @staticmethod
    def _pad_to(x, Hp, Wp, fill=0.0):
        H, W = x.shape
        out = jnp.full((Hp, Wp), jnp.asarray(fill, dtype=x.dtype))
        return out.at[:H, :W].set(x)

    def spec(self, level: int, batched: bool = False) -> P:
        s = P("x", "y") if self.is_sharded(self.hier.levels[level].n) else P(None, None)
        return P("dp", *s) if batched else s

    def pad_field(self, level: int, x: jax.Array) -> jax.Array:
        """Logical (n+1, n+1) field -> padded level buffer (inside jit)."""
        Hp, Wp = self.shapes[level]
        H = self.hier.levels[level].n_nodes
        if (Hp, Wp) == (H, H):
            return x
        pad = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - H)]
        return jnp.pad(x, pad)

    def unpad_field(self, level: int, x: jax.Array) -> jax.Array:
        H = self.hier.levels[level].n_nodes
        return x[..., :H, :H]

    def _c(self, level: int, x: jax.Array) -> jax.Array:
        return constrain(self.mesh, x, self.spec(level, batched=x.ndim == 3))

    def res_norm(self, level: int, r_pad: jax.Array) -> jax.Array:
        """Interior residual norm on a padded buffer (pad rows adjacent to
        the logical boundary hold garbage from the stencil ghost reads, so
        crop to the logical interior explicitly)."""
        H = self.hier.levels[level].n_nodes
        ri = r_pad[..., 1 : H - 1, 1 : H - 1]
        return jnp.sqrt(jnp.sum(ri * ri, axis=(-2, -1)))

    def v_cycle(self, u: jax.Array, f: jax.Array, nu1: int = 1, nu2: int = 1,
                bc_value=0.0, omega: float = DEFAULT_OMEGA, level: int = 0) -> jax.Array:
        """Recursive V-cycle on padded level buffers; GSPMD materializes the
        halo exchanges for the stencil shifts and the layout changes at the
        agglomeration boundary."""
        lv = self.levels[level]
        bc = bc_value if level == 0 else 0.0
        u = self._c(level, u)
        for _ in range(nu1):
            u = self._c(level, jac.jacobi_step(lv, u, f, bc, omega))
        if level < len(self.levels) - 1:
            r = f - lv.apply(u)
            r = self.unpad_field(level, r)
            f_c = self.pad_field(level + 1, 4.0 * restrict_full_weighting(r))
            f_c = self._c(level + 1, f_c)
            u_c = jnp.zeros_like(f_c)
            u_c = self.v_cycle(u_c, f_c, nu1, nu2, 0.0, omega, level + 1)
            corr = prolong_bilinear(
                self.unpad_field(level + 1, u_c),
                self.unpad_field(level, lv.geo),
            )
            u = u + self._c(level, self.pad_field(level, corr))
        for _ in range(nu2):
            u = self._c(level, jac.jacobi_step(lv, u, f, bc, omega))
        return u

    def solve(self, f: jax.Array, u0: jax.Array | None = None, nu1: int = 1, nu2: int = 1,
              eps: float = 1e-6, max_cycles: int = 100):
        """Whole-solve jit: while_loop of distributed V-cycles, one dispatch.
        ``f`` is the logical mass-convolved RHS."""
        H = self.hier.finest.n_nodes
        if u0 is None:
            u0 = jnp.zeros((H, H), dtype=f.dtype)

        @jax.jit
        def run(u, f):
            u = self._c(0, self.pad_field(0, u))
            f = self._c(0, self.pad_field(0, f))

            def cond(c):
                u, k, res = c
                return (res > eps) & (k < max_cycles)

            def body(c):
                u, k, res = c
                u = self.v_cycle(u, f, nu1, nu2)
                r = f - self.levels[0].apply(u)
                return (u, k + 1, self.res_norm(0, r).astype(jnp.float32))

            u, k, res = jax.lax.while_loop(
                cond, body, (u, jnp.int32(0), jnp.float32(jnp.inf))
            )
            return self.unpad_field(0, u), k, res

        u, k, res = run(u0, f)
        return u, int(k), float(res)


# ---- sharded training steps (dp over batch + spatial sharding) ----


def sharded_hnet_train_step(mesh: Mesh):
    """Returns a jitted H-Net training step whose batch is dp-sharded (fields
    replicated spatially — training grids are small); gradients are psum'd by
    GSPMD from the sharded loss reduction."""
    from multigrid_feanet_tpu.learn import train_hnet

    def step(level, state, u_star, f, bc_value, bc_index):
        spec = P("dp", None, None)
        u_star = constrain(mesh, u_star, spec)
        f = constrain(mesh, f, spec)
        bc_value = constrain(mesh, bc_value, spec)
        return train_hnet.train_step(level, state, u_star, f, bc_value, bc_index)

    return step


# ---- explicit shard_map halo exchange (performance-controlled alternative
# to the GSPMD-automatic path above) ----

from functools import partial as _partial

from jax import shard_map as _shard_map

from multigrid_feanet_tpu.ops import stencil as _stencil


def halo_exchange(local: jax.Array, axis_x: str = "x", axis_y: str = "y") -> jax.Array:
    """Exchange 1-deep halos with the 4 neighbours of a 2D block partition
    via `lax.ppermute` (XLA collective-permute over ICI).

    ``local``: this shard's (h, w) tile.  Returns the (h+2, w+2) haloed tile
    with zero ghosts at the global domain edge (matching the zero-padded
    stencil semantics of the single-device operator).
    """
    nx = jax.lax.axis_size(axis_x)
    ny = jax.lax.axis_size(axis_y)
    ix = jax.lax.axis_index(axis_x)
    iy = jax.lax.axis_index(axis_y)

    def ppermute(x, axis, shift):
        n = jax.lax.axis_size(axis)
        perm = [(i, (i + shift) % n) for i in range(n)]
        return jax.lax.ppermute(x, axis, perm)

    # rows from the north/south neighbours (wrap values are masked below)
    top = ppermute(local[-1:, :], axis_x, 1)      # from ix-1: its last row
    bot = ppermute(local[:1, :], axis_x, -1)      # from ix+1: its first row
    top = jnp.where(ix == 0, 0.0, top)
    bot = jnp.where(ix == nx - 1, 0.0, bot)
    body = jnp.concatenate([top, local, bot], axis=0)
    left = ppermute(body[:, -1:], axis_y, 1)
    right = ppermute(body[:, :1], axis_y, -1)
    left = jnp.where(iy == 0, 0.0, left)
    right = jnp.where(iy == ny - 1, 0.0, right)
    return jnp.concatenate([left, body, right], axis=1)


def _bitplane_update(uh, f, pid, row0, col0, H, W, a0, da, omega, bimaterial,
                     r_off=0, c_off=0):
    """One masked omega-Jacobi update on an (h, w) output region whose
    haloed window is ``uh`` ((h+2, w+2)); ``f``/``pid`` are the matching
    (h, w) tiles and (row0 + r_off, col0 + c_off) the region's global
    origin.  Tap order matches shardmap_jacobi_step exactly (bitwise)."""
    import jax.numpy as jnp

    h, w = f.shape
    u = uh[1 : 1 + h, 1 : 1 + w]
    acc = None
    for (dr, dc), wgt in _stencil.UNIT_S9.items():
        t = (a0 * wgt) * uh[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        acc = t if acc is None else acc + t
    if bimaterial:
        p = pid.astype(jnp.int32)
        for e, taps in enumerate(_stencil.UNIT_S4):
            bit = ((p >> e) & 1).astype(u.dtype)
            t4 = None
            for (dr, dc), wgt in taps.items():
                t = wgt * uh[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                t4 = t if t4 is None else t4 + t
            acc = acc + (da * bit) * t4
        nbits = (p & 1) + ((p >> 1) & 1) + ((p >> 2) & 1) + ((p >> 3) & 1)
        d = (2.0 / 3.0) * (4.0 * a0 + da * nbits.astype(u.dtype))
    else:
        d = jnp.asarray((8.0 / 3.0) * a0, u.dtype)
    r = f - acc
    gr = row0 + r_off + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    gc = col0 + c_off + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)
    return jnp.where(interior, u + (omega / d) * r, u)


def shardmap_jacobi_step_overlap(mesh: Mesh, H: int, W: int, a0: float,
                                 a1: Optional[float], omega: float = 2.0 / 3.0):
    """Halo/compute-OVERLAPPED variant of :func:`shardmap_jacobi_step`.

    The shard-local sweep is split into interior + rim: the ppermutes are
    issued first, the interior block (which needs no halo) is computed
    while they are in flight, and only the 1-node rim consumes the received
    halos — XLA's latency-hiding scheduler can then run the collectives
    under the interior compute (SURVEY §2.6 "interior stencil compute while
    halo in flight").  Value-identical (bitwise) to the synchronous step:
    every region uses the same tap order on the same window values.
    """
    import jax.numpy as jnp

    bimaterial = a1 is not None
    da = (a1 - a0) if bimaterial else 0.0

    def local_step(u, f, pid, row0, col0):
        h, w = u.shape
        nx = jax.lax.axis_size("x")
        ny = jax.lax.axis_size("y")
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")

        def ppermute(x, axis, shift):
            n = jax.lax.axis_size(axis)
            perm = [(i, (i + shift) % n) for i in range(n)]
            return jax.lax.ppermute(x, axis, perm)

        # issue the row halos FIRST (phase 1 of the two-hop exchange)
        top = ppermute(u[-1:, :], "x", 1)
        bot = ppermute(u[:1, :], "x", -1)

        # interior block (rows/cols 1..h-2): window is u itself — no halo
        pid_i = None if pid is None else pid[1 : h - 1, 1 : w - 1]
        out_int = _bitplane_update(
            u, f[1 : h - 1, 1 : w - 1], pid_i, row0, col0, H, W, a0, da,
            omega, bimaterial, r_off=1, c_off=1)

        # phase 2: assemble the haloed tile (columns carry the corners)
        top = jnp.where(ix == 0, 0.0, top)
        bot = jnp.where(ix == nx - 1, 0.0, bot)
        body = jnp.concatenate([top, u, bot], axis=0)
        left = ppermute(body[:, -1:], "y", 1)
        right = ppermute(body[:, :1], "y", -1)
        left = jnp.where(iy == 0, 0.0, left)
        right = jnp.where(iy == ny - 1, 0.0, right)
        uh = jnp.concatenate([left, body, right], axis=1)  # (h+2, w+2)

        # rim: top/bottom rows (full width), then left/right columns
        def upd(rs, re, cs, ce):
            return _bitplane_update(
                uh[rs : re + 2, cs : ce + 2], f[rs:re, cs:ce],
                None if pid is None else pid[rs:re, cs:ce],
                row0, col0, H, W, a0, da, omega, bimaterial,
                r_off=rs, c_off=cs)

        out = u
        out = out.at[1 : h - 1, 1 : w - 1].set(out_int)
        out = out.at[0:1, :].set(upd(0, 1, 0, w))
        out = out.at[h - 1 : h, :].set(upd(h - 1, h, 0, w))
        out = out.at[1 : h - 1, 0:1].set(upd(1, h - 1, 0, 1))
        out = out.at[1 : h - 1, w - 1 : w].set(upd(1, h - 1, w - 1, w))
        return out

    def wrapped(u, f, pid):
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        row0 = ix * u.shape[0]
        col0 = iy * u.shape[1]
        return local_step(u, f, pid, row0, col0)

    spec = P("x", "y")
    fn = _shard_map(wrapped, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return jax.jit(fn)


def shardmap_jacobi_step(mesh: Mesh, H: int, W: int, a0: float, a1: Optional[float],
                         omega: float = 2.0 / 3.0):
    """Explicit-halo distributed Jacobi sweep over a ("x", "y") 2D partition.

    Returns a jitted fn (u_pad, f_pad, pid_pad) -> u_new operating on
    mesh-divisible padded buffers (same layout as DistributedHierarchy).
    Each shard exchanges 1-deep halos via ppermute, evaluates the bitplane
    operator on its haloed tile, and applies the masked omega/D update —
    the comm/compute structure is explicit instead of GSPMD-inferred.
    """
    bimaterial = a1 is not None
    da = (a1 - a0) if bimaterial else 0.0

    def local_step(u, f, pid, row0, col0):
        uh = halo_exchange(u)
        # bitplane taps on the haloed tile
        h, w = u.shape
        acc = None
        for (dr, dc), wgt in _stencil.UNIT_S9.items():
            t = (a0 * wgt) * uh[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            acc = t if acc is None else acc + t
        if bimaterial:
            p = pid.astype(jnp.int32)
            for e, taps in enumerate(_stencil.UNIT_S4):
                bit = ((p >> e) & 1).astype(u.dtype)
                t4 = None
                for (dr, dc), wgt in taps.items():
                    t = wgt * uh[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                    t4 = t if t4 is None else t4 + t
                acc = acc + (da * bit) * t4
            nbits = (p & 1) + ((p >> 1) & 1) + ((p >> 2) & 1) + ((p >> 3) & 1)
            d = (2.0 / 3.0) * (4.0 * a0 + da * nbits.astype(u.dtype))
        else:
            d = jnp.asarray((8.0 / 3.0) * a0, u.dtype)
        r = f - acc
        gr = row0 + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        gc = col0 + jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        interior = (gr >= 1) & (gr <= H - 2) & (gc >= 1) & (gc <= W - 2)
        return jnp.where(interior, u + (omega / d) * r, u)

    def wrapped(u, f, pid):
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        row0 = ix * u.shape[0]
        col0 = iy * u.shape[1]
        return local_step(u, f, pid, row0, col0)

    spec = P("x", "y")
    fn = _shard_map(wrapped, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return jax.jit(fn)
