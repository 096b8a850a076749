"""Periodic-BC multigrid: classical and learned-restriction V-cycles on the
torus, plus the reference's R-only training loop.

Reference math (Archive/FEA-Net/MM-FEANet/MM-FEANet-learnP-pbc.ipynb cell 8
``MultiGrid.iterate``): relax 1x -> crop/pbc-pad residual -> stride-2 3x3
conv restriction (kernel init = bilinear/4, so the h^2 factor 4 is baked into
the kernel sum) -> recurse (coarsest relaxed twice) -> ConvTranspose(k=3,
s=2, p=1) prolongation -> relax.  Only the restriction kernel is trainable;
the prolongation stays bilinear/4 (cell 8: conv.requires_grad_(True),
deconv.requires_grad_(False)).

On the unique n x n torus grid these become wrap-padded convolutions; coarse
torus grids have n/2 points per edge (every grid size stays even — periodic
problems have no +1 boundary row).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multigrid_feanet_tpu.ops import pbc, stencil

BILINEAR_4 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float32) / 4.0


def _wrap_pad(x, k=1):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(k, k), (k, k)], mode="wrap")


def pbc_restrict(r: jax.Array, kernel: jax.Array) -> jax.Array:
    """(..., n, n) -> (..., n/2, n/2): coarse node I samples fine node 2I
    with a 3x3 kernel and circular wrap."""
    squeeze = r.ndim == 2
    if squeeze:
        r = r[None]
    x = _wrap_pad(r)[:, None]  # (N, 1, n+2, n+2)
    out = jax.lax.conv_general_dilated(
        x, kernel.reshape(1, 1, 3, 3).astype(r.dtype), window_strides=(2, 2),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return out[0] if squeeze else out


def pbc_prolong(v: jax.Array, kernel: jax.Array) -> jax.Array:
    """(..., m, m) -> (..., 2m, 2m): transposed stride-2 conv on the torus
    (torch ConvTranspose2d(k=3, s=2, p=1) semantics, periodically wrapped).
    """
    squeeze = v.ndim == 2
    if squeeze:
        v = v[None]
    x = _wrap_pad(v)[:, None]  # (N, 1, m+2, m+2)
    rhs = kernel[::-1, ::-1].reshape(1, 1, 3, 3).astype(v.dtype)
    out = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding=((0, 0), (0, 0)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    # dilated wrapped input spans fine indices [-2, 2m+1]; VALID k=3 conv
    # yields [-1, 2m]; crop one leading row/col to start at fine index 0
    out = out[:, 1 : 1 + 2 * v.shape[-1], 1 : 1 + 2 * v.shape[-1]]
    return out[0] if squeeze else out


def v_cycle_pbc(table: jax.Array, u: jax.Array, f: jax.Array, num_levels: int,
                r_kernel: jax.Array | None = None, p_kernel: jax.Array | None = None,
                n_relax: int = 1, omega: float = 2.0 / 3.0, level: int = 0) -> jax.Array:
    """Recursive periodic V-cycle on unique torus grids (homogeneous
    operator).  Matches the reference cycle: unconditional post-relax, so the
    coarsest level is relaxed twice."""
    rk = BILINEAR_4 if r_kernel is None else r_kernel
    pk = BILINEAR_4 if p_kernel is None else p_kernel
    for _ in range(n_relax):
        u = pbc.jacobi_step_pbc(table, u, f, omega)
    if level < num_levels - 1:
        r = f - pbc.apply_stencil_periodic(table, u)
        f_c = pbc_restrict(r, jnp.asarray(rk))
        u_c = jnp.zeros_like(f_c)
        u_c = v_cycle_pbc(table, u_c, f_c, num_levels, r_kernel, p_kernel,
                          n_relax, omega, level + 1)
        u = u + pbc_prolong(u_c, jnp.asarray(pk))
    for _ in range(n_relax):
        u = pbc.jacobi_step_pbc(table, u, f, omega)
    return u


def solve_pbc_mg(table: jax.Array, f_conv: jax.Array, num_levels: int | None = None,
                 r_kernel=None, p_kernel=None, eps: float = 1e-5, max_cycles: int = 100):
    """Iterate periodic V-cycles to ``eps``; returns (u, history)."""
    n = f_conv.shape[-1]
    if num_levels is None:
        num_levels = int(np.log2(n))
    u = jnp.zeros_like(f_conv)
    hist = []
    for _ in range(max_cycles):
        u = v_cycle_pbc(table, u, f_conv, num_levels, r_kernel, p_kernel)
        res = float(pbc.pbc_interior_norm(f_conv - pbc.apply_stencil_periodic(table, u)))
        hist.append(res)
        if res <= eps or not np.isfinite(res):
            break
    return u, np.asarray(hist)


# ---- learned-restriction training (R only, reference cells 8/12-14) ----


class PBCTrainState(NamedTuple):
    r_kernel: jax.Array
    opt_state: optax.OptState
    key: jax.Array


def init_pbc_state(seed: int = 0, lr: float = 1e-3, perturb: float = 0.5) -> PBCTrainState:
    """Reference init: bilinear/4 + 0.5*U(3,3) perturbation (cell 10)."""
    key = jax.random.PRNGKey(seed)
    k1, key = jax.random.split(key)
    r0 = jnp.asarray(BILINEAR_4) + perturb * jax.random.uniform(k1, (3, 3))
    return PBCTrainState(r0, optax.adam(lr).init(r0), key)


@functools.partial(jax.jit, static_argnames=("num_levels", "k", "lr"), donate_argnums=(1,))
def pbc_train_step(table, state: PBCTrainState, f_raw, *, num_levels: int, k: int = 4,
                   lr: float = 1e-3):
    """One Adam step on the post-cycle residual ratio
    mean(|r_k| / |r_{k-1}|) with the k-1 prefix detached (reference cell 8
    ``loss`` + ``forward``).  ``f_raw``: (N, n, n) raw periodic RHS."""
    key, k_u = jax.random.split(state.key)
    n = f_raw.shape[-1]
    h = 2.0 / n
    f = pbc.apply_mass_periodic(f_raw, h)
    u0 = jax.random.normal(k_u, f_raw.shape, f_raw.dtype)

    def loss_fn(rk):
        u = u0
        for _ in range(k - 1):
            u = jax.lax.stop_gradient(v_cycle_pbc(table, u, f, num_levels, rk))
        u_last = u
        u = v_cycle_pbc(table, u, f, num_levels, rk)
        r1 = pbc.pbc_interior_norm(f - pbc.apply_stencil_periodic(table, u))
        r0 = pbc.pbc_interior_norm(f - pbc.apply_stencil_periodic(table, u_last))
        return jnp.mean(r1 / jax.lax.stop_gradient(r0))

    loss, g = jax.value_and_grad(loss_fn)(state.r_kernel)
    tx = optax.adam(lr)
    updates, opt_state = tx.update(g, state.opt_state, state.r_kernel)
    rk = optax.apply_updates(state.r_kernel, updates)
    return PBCTrainState(rk, opt_state, key), loss
