"""H-Net learned smoother: a chain of masked 3x3 convolutions correcting the
weighted-Jacobi increment.

Reference math (M-FEANet-mg_test.ipynb cell 4 ``HNet``; cell 5
``HJacIterator.HRelax``; also M-FEANet-learn_iterator.ipynb cells 7-8):

    H(x)    = (((x * K1) . geo) * K2) . geo ... * KL) . geo   (L=3 convs,
              no bias, no nonlinearity -> H is linear)
    HRelax:  jac_it = Jacobi(u);  u <- jac_it + H(jac_it - u)

Here parameters are a plain (L, 3, 3) array pytree (optax-friendly); convs
are 9-tap shift FMAs like the stencil ops, masked by the interior mask after
every layer.  ``import_torch_checkpoint`` loads the reference's trained
``.pth`` kernels for parity runs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Level
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA, jacobi_step


def init_params(key, num_layers: int = 3, scale: float | None = None,
                dtype=jnp.float32) -> jax.Array:
    """(L, 3, 3) conv kernels, torch Conv2d default init:
    U(-b, b) with b = 1/sqrt(fan_in) = 1/3 for a 1->1 3x3 conv."""
    bound = scale if scale is not None else 1.0 / 3.0
    return jax.random.uniform(key, (num_layers, 3, 3), dtype, -bound, bound)


def conv3x3(x: jax.Array, k: jax.Array) -> jax.Array:
    """Cross-correlation with a single 3x3 kernel, zero padding (torch
    Conv2d semantics): out[i,j] = sum_ab k[a,b] x[i+a-1, j+b-1]."""
    H, W = x.shape[-2:]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    out = None
    for a in range(3):
        for b in range(3):
            t = k[a, b] * xp[..., a : a + H, b : b + W]
            out = t if out is None else out + t
    return out


def apply_hnet(params: jax.Array, x: jax.Array, geo: jax.Array) -> jax.Array:
    """H(x): chain of geo-masked 3x3 convs."""
    for i in range(params.shape[0]):
        x = conv3x3(x, params[i]) * geo
    return x


def h_relax(level: Level, params: jax.Array, u: jax.Array, f: jax.Array,
            num_sweeps: int, bc_value=0.0, omega: float = DEFAULT_OMEGA) -> jax.Array:
    """``num_sweeps`` (static) H-corrected Jacobi sweeps."""
    for _ in range(num_sweeps):
        jac_it = jacobi_step(level, u, f, bc_value, omega)
        u = jac_it + apply_hnet(params, jac_it - u, level.geo)
    return u


def h_relax_dynamic(level: Level, params: jax.Array, u: jax.Array, f: jax.Array,
                    num_sweeps: jax.Array, max_sweeps: int, bc_value=0.0,
                    omega: float = DEFAULT_OMEGA) -> jax.Array:
    """Traced-count variant for training with random k: a bounded scan of
    ``max_sweeps`` steps with updates masked beyond ``num_sweeps`` (a
    dynamic-trip-count loop would not be reverse-differentiable)."""

    def body(u, i):
        jac_it = jacobi_step(level, u, f, bc_value, omega)
        u_new = jac_it + apply_hnet(params, jac_it - u, level.geo)
        return jnp.where(i < num_sweeps, u_new, u), None

    u, _ = jax.lax.scan(body, u, jnp.arange(max_sweeps))
    return u


def compose_kernels(params: jax.Array) -> jax.Array:
    """Compose the L chained 3x3 kernels into one (2L+1)^2 kernel (valid away
    from boundaries) — the reference's kernel-composition analysis
    (M-FEANet-mg_test.ipynb cells 13-17 ``conv_op``)."""
    L = params.shape[0]
    size = 2 * L + 1
    acc = np.zeros((size, size))
    acc[L, L] = 1.0
    acc = jnp.asarray(acc, dtype=params.dtype)
    for i in range(L):
        acc = conv3x3(acc, params[i])
    return acc


# ---- elastic (2-DOF/node) H-Net: the "material response" learned iterator ----
#
# BASELINE.json config 5 asks for learned-iterator training on the elastic
# family.  The reference only trains its H-Net on scalar Poisson (its
# elasticity lives in MATLAB oracles, Archive/FEM/matlab_elasticity/); the
# natural extension is the same conv-stack corrector with 2->2-channel
# kernels acting on displacement increments, masked per layer by the
# interior mask, paired with the 2x2 block-Jacobi smoother
# (solvers/elastic.py relax).


def init_params_elastic(key, num_layers: int = 3, dtype=jnp.float32) -> jax.Array:
    """(L, 2, 2, 3, 3) kernels (out_c, in_c, kh, kw), torch Conv2d default
    init: U(-b, b) with b = 1/sqrt(fan_in) = 1/sqrt(2*9)."""
    bound = 1.0 / np.sqrt(18.0)
    return jax.random.uniform(key, (num_layers, 2, 2, 3, 3), dtype, -bound, bound)


def conv3x3_mc(x: jax.Array, k: jax.Array) -> jax.Array:
    """2->2-channel 3x3 cross-correlation, zero padding.  ``x``:
    (..., 2, H, W); ``k``: (2, 2, 3, 3).  Unrolled shift-FMA form (36 taps),
    the same TPU-friendly pattern as the elastic stencil apply."""
    H, W = x.shape[-2:]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    outs = []
    for oc in range(2):
        acc = None
        for ic in range(2):
            for a in range(3):
                for b in range(3):
                    t = k[oc, ic, a, b] * xp[..., ic, a : a + H, b : b + W]
                    acc = t if acc is None else acc + t
        outs.append(acc)
    return jnp.stack(outs, axis=-3)


def apply_hnet_elastic(params: jax.Array, x: jax.Array, geo: jax.Array) -> jax.Array:
    """H(x) for displacement fields: chain of geo-masked 2->2ch convs."""
    for i in range(params.shape[0]):
        x = conv3x3_mc(x, params[i]) * geo
    return x


def h_relax_elastic(level, params: jax.Array, u: jax.Array, f: jax.Array,
                    num_sweeps: int, bc_value=0.0, omega: float = DEFAULT_OMEGA) -> jax.Array:
    """``num_sweeps`` (static) H-corrected block-Jacobi sweeps on an
    ElasticLevel: jac_it = BlockJacobi(u); u <- jac_it + H(jac_it - u)."""
    from multigrid_feanet_tpu.solvers import elastic as elastic_solver

    for _ in range(num_sweeps):
        jac_it = elastic_solver.relax(level, u, f, 1, bc_value, omega)
        u = jac_it + apply_hnet_elastic(params, jac_it - u, level.geo)
    return u


def h_relax_elastic_dynamic(level, params: jax.Array, u: jax.Array, f: jax.Array,
                            num_sweeps: jax.Array, max_sweeps: int, bc_value=0.0,
                            omega: float = DEFAULT_OMEGA) -> jax.Array:
    """Traced-count variant for random-k training (bounded scan, updates
    masked beyond ``num_sweeps`` — mirrors h_relax_dynamic)."""
    from multigrid_feanet_tpu.solvers import elastic as elastic_solver

    def body(u, i):
        jac_it = elastic_solver.relax(level, u, f, 1, bc_value, omega)
        u_new = jac_it + apply_hnet_elastic(params, jac_it - u, level.geo)
        return jnp.where(i < num_sweeps, u_new, u), None

    u, _ = jax.lax.scan(body, u, jnp.arange(max_sweeps))
    return u


def import_torch_checkpoint(path: str) -> jax.Array:
    """Load a reference HNet state_dict (.pth) -> (L, 3, 3) params.
    (reference layout: Model/learn_iterator/iso_poisson/*.pth,
    keys convLayers.{i}.weight of shape (1, 1, 3, 3))"""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    keys = sorted(sd.keys(), key=lambda s: int(s.split(".")[1]))
    return jnp.asarray(np.stack([sd[k].numpy()[0, 0] for k in keys]))
