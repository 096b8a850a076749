"""H-Net smoother training — optax port of the reference's HJacIterator.

Reference protocol (M-FEANet-mg_test.ipynb cell 5 / learn_iterator cell 8):
per batch, reset Dirichlet data from the dataset, mass-convolve f, draw a
random initial guess u0 ~ N(0,1), run k H-corrected Jacobi sweeps
(k ~ U{1..20} in mg_test, fixed k in learn_iterator), and minimize the
summed MSE against the dataset solution with Adadelta (torch defaults:
lr=1.0, rho=0.9, eps=1e-6), autodiff through the unrolled sweeps.

Here the whole step — k sweeps (fori_loop), loss, grads, Adadelta update —
is one jitted function; randomness is keyed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multigrid_feanet_tpu.core.geometry import reset_boundary
from multigrid_feanet_tpu.core.problem import Level
from multigrid_feanet_tpu.models import hnet
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.data import datasets
from multigrid_feanet_tpu.utils import checkpoint


class TrainState(NamedTuple):
    params: jax.Array
    opt_state: optax.OptState
    key: jax.Array


def make_optimizer() -> optax.GradientTransformation:
    """Adadelta with the torch defaults the reference trains with."""
    return optax.adadelta(learning_rate=1.0, rho=0.9, eps=1e-6)


def init_state(level: Level, seed: int = 0, num_layers: int = 3) -> TrainState:
    key = jax.random.PRNGKey(seed)
    kp, key = jax.random.split(key)
    params = hnet.init_params(kp, num_layers)
    tx = make_optimizer()
    return TrainState(params, tx.init(params), key)


@functools.partial(jax.jit, static_argnames=("k_max",), donate_argnums=(1,))
def train_step(level: Level, state: TrainState, u_star, f, bc_value, bc_index,
               k_max: int = 20):
    """One batch step.  Batch fields: (N, H, W).  ``bc_index`` is the
    reference's interior mask (1 interior / 0 boundary)."""
    key, k_k, k_u = jax.random.split(state.key, 3)
    k = jax.random.randint(k_k, (), 1, k_max + 1)
    tx = make_optimizer()

    def loss_fn(params):
        # the reference rebuilds the JacobiBlock with the batch's bc fields;
        # here bc enters the sweeps directly (dataset bc_index == interior
        # mask of the square domain)
        u0 = jax.random.normal(k_u, u_star.shape, u_star.dtype)
        ff = stencil.apply_mass(f, level.h)
        u_out = hnet.h_relax_dynamic(level, params, u0, ff, k, k_max, bc_value)
        return jnp.sum((u_out - u_star) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, key), loss


# ---- elastic learned iterator (material-response family) ----
#
# Same protocol as the scalar HJacIterator — random init, random-k unrolled
# sweeps, summed MSE vs the oracle displacement, Adadelta — with the 2x2
# block-Jacobi smoother and the 2->2-channel H-Net (models/hnet.py).  The
# reference trains only the scalar family; its elasticity exists as MATLAB
# ground truths (Archive/FEM/matlab_elasticity/), so this realizes the
# "learned iterator for elastic material response" capability end to end.


def init_state_elastic(seed: int = 0, num_layers: int = 3) -> TrainState:
    key = jax.random.PRNGKey(seed)
    kp, key = jax.random.split(key)
    params = hnet.init_params_elastic(kp, num_layers)
    tx = make_optimizer()
    return TrainState(params, tx.init(params), key)


@functools.partial(jax.jit, static_argnames=("k_max",))
def train_step_elastic(level, state: TrainState, u_star, f, k_max: int = 20):
    """One batch step on an ElasticLevel.  ``u_star``/``f``: (N, 2, H, W)
    oracle displacements and raw body forces (zero Dirichlet ring)."""
    key, k_k, k_u = jax.random.split(state.key, 3)
    k = jax.random.randint(k_k, (), 1, k_max + 1)
    tx = make_optimizer()

    def loss_fn(params):
        u0 = jax.random.normal(k_u, u_star.shape, u_star.dtype)
        ff = stencil.apply_mass(f, level.h)  # consistent load per component
        u_out = hnet.h_relax_elastic_dynamic(level, params, u0, ff, k, k_max)
        return jnp.sum((u_out - u_star) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, key), loss


def train_elastic(level, dataset, *, num_epochs: int = 100, batch_size: int = 5,
                  seed: int = 0, k_max: int = 20, log_every: int = 50,
                  verbose: bool = True, ckpt_dir: str | None = None,
                  ckpt_every: int = 1):
    """Elastic H-Net training loop.  Returns (params, per-epoch losses).
    ``ckpt_dir`` enables per-epoch checkpointing (the reference's every-epoch
    torch.save) with automatic resume from ``{ckpt_dir}/latest.npz``."""
    state = init_state_elastic(seed)
    start, losses = 0, []
    if ckpt_dir is not None:
        state, start, losses = checkpoint.load_training(ckpt_dir, state)
    for epoch in range(start, num_epochs):
        total, nb = 0.0, 0
        for batch in datasets.batches(dataset, batch_size, shuffle=True, seed=seed + epoch):
            u_star, f = batch
            state, loss = train_step_elastic(level, state, u_star, f, k_max=k_max)
            total += float(loss)
            nb += 1
        losses.append(total / max(nb, 1))
        if ckpt_dir is not None and ((epoch + 1) % ckpt_every == 0
                                     or epoch == num_epochs - 1):
            checkpoint.save_training(ckpt_dir, state, epoch + 1, losses)
        if verbose and epoch % log_every == 0:
            print(f"epoch {epoch}: loss {losses[-1]:.6f}")
    return state.params, np.asarray(losses)


def train(level: Level, dataset, *, num_epochs: int = 100, batch_size: int = 5,
          seed: int = 0, k_max: int = 20, log_every: int = 50, verbose: bool = True,
          ckpt_dir: str | None = None, ckpt_every: int = 1):
    """Full training loop.  Returns (params, per-epoch loss history).
    ``ckpt_dir`` enables per-epoch checkpointing (the reference's every-epoch
    torch.save) with automatic resume from ``{ckpt_dir}/latest.npz``."""
    state = init_state(level, seed)
    start, losses = 0, []
    if ckpt_dir is not None:
        state, start, losses = checkpoint.load_training(ckpt_dir, state)
    for epoch in range(start, num_epochs):
        total, nb = 0.0, 0
        for batch in datasets.batches(dataset, batch_size, shuffle=True, seed=seed + epoch):
            u_star, f, bc_value, bc_index = batch
            state, loss = train_step(level, state, u_star, f, bc_value, bc_index, k_max=k_max)
            total += float(loss)
            nb += 1
        losses.append(total / max(nb, 1))
        if ckpt_dir is not None and ((epoch + 1) % ckpt_every == 0
                                     or epoch == num_epochs - 1):
            checkpoint.save_training(ckpt_dir, state, epoch + 1, losses)
        if verbose and epoch % log_every == 0:
            print(f"epoch {epoch}: loss {losses[-1]:.6f}")
    return state.params, np.asarray(losses)
