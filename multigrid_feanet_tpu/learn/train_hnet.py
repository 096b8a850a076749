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


# ---- error-decay (spectral) training of the H-MG smoother ----
#
# The reference trains its H-Net standalone (k relax sweeps -> dataset
# solution MSE) at 129^2 and only then drops it into V-cycles; round 3
# showed that smoother HURTS at 4097^2 (30 cycles vs plain MG's 23).  The
# TPU-first fix trains THROUGH the V-cycle on the f=0 error-decay protocol
# (the reference's own convergence measure, MM_Model_convergence.ipynb
# cells 3/5): with f = 0 the exact solution is 0, cycles act on the error
# directly, and the loss  mean log(r_m / r_{m-1})  is a differentiable
# surrogate of log q — no dataset, any grid size, multi-size in one loss
# for scale robustness.


def _hjac_vcycle(hier, params, u, f, omega=2.0 / 3.0, h_levels=None):
    """One V(1,1) cycle with the H-relax smoother on levels < ``h_levels``
    (None = every level) and plain weighted Jacobi below — identical math
    to solvers/hmg.py::PallasHMG's cycle (interior-masked residual
    transfers, relax-only coarsest).  ``h_levels=1`` is the TPU-efficient
    configuration: the fused H legs are VPU-compute-bound, so confining the
    learned correction to the fine level (where the error lives after
    coarse-grid correction) keeps most of the convergence gain at a
    fraction of the per-cycle cost."""
    from multigrid_feanet_tpu.ops.transfer import (
        restrict_full_weighting, prolong_bilinear)
    from multigrid_feanet_tpu.solvers.jacobi import jacobi_step

    hl = hier.num_levels if h_levels is None else h_levels

    def rel(level, u, ff):
        if level < hl:
            return hnet.h_relax(hier.levels[level], params, u, ff, 1, 0.0,
                                omega)
        return jacobi_step(hier.levels[level], u, ff, 0.0, omega)

    def cycle(level, u, ff):
        lv = hier.levels[level]
        u = rel(level, u, ff)
        if level < hier.num_levels - 1:
            r = (ff - lv.apply(u)) * lv.geo
            f_c = 4.0 * restrict_full_weighting(r)
            u_c = cycle(level + 1, jnp.zeros_like(f_c), f_c)
            u = u + prolong_bilinear(u_c, lv.geo)
        return rel(level, u, ff)

    return cycle(0, u, f)


def make_decay_step(hiers, *, m: int = 5, batch: int = 2,
                    learning_rate: float = 3e-3, warm: int = 2,
                    h_levels=None):
    """Build (init_state, step) for multi-size error-decay training.

    ``hiers``: list of GridHierarchy (different finest n, shared params).
    Per step and size: draw ``batch`` random errors, run ``m`` V(1,1)
    H-MG cycles, loss = mean over the last ``m - warm`` cycles of
    log(r_k / r_{k-1}) (asymptotic-q surrogate; the first ``warm`` cycles
    absorb the transient).  Returns scalar loss ~ log q.
    """
    from multigrid_feanet_tpu.solvers import jacobi as jac

    tx = optax.adam(learning_rate)

    def init_fn(seed: int = 0, num_layers: int = 3, params=None):
        key = jax.random.PRNGKey(seed)
        kp, key = jax.random.split(key)
        if params is None:
            params = hnet.init_params(kp, num_layers)
        return TrainState(params, tx.init(params), key)

    def loss_fn(params, key):
        total = 0.0
        for hier in hiers:
            lv0 = hier.finest
            H = lv0.n_nodes
            key, ku = jax.random.split(key)
            u0 = jax.random.normal(ku, (batch, H, H)) * lv0.geo
            f = jnp.zeros((H, H))

            def body(u, _):
                u = jax.vmap(lambda x: _hjac_vcycle(
                    hier, params, x, f, h_levels=h_levels))(u)
                r = jax.vmap(lambda x: jac.interior_norm(lv0.apply(x)))(u)
                return u, r

            u0r = jax.vmap(lambda x: jac.interior_norm(lv0.apply(x)))(u0)
            _, rs = jax.lax.scan(body, u0, None, length=m)
            logs = jnp.log(jnp.concatenate([u0r[None], rs], axis=0) + 1e-30)
            ratios = logs[1:] - logs[:-1]  # (m, batch) per-cycle log q
            total = total + jnp.mean(ratios[warm:])
        return total / len(hiers)

    @jax.jit
    def step(state: TrainState):
        key, ks = jax.random.split(state.key)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, ks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, key), loss

    return init_fn, step


def measure_q(hier, params, *, m: int = 10, seed: int = 0, mode="hjac",
              omega=2.0 / 3.0, h_levels=None):
    """Asymptotic per-cycle convergence factor of the (H-)MG V(1,1) cycle
    on the f=0 decay protocol: geometric mean of the last 3 ratios."""
    from multigrid_feanet_tpu.solvers import jacobi as jac
    from multigrid_feanet_tpu.solvers.multigrid import v_cycle

    lv0 = hier.finest
    H = lv0.n_nodes
    u = jax.random.normal(jax.random.PRNGKey(seed), (H, H),
                          jnp.float32) * lv0.geo
    f = jnp.zeros((H, H), jnp.float32)

    @jax.jit
    def run(u):
        def body(u, _):
            if mode == "hjac":
                u = _hjac_vcycle(hier, params, u, f, omega, h_levels)
            else:
                u = v_cycle(hier, u, f, 1, 1)
            return u, jac.interior_norm(lv0.apply(u))
        return jax.lax.scan(body, u, None, length=m)[1]

    rs = np.asarray(run(u))
    return float(np.exp(np.mean(np.diff(np.log(rs + 1e-30))[-3:]))), rs


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
