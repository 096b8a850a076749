"""Learned inter-grid operator training — optax port of the reference's
q_m-minimization loop.

Reference protocol (Archive/FEA-Net/MM-FEANet/MM-FEANet-interface_multigrid_
rhs_kernel_split_res.ipynb cells 7-11; library form FEANet/multigrid.py:
138-157):
- forward: f = mass(F) for a batch of RHS fields; v0 = random
  constant-scaled field (coef = 10*U(2)-5: coef0*U(H,W) + coef1); run
  m-1 = 5 V-cycles detached, caching the iterate at m0 = 2; final cycle
  with grad; loss = q_m = mean((|r_m|/|r_m0|)^(1/(m-m0+1))).
- optimizer: Adam(lr=1e-3); per-kernel curriculum: all but one of the 16
  R/P channel kernels are frozen per run (freeze_kernels / rewrite_kernels,
  cells 8, 10); w = [4, 1] stays frozen.

Here the detach schedule is `stop_gradient` inside one jitted step, and the
curriculum is a gradient mask over the (16, 3, 3) kernel channels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multigrid_feanet_tpu.core.problem import GridHierarchy
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.models.intergrid import IntergridParams
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.data import datasets


class TrainState(NamedTuple):
    params: IntergridParams
    opt_state: optax.OptState
    key: jax.Array


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


def init_state(seed: int = 0, num_patterns: int = 16, lr: float = 1e-3) -> TrainState:
    params = IntergridParams.init(num_patterns)
    return TrainState(params, make_optimizer(lr).init(params), jax.random.PRNGKey(seed))


def random_constant_field(key, shape, dtype=jnp.float32):
    """coef0 * U(H, W) + coef1 with coef = 10 U(2) - 5.
    (reference: MultiGrid.random_sampling, FEANet/multigrid.py:138-143)"""
    k1, k2 = jax.random.split(key)
    coef = 10.0 * jax.random.uniform(k1, (shape[0], 2), dtype) - 5.0
    u = jax.random.uniform(k2, shape, dtype)
    return coef[:, 0, None, None] * u + coef[:, 1, None, None]


def _grad_mask(params: IntergridParams, train_kernel: Optional[int]) -> IntergridParams:
    """1-valued mask over trainable leaves; the per-kernel curriculum zeroes
    all conv/deconv channels except ``train_kernel``; w is always frozen."""
    C = params.conv.shape[0]
    if train_kernel is None:
        ch = jnp.ones((C, 1, 1), params.conv.dtype)
    else:
        ch = jnp.zeros((C, 1, 1), params.conv.dtype).at[train_kernel].set(1.0)
    return IntergridParams(conv=jnp.broadcast_to(ch, params.conv.shape),
                           deconv=jnp.broadcast_to(ch, params.deconv.shape),
                           w=jnp.zeros_like(params.w))


@functools.partial(
    jax.jit,
    static_argnames=("m", "m0", "n_relax", "train_kernel", "train_deconv", "train_w", "lr"),
    donate_argnums=(1,),
)
def train_step(hier: GridHierarchy, state: TrainState, F_batch, *, m: int = 6, m0: int = 2,
               n_relax: int = 1, train_kernel: Optional[int] = None,
               train_deconv: bool = True, train_w: bool = False, lr: float = 1e-3):
    """One batch step on RHS fields ``F_batch`` (N, H, W)."""
    key, k_v = jax.random.split(state.key)
    lv = hier.finest
    f = stencil.apply_mass(F_batch, lv.h)
    v0 = random_constant_field(k_v, F_batch.shape, F_batch.dtype)
    tx = make_optimizer(lr)

    def loss_fn(params):
        u = v0
        u_m0 = v0
        for i in range(m - 1):
            u = jax.lax.stop_gradient(
                intergrid.learned_v_cycle(hier, params, u, f, n_relax)
            )
            if i == m0 - 1:
                u_m0 = u
        u_final = intergrid.learned_v_cycle(hier, params, u, f, n_relax)
        return intergrid.qm_loss(hier, u_final, u_m0, f, m, m0)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    mask = _grad_mask(state.params, train_kernel)
    if not train_deconv:
        mask = mask.replace(deconv=jnp.zeros_like(mask.deconv))
    if train_w:
        mask = mask.replace(w=jnp.ones_like(mask.w))
    grads = jax.tree.map(lambda g, mk: g * mk, grads, mask)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, key), loss


def train(hier: GridHierarchy, rhs_dataset, *, num_epochs: int = 300, batch_size: int = 64,
          seed: int = 0, m: int = 6, m0: int = 2, train_kernel: Optional[int] = None,
          lr: float = 1e-3, log_every: int = 50, verbose: bool = True,
          ckpt_dir: Optional[str] = None, ckpt_every: int = 1,
          init_params: Optional[IntergridParams] = None):
    """Train the R/P kernels on an RHS dataset.  ``train_kernel`` selects the
    reference's one-kernel-at-a-time curriculum (None = all channels);
    ``init_params`` warm-starts from a previous curriculum stage.
    ``ckpt_dir`` enables per-epoch checkpointing (the reference's every-epoch
    torch.save) with automatic resume from ``{ckpt_dir}/latest.npz``.
    Returns (params, per-epoch q_m loss history)."""
    from multigrid_feanet_tpu.utils import checkpoint

    state = init_state(seed, num_patterns=16 if hier.finest.pid is not None else 1, lr=lr)
    if init_params is not None:
        state = state._replace(params=init_params)
    start, losses = 0, []
    if ckpt_dir is not None:
        state, start, losses = checkpoint.load_training(ckpt_dir, state)
    for epoch in range(start, num_epochs):
        total, nb = 0.0, 0
        for F in datasets.batches(rhs_dataset, batch_size, shuffle=True, seed=seed + epoch):
            state, loss = train_step(
                hier, state, F, m=m, m0=m0, train_kernel=train_kernel, lr=lr
            )
            total += float(loss)
            nb += 1
        losses.append(total / max(nb, 1))
        if ckpt_dir is not None and ((epoch + 1) % ckpt_every == 0
                                     or epoch == num_epochs - 1):
            checkpoint.save_training(ckpt_dir, state, epoch + 1, losses)
        if verbose and epoch % log_every == 0:
            print(f"epoch {epoch}: q_m {losses[-1]:.5f}")
    return state.params, np.asarray(losses)


@functools.partial(
    jax.jit, static_argnames=("m", "m0", "n_relax", "lr"), donate_argnums=(1,)
)
def train_step_error_decay(hier: GridHierarchy, state: TrainState, batch_shape_key, *,
                           m: int = 10, m0: int = 5, n_relax: int = 1, lr: float = 1e-3):
    """f = 0 error-decay training (the reference's TwoGrid precursor:
    Archive/.../MM-FEANet-homo_kernel_twogrid.ipynb cells 3-8 — random u
    init, m_iter=10, m_0=5, qm loss, Adam(1e-3); no RHS data needed).
    ``batch_shape_key``: (N, H, W) array used only for shape/dtype."""
    key, k_v = jax.random.split(state.key)
    f = jnp.zeros_like(batch_shape_key)
    v0 = jax.random.normal(k_v, batch_shape_key.shape, batch_shape_key.dtype)
    tx = make_optimizer(lr)

    def loss_fn(params):
        u = v0
        u_m0 = v0
        for i in range(m - 1):
            u = jax.lax.stop_gradient(
                intergrid.learned_v_cycle(hier, params, u, f, n_relax)
            )
            if i == m0 - 1:
                u_m0 = u
        u_final = intergrid.learned_v_cycle(hier, params, u, f, n_relax)
        return intergrid.qm_loss(hier, u_final, u_m0, f, m, m0)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    mask = _grad_mask(state.params, None)
    grads = jax.tree.map(lambda g, mk: g * mk, grads, mask)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, key), loss


@functools.partial(
    jax.jit,
    static_argnames=("shapes", "m", "m0", "n_relax", "lr"),
    donate_argnums=(1,),
)
def train_step_decay_multisize(hiers, state: TrainState, *, shapes,
                               m: int = 10, m0: int = 5, n_relax: int = 1,
                               lr: float = 1e-3):
    """Multi-size f = 0 error-decay step for the inter-grid operator
    (round 4, VERDICT r3 #4).

    The round-3 joint-trained operator won in-distribution at its training
    size (n=16) but DIVERGED when transplanted to n=64 — the single-size
    q_m loss is blind to modes that only amplify at other scales (the same
    failure all 4 divergent reference checkpoints show,
    results/intergrid_budget/REPORT.md).  This step sums the q_m decay
    loss over several grid sizes in one update, the control that made the
    H-Net smoother scale-stable (learn/train_hnet.py::make_decay_step).

    ``hiers``: tuple of GridHierarchy (traced pytrees); ``shapes``: static
    matching (N, H, W) batch shapes.  All channels train jointly; w frozen.
    """
    key = state.key
    tx = make_optimizer(lr)
    ks = jax.random.split(key, len(shapes) + 1)

    def loss_fn(params):
        total = 0.0
        for hier, shape, k in zip(hiers, shapes, ks[1:]):
            f = jnp.zeros(shape, jnp.float32)
            v0 = jax.random.normal(k, shape, jnp.float32)
            u, u_m0 = v0, v0
            for i in range(m - 1):
                u = jax.lax.stop_gradient(
                    intergrid.learned_v_cycle(hier, params, u, f, n_relax))
                if i == m0 - 1:
                    u_m0 = u
            u_final = intergrid.learned_v_cycle(hier, params, u, f, n_relax)
            total = total + intergrid.qm_loss(hier, u_final, u_m0, f, m, m0)
        return total / len(shapes)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    mask = _grad_mask(state.params, None)
    grads = jax.tree.map(lambda g, mk: g * mk, grads, mask)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, ks[0]), loss


@functools.partial(
    jax.jit,
    static_argnames=("shapes", "m", "m0", "n_relax", "lr"),
    donate_argnums=(1,),
)
def train_step_rhs_multisize(hiers, state: TrainState, F_batches, *, shapes,
                             m: int = 10, m0: int = 6, n_relax: int = 1,
                             lr: float = 3e-4):
    """Multi-size RHS-protocol q_m step targeting the ASYMPTOTIC regime.

    Same structure as the reference's train_step (random constant-scaled
    init, detached early cycles) but (a) summed over several grid sizes in
    one update (scale robustness) and (b) with the detach point moved to
    m0 = 6 of m = 10: the reference trains on cycles 2-6 (the transient)
    while its own mgTest evaluator scores cycles 6-9 (the asymptote) —
    optimizing the window the evaluator actually measures.
    ``F_batches``: per-size RHS batches matching ``shapes``."""
    key = state.key
    tx = make_optimizer(lr)
    ks = jax.random.split(key, len(shapes) + 1)

    def loss_fn(params):
        total = 0.0
        for hier, F, shape, k in zip(hiers, F_batches, shapes, ks[1:]):
            lv = hier.finest
            f = stencil.apply_mass(F, lv.h)
            v0 = random_constant_field(k, shape, jnp.float32)
            u, u_m0 = v0, v0
            for i in range(m - 1):
                u = jax.lax.stop_gradient(
                    intergrid.learned_v_cycle(hier, params, u, f, n_relax))
                if i == m0 - 1:
                    u_m0 = u
            u_final = intergrid.learned_v_cycle(hier, params, u, f, n_relax)
            total = total + intergrid.qm_loss(hier, u_final, u_m0, f, m, m0)
        return total / len(shapes)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    mask = _grad_mask(state.params, None)
    grads = jax.tree.map(lambda g, mk: g * mk, grads, mask)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, ks[0]), loss
