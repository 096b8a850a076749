"""Checkpoint / resume for training loops.

The reference torch.saves a state_dict every epoch (reference:
M-FEANet-learn_iterator.ipynb cell 8; Model/ zoo).  Here any pytree
(params, optimizer state, loss history) round-trips through Orbax when
available, with a numpy .npz fallback so checkpointing never depends on
optional deps."""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def save(path: str, tree: Any) -> None:
    """Save a pytree.  Directory path -> Orbax; ``.npz`` path -> flat numpy."""
    if path.endswith(".npz"):
        leaves, treedef = jax.tree.flatten(tree)
        np.savez(
            path,
            __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def save_training(ckpt_dir: str, state: Any, epoch: int, losses) -> None:
    """Per-epoch training checkpoint (the reference torch.saves a state_dict
    every epoch — M-FEANet-learn_iterator.ipynb cell 8).  Writes
    ``{ckpt_dir}/latest.npz`` atomically with (train state, epochs completed,
    loss history)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, ".latest.tmp.npz")
    save(tmp, {"state": state, "epoch": np.asarray(epoch),
               "losses": np.asarray(losses, np.float64)})
    os.replace(tmp, os.path.join(ckpt_dir, "latest.npz"))


def load_training(ckpt_dir: str, state_like: Any):
    """Resume from :func:`save_training`.  Returns ``(state, start_epoch,
    losses)`` — the initial ``(state_like, 0, [])`` when no checkpoint
    exists."""
    path = os.path.join(ckpt_dir, "latest.npz")
    if not os.path.exists(path):
        return state_like, 0, []
    like = {"state": state_like, "epoch": np.asarray(0), "losses": np.zeros(0)}
    tree = load(path, like=like)
    return tree["state"], int(tree["epoch"]), list(tree["losses"])


def load(path: str, like: Any = None) -> Any:
    """Load a pytree saved by :func:`save`.  For ``.npz``, ``like`` supplies
    the tree structure (leaf order is flatten order)."""
    if path.endswith(".npz"):
        data = np.load(path)
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        if like is None:
            return leaves
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))
