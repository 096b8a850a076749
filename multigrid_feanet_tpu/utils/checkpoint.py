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
