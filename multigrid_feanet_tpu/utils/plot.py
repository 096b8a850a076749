"""Plotting utilities — equivalents of the reference's Utils/plot.py
(plot_field, plot_pattern; reference: Utils/plot.py:4-35), matplotlib-based,
taking jax/numpy arrays."""

from __future__ import annotations

import numpy as np


def plot_field(field, limit=None, fname=None, ax=None, cmap="jet"):
    """Render a 2D field (any (H, W) or (1, 1, H, W)-ish array) as an image
    with a colorbar.  (reference: Utils/plot.py:4-25)"""
    import matplotlib.pyplot as plt

    arr = np.asarray(field)
    arr = arr.reshape(arr.shape[-2], arr.shape[-1])
    own = ax is None
    if own:
        _, ax = plt.subplots()
    vmin, vmax = (limit if limit is not None else (None, None))
    im = ax.imshow(arr, cmap=cmap, vmin=vmin, vmax=vmax, origin="lower")
    ax.figure.colorbar(im, ax=ax)
    if fname:
        ax.figure.savefig(fname, dpi=500, bbox_inches="tight")
    return ax


def plot_pattern(pid, key=None, fname=None, ax=None):
    """Visualize the per-node pattern-id field, or the indicator of one
    pattern ``key``.  (reference: Utils/plot.py:27-35 plots
    global_pattern_center[key])"""
    import matplotlib.pyplot as plt

    arr = np.asarray(pid)
    if key is not None:
        arr = (arr == key).astype(np.float32)
    own = ax is None
    if own:
        _, ax = plt.subplots()
    im = ax.imshow(arr, cmap="viridis", origin="lower")
    ax.figure.colorbar(im, ax=ax)
    if fname:
        ax.figure.savefig(fname, dpi=500, bbox_inches="tight")
    return ax


def plot_residual_history(histories: dict, fname=None, ax=None):
    """Semilog residual-vs-iteration curves, the reference notebooks' most
    common figure."""
    import matplotlib.pyplot as plt

    own = ax is None
    if own:
        _, ax = plt.subplots()
    for label, hist in histories.items():
        ax.plot(np.asarray(hist), label=label)
    ax.set_yscale("log")
    ax.set_xlabel("# iteration")
    ax.set_ylabel("|r|")
    ax.legend()
    if fname:
        ax.figure.savefig(fname, dpi=500, bbox_inches="tight")
    return ax
