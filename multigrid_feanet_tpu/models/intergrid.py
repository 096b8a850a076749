"""Learned inter-grid operators: trainable per-pattern restriction and
prolongation kernels inside the V-cycle.

Reference math (FEANet/multigrid.py:50-184):
- ``RestrictionNet``: 16->1 channel stride-2 3x3 conv over the
  pattern-split residual, all channels initialized to full-weighting/16
  (:50-60; init value from MM-FEANet-interface_multigrid_rhs_kernel_split_res
  .ipynb cell 3).
- ``ProlongationNet``: 16->1 stride-2 3x3 ConvTranspose2d (padding=1),
  initialized to bilinear/4 (:62-73).
- V-cycle ``iterate`` (:159-184): relax 1x, pattern-split the residual
  (KNet.split_x), f_c = w[0] * Restrict(crop interior -> conv -> zero-pad),
  recurse, eF = w[1] * Interpolate(split coarse v), add, relax; frozen
  ratio w = [4, 1].

Here the pattern split is a one-hot mask by pid (ops/stencil.split_by_pattern)
and both transfers are single `lax.conv_general_dilated` calls; channel k of
the parameters corresponds to OUR pid k (bit-encoded).
``import_torch_checkpoint`` permutes the reference's channel order
(FEANet/mesh.py:23-26) into ours.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multigrid_feanet_tpu.core.problem import GridHierarchy
from multigrid_feanet_tpu.ops import stencil
from multigrid_feanet_tpu.ops.transfer import prolong_bilinear  # noqa: F401 (parity tests)
from multigrid_feanet_tpu.solvers.jacobi import DEFAULT_OMEGA, relax

FULL_WEIGHTING_16 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float32) / 16.0
BILINEAR_4 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float32) / 4.0


@struct.dataclass
class IntergridParams:
    """conv: (C, 3, 3) restriction kernels (channel = pid), deconv: (C, 3, 3)
    prolongation kernels, w: (2,) restrict/prolong ratio (frozen [4, 1] in
    the reference, FEANet/multigrid.py:94-100)."""

    conv: jax.Array
    deconv: jax.Array
    w: jax.Array

    @classmethod
    def init(cls, num_patterns: int = 16, dtype=jnp.float32) -> "IntergridParams":
        conv = jnp.broadcast_to(jnp.asarray(FULL_WEIGHTING_16, dtype), (num_patterns, 3, 3))
        deconv = jnp.broadcast_to(jnp.asarray(BILINEAR_4, dtype), (num_patterns, 3, 3))
        return cls(conv=jnp.array(conv), deconv=jnp.array(deconv),
                   w=jnp.asarray([4.0, 1.0], dtype))


def _split(x: jax.Array, pid: jax.Array | None, num_patterns: int) -> jax.Array:
    """(N, H, W) -> (N, C, H, W) pattern split (all-ones mask if pid None,
    matching the single-pattern MeshSquare split)."""
    if pid is None:
        return x[:, None, :, :]
    return stencil.split_by_pattern(x, pid, num_patterns)


def restrict_learned(params: IntergridParams, r: jax.Array, pid: jax.Array | None) -> jax.Array:
    """w[0] * (crop interior -> per-pattern stride-2 conv -> zero-pad).

    ``r``: (N, H, W) fine residual -> (N, Hc, Wc) coarse RHS.
    (reference: MultiGrid.Restrict, FEANet/multigrid.py:115-122 + w[0])
    """
    C = params.conv.shape[0]
    split = _split(r, pid, C)[..., 1:-1, 1:-1]  # (N, C, H-2, W-2)
    rhs = params.conv[None]  # (O=1, I=C, 3, 3)
    out = jax.lax.conv_general_dilated(
        split, rhs.astype(r.dtype), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    out = jnp.pad(out, ((0, 0), (1, 1), (1, 1)))
    return params.w[0] * out


def prolong_learned(params: IntergridParams, v_c: jax.Array, pid_c: jax.Array | None) -> jax.Array:
    """w[1] * ConvTranspose2d(split coarse v; k=3, s=2, p=1).

    ``v_c``: (N, m, m) -> (N, 2m-1, 2m-1).  Torch ConvTranspose semantics =
    lhs-dilated conv with the spatially flipped kernel.
    (reference: MultiGrid.Interpolate, FEANet/multigrid.py:124-130 + w[1])
    """
    C = params.deconv.shape[0]
    split = _split(v_c, pid_c, C)  # (N, C, m, m)
    rhs = params.deconv[None, :, ::-1, ::-1]  # (O=1, I=C, 3, 3), flipped
    out = jax.lax.conv_general_dilated(
        split, rhs.astype(v_c.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return params.w[1] * out


def learned_v_cycle(hier: GridHierarchy, params: IntergridParams, u: jax.Array,
                    f: jax.Array, n_relax: int = 1, omega: float = DEFAULT_OMEGA,
                    level: int = 0) -> jax.Array:
    """One V-cycle with learned split transfers, batched (N, H, W) fields.
    (reference: MultiGrid.iterate, FEANet/multigrid.py:159-184)"""
    lv = hier.levels[level]
    u = relax(lv, u, f, n_relax, 0.0, omega)
    if level < hier.num_levels - 1:
        r = f - lv.apply(u)
        f_c = restrict_learned(params, r, lv.pid)
        u_c = jnp.zeros_like(f_c)
        u_c = learned_v_cycle(hier, params, u_c, f_c, n_relax, omega, level + 1)
        u = u + prolong_learned(params, u_c, hier.levels[level + 1].pid)
    # unconditional post-relax: the reference relaxes the coarsest level a
    # second time after its creation-relax (FEANet/multigrid.py:173)
    return relax(lv, u, f, n_relax, 0.0, omega)


def qm_loss(hier: GridHierarchy, u_m: jax.Array, u_m0: jax.Array, f: jax.Array,
            m: int, m0: int) -> jax.Array:
    """Mean geometric convergence factor
    q_m = mean((|r_m| / |r_m0|)^(1/(m-m0+1))) over the batch.
    (reference: MultiGrid.qm, FEANet/multigrid.py:132-136; the m0 residual is
    detached by the caller's schedule.)"""
    lv = hier.finest

    def _norm(u):
        r = f - lv.apply(u)
        ri = r[..., 1:-1, 1:-1]
        return jnp.sqrt(jnp.sum(ri * ri, axis=(-2, -1)))

    ratio = _norm(u_m) / jax.lax.stop_gradient(_norm(u_m0))
    return jnp.mean(jnp.power(ratio, 1.0 / (m - m0 + 1)))


def import_torch_checkpoint(path: str, num_patterns: int = 16) -> IntergridParams:
    """Load a reference MultiGrid state_dict (.pth): conv.net.weight
    (1, C, 3, 3), deconv.net.weight (C, 1, 3, 3), w (2,).  Channels are
    permuted from the reference's pattern-key order into our bit-encoded
    pid order."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    perm = stencil.reference_pattern_permutation()[:num_patterns]
    conv_ref = sd["conv.net.weight"].numpy()[0]  # (C, 3, 3)
    deconv_ref = sd["deconv.net.weight"].numpy()[:, 0]  # (C, 3, 3)
    conv = np.zeros_like(conv_ref)
    deconv = np.zeros_like(deconv_ref)
    for ref_key in range(num_patterns):
        conv[perm[ref_key]] = conv_ref[ref_key]
        deconv[perm[ref_key]] = deconv_ref[ref_key]
    w = sd["w"].numpy() if "w" in sd else np.array([4.0, 1.0], np.float32)
    return IntergridParams(conv=jnp.asarray(conv), deconv=jnp.asarray(deconv),
                           w=jnp.asarray(w))
