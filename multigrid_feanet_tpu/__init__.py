"""multigrid_feanet_tpu — a TPU-native multigrid / FEA-Net framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
Multigrid-FEANet reference (2D structured-quad FEM expressed as
spatially-varying 3x3 stencils, weighted-Jacobi / learned smoothers,
geometric multigrid with classical and learned inter-grid operators),
re-designed TPU-first:

- the assembled stiffness operator is a 16-entry stencil table plus an int8
  per-node pattern-id field (9 bytes/node/apply at the HBM roofline) instead
  of the reference's 16-channel masked convolution
  (reference: FEANet/model.py:8-47, FEANet/mesh.py:103-117);
- solvers are `lax.scan`/`lax.while_loop` fixed-point loops with on-device
  residual carries (no per-iteration host sync);
- the hot Jacobi-step kernel is a fused Pallas stencil kernel;
- grids are 2D block-partitioned over a `jax.sharding.Mesh` with XLA/GSPMD
  or explicit `shard_map` + `ppermute` halo exchange.
"""

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy, Level
from multigrid_feanet_tpu.ops import stencil

__version__ = "0.1.0"
