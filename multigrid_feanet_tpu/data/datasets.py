"""HDF5 datasets and batching — numpy/JAX replacements for the reference's
torch Dataset classes (reference: Data/dataset.py:6-104).

Each dataset is a lightweight container of numpy arrays with ``__len__`` /
``__getitem__`` and a :func:`batches` iterator producing jnp arrays; no
torch dependency.  Field names and shapes mirror the reference's h5 layout,
so the checked-in reference files load unchanged.

Also includes generators that recreate the reference's *missing* dataset
files (the 129x129 IsoPoisson and PBC sets are gitignored upstream,
reference: .gitignore / Data/IsoPoisson/python_fem.ipynb cell 8) using our
independent FEM oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

import jax
import jax.numpy as jnp

from multigrid_feanet_tpu.data import fem, rhs


@dataclasses.dataclass
class RHSDataset:
    """RHS-only fields ('train'/'test' keys).  (reference: Data/dataset.py:6-24)"""

    data: np.ndarray

    @classmethod
    def from_h5(cls, path: str, case: str = "train") -> "RHSDataset":
        with h5py.File(path, "r") as h5:
            return cls(np.array(h5[case], dtype=np.float32))

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, idx):
        return self.data[idx]


@dataclasses.dataclass
class IsoPoissonDataset:
    """(u, f, bc_value, bc_index) quadruples.  (reference: Data/dataset.py:26-51)"""

    u: np.ndarray
    f: np.ndarray
    bc_value: np.ndarray
    bc_index: np.ndarray

    @classmethod
    def from_h5(cls, path: str) -> "IsoPoissonDataset":
        with h5py.File(path, "r") as h5:
            return cls(
                u=np.array(h5["u"], dtype=np.float32),
                f=np.array(h5["rhs"], dtype=np.float32),
                bc_value=np.array(h5["boundary_value"], dtype=np.float32),
                bc_index=np.array(h5["boundary_index"], dtype=np.float32),
            )

    def __len__(self):
        return self.f.shape[0]

    def __getitem__(self, idx):
        return self.u[idx], self.f[idx], self.bc_value[idx], self.bc_index[idx]


@dataclasses.dataclass
class IsoPoissonPBCDataset:
    """Periodic problems: f only.  (reference: Data/dataset.py:53-69)"""

    f: np.ndarray

    @classmethod
    def from_h5(cls, path: str) -> "IsoPoissonPBCDataset":
        with h5py.File(path, "r") as h5:
            return cls(f=np.array(h5["rhs"], dtype=np.float32))

    def __len__(self):
        return self.f.shape[0]

    def __getitem__(self, idx):
        return self.f[idx]


@dataclasses.dataclass
class TestPoissonDataset:
    """7-field general test set (float64).  (reference: Data/dataset.py:71-104)"""

    dirich_idx: np.ndarray
    dirich_value: np.ndarray
    neumann_idx: np.ndarray
    neumann_value: np.ndarray
    material: np.ndarray
    source: np.ndarray
    solution: np.ndarray

    @classmethod
    def from_h5(cls, path: str) -> "TestPoissonDataset":
        def _sq(x):
            a = np.array(x, dtype=np.float64)
            return a[..., 0] if a.ndim == 4 else a  # drop trailing channel dim

        with h5py.File(path, "r") as h5:
            return cls(
                dirich_idx=_sq(h5["dirich_idx"]),
                dirich_value=_sq(h5["dirich_value"]),
                neumann_idx=_sq(h5["neumann_idx"]),
                neumann_value=_sq(h5["neumann_value"]),
                material=_sq(h5["material"]),
                source=_sq(h5["source"]),
                solution=_sq(h5["solution"]),
            )

    def __len__(self):
        return self.source.shape[0]

    def __getitem__(self, idx):
        return (self.dirich_idx[idx], self.dirich_value[idx], self.neumann_idx[idx],
                self.neumann_value[idx], self.material[idx], self.source[idx],
                self.solution[idx])


def batches(dataset, batch_size: int, *, shuffle: bool = True, seed: int = 0,
            drop_remainder: bool = False) -> Iterator:
    """Iterate minibatches of jnp arrays (stacked tuple fields)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    stop = n - (n % batch_size) if drop_remainder else n
    for start in range(0, stop, batch_size):
        idx = order[start : start + batch_size]
        items = [dataset[int(i)] for i in idx]
        if isinstance(items[0], tuple):
            yield tuple(jnp.asarray(np.stack(f)) for f in zip(*items))
        else:
            yield jnp.asarray(np.stack(items))


def generate_isopoisson(n: int, num_samples: int, seed: int = 0,
                        alpha: float = 10.6) -> IsoPoissonDataset:
    """Recreate the IsoPoisson dataset with the FEM oracle.

    Per sample: smooth GRF RHS (alpha=10.6, reference python_fem.ipynb cell
    2), random GRF Dirichlet boundary values, f64 partition solve.
    Replaces the reference's missing ``poisson2d_{n+1}x{n+1}.h5`` files.
    """
    key = jax.random.PRNGKey(seed)
    H = n + 1
    us, fs, bvs, bis = [], [], [], []
    # reference convention: boundary_index is 1 at INTERIOR nodes, 0 on the
    # boundary ring (it is used directly as the reset mask, u*idx + value;
    # verified against Data/IsoPoisson/poisson2d_33x33.h5)
    bc_index = np.ones((H, H), dtype=np.float32)
    bc_index[0, :] = bc_index[-1, :] = bc_index[:, 0] = bc_index[:, -1] = 0.0
    boundary_ring = 1.0 - bc_index
    use_cg = n > 64  # dense O(N^3) is intractable past ~64; use the C++ CG oracle
    if use_cg:
        from multigrid_feanet_tpu import oracle
    for i in range(num_samples):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        f = np.asarray(rhs.gaussian_random_field(k1, H, alpha=alpha), dtype=np.float64)
        bc_field = np.asarray(rhs.gaussian_random_field(k2, H, alpha=alpha), dtype=np.float64)
        bc = bc_field * boundary_ring.astype(np.float64)
        if use_cg:
            u, iters, res = oracle.solve(n, f, phase=None, coefficients=(1.0, 1.0),
                                         bc=bc, tol=1e-11)
            assert iters > 0, "oracle CG did not converge"
        else:
            u = fem.solve_dirichlet(n, f, bc_value=bc)
        us.append(u.astype(np.float32))
        fs.append(f.astype(np.float32))
        bvs.append(bc.astype(np.float32))
        bis.append(bc_index)
    return IsoPoissonDataset(
        u=np.stack(us), f=np.stack(fs), bc_value=np.stack(bvs), bc_index=np.stack(bis)
    )


@dataclasses.dataclass
class ElasticDataset:
    """(u*, f) pairs for the elastic learned-iterator family: displacement
    solutions and raw 2-component body-force fields, zero Dirichlet ring.
    Body forces come from the same six RHS families as the scalar sets
    (reference: Data/RHS/generate_rhs.py)."""

    u: np.ndarray  # (N, 2, H, H)
    f: np.ndarray  # (N, 2, H, H)

    def __len__(self):
        return self.u.shape[0]

    def __getitem__(self, idx):
        return self.u[idx], self.f[idx]


def generate_elastic(n: int, num_samples: int, seed: int = 0, E: float = 1.0,
                     nu: float = 0.3, size: float = 2.0, phase: np.ndarray | None = None,
                     coefficients=(1.0, 1.0), plane: str = "stress") -> ElasticDataset:
    """Elastic dataset via the dense f64 FEM oracle (data/fem.py
    solve_dirichlet_elastic, mirroring the reference's MATLAB elasticity
    ground truths, Archive/FEM/matlab_elasticity/Plane_Stress_modify.m)."""
    H = n + 1
    key = jax.random.PRNGKey(seed)
    forces = np.asarray(
        rhs.make_dataset(key, H, 2 * num_samples), dtype=np.float64
    ).reshape(num_samples, 2, H, H)
    us = []
    for i in range(num_samples):
        u = fem.solve_dirichlet_elastic(
            n, forces[i], E=E, nu=nu, size=size, phase=phase,
            coefficients=coefficients, plane=plane,
        )
        us.append(u.astype(np.float32))
    return ElasticDataset(u=np.stack(us), f=forces.astype(np.float32))


def save_elastic(ds: ElasticDataset, path: str) -> None:
    with h5py.File(path, "w") as h5:
        h5["u"] = ds.u
        h5["force"] = ds.f


def load_elastic(path: str) -> ElasticDataset:
    with h5py.File(path, "r") as h5:
        return ElasticDataset(u=np.asarray(h5["u"]), f=np.asarray(h5["force"]))


def save_isopoisson(ds: IsoPoissonDataset, path: str) -> None:
    with h5py.File(path, "w") as h5:
        h5["u"] = ds.u
        h5["rhs"] = ds.f
        h5["boundary_value"] = ds.bc_value
        h5["boundary_index"] = ds.bc_index


def save_rhs(path: str, train: np.ndarray, test: np.ndarray) -> None:
    """Write an RHS dataset in the reference's layout (train/test keys)."""
    with h5py.File(path, "w") as h5:
        h5["train"] = train
        h5["test"] = test


def generate_isopoisson_pbc(n: int, num_samples: int, seed: int = 0) -> IsoPoissonPBCDataset:
    """Recreate the periodic RHS dataset (the reference's missing
    poisson2d_*_pbc.h5: stores f fields only, Data/dataset.py:53-69).
    Fields are (n+1)^2 wrapped GRFs (periodic by construction on the torus).
    """
    key = jax.random.PRNGKey(seed)
    fs = []
    for i in range(num_samples):
        k = jax.random.fold_in(key, i)
        f_unique = rhs.gaussian_random_field(k, n, alpha=4.0)
        wrapped = np.asarray(
            jnp.pad(f_unique, ((0, 1), (0, 1)), mode="wrap"), dtype=np.float32
        )
        fs.append(wrapped)
    return IsoPoissonPBCDataset(f=np.stack(fs))


def save_isopoisson_pbc(ds: IsoPoissonPBCDataset, path: str) -> None:
    with h5py.File(path, "w") as h5:
        h5["rhs"] = ds.f
