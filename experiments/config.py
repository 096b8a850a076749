"""Experiment configuration — one dataclass per experiment, defaults equal to
the reference's hard-coded hyperparameters (SURVEY.md section 5: the
reference has no config system; values live in notebook cells)."""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class SolverConfig:
    n: int = 64
    size: float = 2.0
    omega: float = 2.0 / 3.0  # reference: FEANet/multigrid.py:22
    coefficients: Tuple[float, float] = (1.0, 20.0)  # reference: multigrid.py:23
    inclusion: Optional[str] = None  # None | "circle" | "rect"
    radius: float = 0.5
    nu1: int = 1
    nu2: int = 1
    eps: float = 1e-6
    max_cycles: int = 400
    dtype: str = "float32"
    backend: str = "auto"  # "xla" | "pallas" | "auto"

    def inclusion_spec(self):
        if self.inclusion is None:
            return None
        return (self.inclusion, (0.0, 0.0), self.radius)


@dataclasses.dataclass
class HNetTrainConfig:
    n: int = 32
    num_layers: int = 3  # reference: mg_test cell 5 nb_layers=3
    batch_size: int = 5  # reference: HJacIterator batch_size=5
    max_epochs: int = 1000
    k_max: int = 20  # reference: random.randint(1, 20)
    seed: int = 0
    dataset: str = "/root/reference/Data/IsoPoisson/poisson2d_33x33.h5"
    out_dir: str = "results/learn_iterator"


@dataclasses.dataclass
class IntergridTrainConfig:
    n: int = 64
    m: int = 6  # reference: multigrid.py:83
    m0: int = 2  # reference: multigrid.py:81
    batch_size: int = 64  # reference: kernel_split_res cell 2
    epochs: int = 300
    lr: float = 1e-3  # reference: Adam(lr=1e-3)
    train_kernel: Optional[int] = None  # per-kernel curriculum index
    seed: int = 0
    rhs_n: int = 17
    rhs_count: int = 120
    out_dir: str = "results/learn_intergrid"


def from_args(cls, argv=None):
    """CLI override of any dataclass field: --field value (json-parsed)."""
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(cls):
        parser.add_argument(f"--{f.name}", type=str, default=None)
    ns = parser.parse_args(argv)
    kwargs = {}
    for f in dataclasses.fields(cls):
        v = getattr(ns, f.name)
        if v is None:
            continue
        try:
            kwargs[f.name] = json.loads(v)
        except json.JSONDecodeError:
            kwargs[f.name] = v
    return cls(**kwargs)
