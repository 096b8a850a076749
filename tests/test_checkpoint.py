"""Checkpoint/resume of the training loops (reference saves a torch
state_dict every epoch — M-FEANet-learn_iterator.ipynb cell 8; here
utils/checkpoint.save_training + automatic resume inside learn/*.py train)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy, build_level
from multigrid_feanet_tpu.data import rhs, datasets
from multigrid_feanet_tpu.learn import train_hnet, train_intergrid
from multigrid_feanet_tpu.utils import checkpoint


def _tiny_hnet_dataset(n=8, N=6):
    lv = build_level(Problem(n=n, dtype=jnp.float32), n)
    return lv, datasets.generate_isopoisson(n, num_samples=N, seed=0)


def test_save_load_training_roundtrip(tmp_path):
    state = train_hnet.init_state(_tiny_hnet_dataset()[0], seed=0)
    checkpoint.save_training(str(tmp_path), state, 7, [1.0, 0.5])
    s2, epoch, losses = checkpoint.load_training(str(tmp_path), state)
    assert epoch == 7 and losses == [1.0, 0.5]
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_training_cold_start(tmp_path):
    state = train_hnet.init_state(_tiny_hnet_dataset()[0], seed=0)
    s2, epoch, losses = checkpoint.load_training(str(tmp_path / "none"), state)
    assert epoch == 0 and losses == [] and s2 is state


def test_hnet_train_resume_matches_straight_run(tmp_path):
    lv, ds = _tiny_hnet_dataset()
    kw = dict(batch_size=3, seed=0, k_max=4, verbose=False)
    p_full, l_full = train_hnet.train(lv, ds, num_epochs=4, **kw)
    # interrupted run: 2 epochs checkpointed, then resumed to 4
    ck = str(tmp_path / "hnet")
    train_hnet.train(lv, ds, num_epochs=2, ckpt_dir=ck, **kw)
    p_res, l_res = train_hnet.train(lv, ds, num_epochs=4, ckpt_dir=ck, **kw)
    assert len(l_res) == 4
    np.testing.assert_allclose(np.asarray(l_res), np.asarray(l_full), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_res), np.asarray(p_full), rtol=1e-6)


def test_intergrid_train_resume(tmp_path):
    hier = GridHierarchy.create(Problem(n=16, dtype=jnp.float32), 3)
    F = rhs.make_dataset(jax.random.PRNGKey(0), 17, 6)
    kw = dict(batch_size=3, seed=0, m=3, m0=1, verbose=False)
    p_full, l_full = train_intergrid.train(hier, F, num_epochs=3, **kw)
    ck = str(tmp_path / "ig")
    train_intergrid.train(hier, F, num_epochs=1, ckpt_dir=ck, **kw)
    p_res, l_res = train_intergrid.train(hier, F, num_epochs=3, ckpt_dir=ck, **kw)
    assert len(l_res) == 3
    np.testing.assert_allclose(np.asarray(l_res), np.asarray(l_full), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
