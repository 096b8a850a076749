"""Learned inter-grid operators: init-parity with classical transfers,
torch-checkpoint import, and q_m training."""

import glob

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_feanet_tpu.core.problem import Problem, GridHierarchy
from multigrid_feanet_tpu.models import intergrid
from multigrid_feanet_tpu.models.intergrid import IntergridParams
from multigrid_feanet_tpu.ops import stencil, transfer
from multigrid_feanet_tpu.solvers import multigrid


def _hier(n=16, bimaterial=True):
    incl = ("circle", (0.0, 0.0), 0.5) if bimaterial else None
    return GridHierarchy.create(Problem(n=n, inclusion=incl, dtype=jnp.float32))


def test_init_restriction_matches_classical():
    """At init (full-weighting/16 on all channels, w=[4,1]) the learned
    restriction of a split field equals 4x the classical full weighting,
    because the per-channel masks partition unity."""
    hier = _hier(32)
    params = IntergridParams.init()
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((2, 33, 33)), dtype=jnp.float32)
    learned = intergrid.restrict_learned(params, r, hier.finest.pid)
    classical = 4.0 * transfer.restrict_full_weighting(r)
    np.testing.assert_allclose(np.asarray(learned), np.asarray(classical), rtol=1e-5, atol=1e-5)


def test_init_prolongation_matches_classical():
    hier = _hier(32)
    params = IntergridParams.init()
    rng = np.random.default_rng(1)
    v_c = jnp.asarray(rng.standard_normal((2, 17, 17)), dtype=jnp.float32)
    learned = intergrid.prolong_learned(params, v_c, hier.levels[1].pid)
    classical = transfer.prolong_bilinear(v_c)  # no geo mask: deconv output
    # interior must match (the deconv's boundary differs from bilinear's
    # align-corners edge handling only on the outermost ring)
    np.testing.assert_allclose(
        np.asarray(learned)[:, 1:-1, 1:-1], np.asarray(classical)[:, 1:-1, 1:-1],
        rtol=1e-5, atol=1e-5,
    )


def test_learned_vcycle_at_init_converges_like_classical():
    hier = _hier(32)
    params = IntergridParams.init()
    f_raw = jnp.ones((1, 33, 33), dtype=jnp.float32)
    f = stencil.apply_mass(f_raw, hier.finest.h)
    u = jnp.zeros_like(f)
    hist = []
    for _ in range(20):
        u = intergrid.learned_v_cycle(hier, params, u, f)
        r = f - hier.finest.apply(u)
        hist.append(float(jnp.linalg.norm(r[0, 1:-1, 1:-1])))
    assert hist[-1] < 1e-5
    # contraction factor sane for the interface problem at V(1,1); measured
    # mid-decay (the tail sits on the f32 rounding plateau)
    q = hist[9] / hist[8]
    assert q < 0.8


def test_torch_checkpoint_import():
    paths = sorted(glob.glob(
        "/root/reference/Model/learn_intergrid_operator/multigrid_rhs_res/*.pth"
    ))
    if not paths:
        pytest.skip("no reference checkpoints")
    params = intergrid.import_torch_checkpoint(paths[0])
    assert params.conv.shape == (16, 3, 3)
    assert params.deconv.shape == (16, 3, 3)
    assert params.w.shape == (2,)
    np.testing.assert_allclose(np.asarray(params.w), [4.0, 1.0])
    # the trained channel deviates from the full-weighting init; untouched
    # channels do not (per-kernel curriculum).  Numerical parity of cycles
    # run with these params is covered by tests/test_reference_parity.py
    # (the checkpoint itself converges only slowly even in the reference's
    # own evaluator, q ~ 0.82 at n=64).
    # untrained channels share their init value (this run initialized R with
    # the /4 kernel); exactly the curriculum channel deviates
    for kernels, init_candidates in [
        (np.asarray(params.conv), (intergrid.FULL_WEIGHTING_16, intergrid.BILINEAR_4)),
        (np.asarray(params.deconv), (intergrid.BILINEAR_4,)),
    ]:
        frozen = max(
            (np.abs(kernels - init).max(axis=(1, 2)) < 1e-6).sum()
            for init in init_candidates
        )
        assert frozen >= 15, frozen
        assert frozen < 16  # one trained channel deviates


def test_train_step_improves_qm_twogrid():
    """Two-grid homogeneous training sanity (the reference's TwoGrid
    precursor, Archive homo_kernel_twogrid): a few steps of Adam on q_m
    should not diverge and should reduce the loss on average."""
    from multigrid_feanet_tpu.learn import train_intergrid

    problem = Problem(n=16, inclusion=("circle", (0.0, 0.0), 0.5), dtype=jnp.float32)
    hier = GridHierarchy.create(problem, num_levels=2)
    key = jax.random.PRNGKey(0)
    from multigrid_feanet_tpu.data import rhs as rhs_mod

    F = rhs_mod.make_dataset(key, 17, 12)
    state = train_intergrid.init_state(0)
    losses = []
    for step in range(30):
        state, loss = train_intergrid.train_step(
            hier, state, F.astype(jnp.float32), m=6, m0=2
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_grad_mask_curriculum():
    from multigrid_feanet_tpu.learn import train_intergrid

    params = IntergridParams.init()
    mask = train_intergrid._grad_mask(params, train_kernel=3)
    m = np.asarray(mask.conv)
    assert m[3].sum() == 9.0 and m.sum() == 9.0
    assert np.asarray(mask.w).sum() == 0.0
