"""End-to-end ML-FLIP: generate data -> train -> NN inside the sim loop.

Covers the reference example2_liquid pipeline (manta_gendata.py ->
tf_train.py -> manta_mlflip.py) at a test-sized dam."""

import numpy as np
import jax.numpy as jnp
import pytest

from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ml import mlflip
from mantaflow_tpu.models import flip as fm


@pytest.fixture(scope="module")
def pipeline():
    dom = Domain(size=(20, 20, 20), dim=3)
    params = fm.FlipParams(gravity=(0.0, -0.01, 0.0), cg_accuracy=1e-3,
                           flip_ratio=0.97)
    feats, labels, modvels, state = mlflip.generate_training_data(
        dom, params, n_frames=8, window=1)
    return dom, params, feats, labels, modvels, state


def test_datagen_produces_candidates(pipeline):
    dom, params, feats, labels, modvels, state = pipeline
    assert feats.shape[0] == labels.shape[0] == modvels.shape[0]
    assert feats.shape[0] > 50            # surface candidates found
    assert feats.shape[1] == 27 * 3 + 27  # vel window + phi window
    assert np.isfinite(feats).all() and np.isfinite(modvels).all()
    # sim stayed sane
    assert np.isfinite(np.asarray(state.vel)).all()


def test_train_reduces_loss(pipeline):
    dom, params, feats, labels, modvels, _ = pipeline
    net, net_params, scale, losses = mlflip.train(
        feats, labels, modvels, hidden=16, n_steps=60, batch=64)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_nn_runs_inside_sim(pipeline):
    dom, params, feats, labels, modvels, _ = pipeline
    net, net_params, scale, _ = mlflip.train(
        feats, labels, modvels, hidden=16, n_steps=30, batch=64)
    state = mlflip.make_mlflip_state(dom, params)
    out = mlflip.run_with_net(state, dom, params, net, net_params, scale,
                              n_steps=5)
    assert np.isfinite(np.asarray(out.vel)).all()
    assert np.isfinite(np.asarray(out.pvel)).all()
    assert int(out.ts.count) == 5
    # ptype stays within the fluid/empty vocabulary for active particles
    act = np.asarray(out.parts.active_mask())
    pt = np.asarray(out.ptype)[act]
    assert np.isin(pt, [fl.TypeFluid, fl.TypeEmpty]).all()


def test_plain_gendata_step_matches_flip_semantics():
    """Without a net, the mlflip step is a valid FLIP step (different
    position integrator split, same invariants): particle count constant,
    fluid cells marked from particles."""
    dom = Domain(size=(16, 16, 16), dim=3)
    params = fm.FlipParams(gravity=(0.0, -0.005, 0.0), cg_accuracy=1e-3)
    state = mlflip.make_mlflip_state(dom, params)
    n0 = int(state.parts.count)
    import jax
    step = jax.jit(lambda s: mlflip.mlflip_step(s, dom, params))
    for _ in range(4):
        state = step(state)
    assert int(state.parts.count) == n0
    n_fluid = int(jnp.sum(fl.is_fluid(state.flags)))
    assert n_fluid > 0
    assert np.isfinite(np.asarray(state.vel)).all()
