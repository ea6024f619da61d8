"""Checkpoint backends: pickle roundtrip + orbax roundtrip."""

import os

import numpy as np
import jax
import pytest

from vae_song_tpu.models import LRVAE
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train import checkpoint as ck


@pytest.fixture
def state():
    m = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                          encoder_type="mlp", decoder_type="mlp")
    x = np.random.default_rng(0).normal(size=(16, 2)).astype(np.float32)
    params, bs = init_model(m, x, seed=0)
    return TrainState.create(params, bs, make_optimizer(lr=1e-3))


def _assert_state_equal(a, b):
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pickle_roundtrip(tmp_path, state):
    p = str(tmp_path / "ck.pkl")
    ck.save_checkpoint(p, state, epoch=3, extra={"note": "x"})
    st2, ep, extra = ck.load_checkpoint(p, state)
    assert ep == 3 and extra["note"] == "x"
    _assert_state_equal(state, st2)


def test_orbax_roundtrip(tmp_path, state):
    p = str(tmp_path / "ck_orbax")
    ck.save_checkpoint_orbax(p, state, epoch=7)
    st2, ep = ck.load_checkpoint_orbax(p, state)
    assert ep == 7
    _assert_state_equal(state, st2)


def test_params_only_roundtrip(tmp_path, state):
    p = str(tmp_path / "model.pkl")
    ck.save_params_only(p, state.params, state.batch_stats)
    params, bs = ck.load_params_only(p, state.params, state.batch_stats)
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
