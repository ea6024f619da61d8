"""Scanned (fully on-device) trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.models import LRVAE
from vae_song_tpu.train.scan import make_scanned_trainer, precompute_alphas
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.ops.warmup import warmup_alpha


def test_precompute_alphas_matches_stateful_loop():
    epochs = 17
    arr = precompute_alphas(epochs, "linear", initial_alpha=0.0)
    alpha = 0.0
    for e in range(epochs):
        alpha = warmup_alpha(alpha, e, epochs, "linear")
        assert float(arr[e]) == pytest.approx(alpha, rel=1e-6)
    assert precompute_alphas(epochs, "kl_adaptive") is None


def test_scanned_training_decreases_loss(key):
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp",
                          beta=0.1, alpha=0.1)
    X = np.random.default_rng(0).normal(size=(512, 2)).astype(np.float32)
    params, bs = init_model(m, X[:64], seed=0)
    tx = make_optimizer(lr=1e-2)
    state = TrainState.create(params, bs, tx)
    epochs = 30
    fit = make_scanned_trainer(m, tx, batch_size=64, epochs=epochs,
                               grad_mode="composite")
    alphas = precompute_alphas(epochs, "linear", initial_alpha=1.0)
    state2, last = fit(state, jnp.asarray(X), alphas, key)
    # step counter advanced the full run: epochs * (512 // 64)
    assert int(state2.step) == epochs * 8
    assert np.isfinite(float(last["loss"]))

    # fresh run for the early-loss comparison (fit donates its input)
    state3 = TrainState.create(*init_model(m, X[:64], seed=0), tx)
    fit1 = make_scanned_trainer(m, tx, batch_size=64, epochs=1,
                                grad_mode="composite")
    _, first = fit1(state3, jnp.asarray(X), precompute_alphas(1, "linear", initial_alpha=1.0), key)
    assert float(last["loss"]) < float(first["loss"])


def test_scanned_kl_adaptive_runs(key):
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp",
                          beta=0.5, alpha=0.1)
    X = np.random.default_rng(1).normal(size=(256, 2)).astype(np.float32)
    params, bs = init_model(m, X[:64], seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    fit = make_scanned_trainer(m, tx, batch_size=64, epochs=5,
                               grad_mode="composite", kl_adaptive=True)
    state2, last = fit(state, jnp.asarray(X), None, key)
    assert np.isfinite(float(last["loss"]))
