"""Determinism: identical seeds give bit-identical training trajectories
(the structural JAX answer to the reference's cudnn.deterministic
seeding hygiene, lipschitz.py:283-291)."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu.models import LRVAE
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import make_train_step
from vae_song_tpu.train.loop import init_model


def _run(seed):
    m = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                          encoder_type="mlp", decoder_type="mlp",
                          beta=0.1, alpha=0.1)
    x = np.random.default_rng(0).normal(size=(64, 2)).astype(np.float32)
    params, bs = init_model(m, x, seed=seed)
    tx = make_optimizer(lr=1e-2)
    state = TrainState.create(params, bs, tx)
    step = make_train_step(m, tx)
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    for i in range(5):
        state, metrics = step(state, jnp.asarray(x), jnp.float32(1.0), keys[i])
    return jax.device_get(state.params), float(metrics["loss"])


def test_same_seed_bitwise_identical():
    p1, l1 = _run(7)
    p2, l2 = _run(7)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_different_seed_differs():
    p1, l1 = _run(7)
    p3, l3 = _run(8)
    assert l1 != l3
