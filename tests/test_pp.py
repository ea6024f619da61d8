"""Pipeline parallelism (parallel/pp.py): the GPipe schedule must match
the single-device stacked scan — forward outputs, loss, gradients, and
a full optimizer step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vae_song_tpu.nn.blocks import lrelu
from vae_song_tpu.parallel.pp import (
    make_pp_mesh,
    make_pp_apply,
    make_pp_train_step,
    shard_pp_state,
    stack_block_params,
    scan_blocks,
)

D = 8
N_LAYERS = 8


def _block_apply(layer_params, x):
    """One residual MLP block: x + lrelu(x @ W + b)."""
    return x + lrelu(x @ layer_params["kernel"] + layer_params["bias"])


def _init_layer(key):
    kw, kb = jax.random.split(key)
    return {
        "kernel": jax.random.normal(kw, (D, D)) * 0.1,
        "bias": jax.random.normal(kb, (D,)) * 0.01,
    }


def _params():
    return stack_block_params(_init_layer, jax.random.PRNGKey(0), N_LAYERS)


def _loss(y, target):
    return jnp.mean((y - target) ** 2)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (8, 2), (2, 8)])
def test_pp_forward_matches_scan(n_stages, n_micro):
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, D))
    want = scan_blocks(_block_apply, params, x)

    mesh = make_pp_mesh(n_stages)
    pp_fn = make_pp_apply(_block_apply, mesh, N_LAYERS, n_micro)
    got = pp_fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pp_grads_match_scan():
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, D))
    target = jax.random.normal(jax.random.PRNGKey(2), (16, D))

    def ref_loss(p):
        return _loss(scan_blocks(_block_apply, p, x), target)

    want_loss, want_grads = jax.value_and_grad(ref_loss)(params)

    mesh = make_pp_mesh(4)
    # sgd(1.0): new_params = params - grads, so params - new_params IS
    # the pipelined gradient — a direct per-leaf gradient comparison
    tx = optax.sgd(1.0)
    step = make_pp_train_step(_block_apply, _loss, tx, mesh, N_LAYERS,
                              n_micro=4, example_params=params)
    opt_state = tx.init(params)
    p_sh, o_sh = shard_pp_state(params, opt_state, mesh, tx, N_LAYERS)
    new_params, _, loss = step(p_sh, o_sh, x, target)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    got_grads = jax.tree.map(lambda p, n: p - n, params, new_params)
    for a, b in zip(jax.tree.leaves(got_grads), jax.tree.leaves(want_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pp_train_step_matches_single_device():
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, D))
    target = jax.random.normal(jax.random.PRNGKey(2), (16, D))
    tx = optax.adam(1e-2)

    # single-device reference step
    def ref_loss(p):
        return _loss(scan_blocks(_block_apply, p, x), target)

    opt0 = tx.init(params)
    g = jax.grad(ref_loss)(params)
    upd, _ = tx.update(g, opt0, params)
    want = jax.tree.map(lambda p, u: p + u, params, upd)

    mesh = make_pp_mesh(4)
    step = make_pp_train_step(_block_apply, _loss, tx, mesh, N_LAYERS,
                              n_micro=4, example_params=params)
    p_sh, o_sh = shard_pp_state(params, tx.init(params), mesh, tx, N_LAYERS)
    new_params, _, _ = step(p_sh, o_sh, x, target)

    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pp_rejects_indivisible_layers():
    mesh = make_pp_mesh(3)
    with pytest.raises(ValueError):
        make_pp_apply(_block_apply, mesh, N_LAYERS, 4)
