"""Expert parallelism (parallel/ep.py): the all_to_all-dispatched MoE
must match the dense (all-experts-local) evaluation, forward and
through a training step.

Routing and capacity are decided per token shard (each device routes
its own tokens — the standard EP semantics), so the dense reference is
evaluated shard-by-shard with the same capacity."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vae_song_tpu.parallel.ep import (
    EXPERT_AXIS,
    MoEParams,
    init_moe,
    make_ep_apply,
    make_ep_mesh,
    make_ep_train_step,
    moe_ffn_dense,
    shard_moe,
    shard_moe_opt,
)

E = 8          # experts == devices
D = 12         # d_model (!= E so no shape ambiguity in the opt specs)
H = 24
T_LOCAL = 16   # tokens per device


def _setup(seed=0):
    params = init_moe(jax.random.PRNGKey(seed), D, H, E)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (E * T_LOCAL, D))
    return params, x


def _dense_per_shard(params, x, capacity_factor):
    outs = [
        moe_ffn_dense(params, x[i * T_LOCAL:(i + 1) * T_LOCAL], capacity_factor)
        for i in range(E)
    ]
    return jnp.concatenate(outs, axis=0)


def test_ep_forward_matches_dense():
    params, x = _setup()
    cf = float(E)  # capacity == all local tokens: nothing dropped
    want = _dense_per_shard(params, x, cf)

    mesh = make_ep_mesh(E)
    fn = make_ep_apply(mesh, E, capacity_factor=cf)
    got = fn(shard_moe(params, mesh), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ep_forward_with_capacity_drops():
    """Tight capacity (cf=1.0): overflow tokens get zero output in both
    implementations, identically."""
    params, x = _setup(seed=3)
    cf = 1.0
    want = _dense_per_shard(params, x, cf)

    mesh = make_ep_mesh(E)
    fn = make_ep_apply(mesh, E, capacity_factor=cf)
    got = fn(shard_moe(params, mesh), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # with 8 experts and 16 tokens/shard, some token rows must be dropped
    assert np.any(np.all(np.asarray(got) == 0.0, axis=-1))


def test_ep_train_step_matches_dense():
    """One SGD step: expert grads complete without collectives, router
    grads psum'd — equal to the dense single-device gradient."""
    params, x = _setup(seed=5)
    target = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    cf = float(E)
    tx = optax.sgd(0.1)

    def dense_loss(p):
        y = _dense_per_shard(p, x, cf)
        return jnp.mean((y - target) ** 2)

    g = jax.grad(dense_loss)(params)
    upd, _ = tx.update(g, tx.init(params), params)
    want = jax.tree.map(lambda p, u: p + u, params, upd)
    # before the step: device_put may alias buffers that donation deletes
    want_loss = float(dense_loss(params))

    mesh = make_ep_mesh(E)
    step = make_ep_train_step(tx, mesh, E, params, capacity_factor=cf)
    p_sh = shard_moe(params, mesh)
    o_sh = shard_moe_opt(tx.init(params), tx, params, mesh, E)
    new_params, _, loss = step(p_sh, o_sh, x, target)

    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_ep_train_step_d_model_equals_n_experts():
    """Regression: adam moments for a [E, E]-shaped router used to be
    misclassified as expert stacks by shape-sniffing when d_model ==
    n_experts; _opt_specs now matches by tree structure."""
    D_sq = E  # the ambiguous configuration
    params = init_moe(jax.random.PRNGKey(3), D_sq, H, E)
    x = jax.random.normal(jax.random.PRNGKey(4), (E * T_LOCAL, D_sq))
    target = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    cf = float(E)
    tx = optax.adam(1e-2)

    def dense_loss(p):
        outs = [
            moe_ffn_dense(p, x[i * T_LOCAL:(i + 1) * T_LOCAL], cf)
            for i in range(E)
        ]
        y = jnp.concatenate(outs, axis=0)
        return jnp.mean((y - target) ** 2)

    g = jax.grad(dense_loss)(params)
    upd, _ = tx.update(g, tx.init(params), params)
    want = jax.tree.map(lambda p, u: p + u, params, upd)
    want_loss = float(dense_loss(params))

    mesh = make_ep_mesh(E)
    step = make_ep_train_step(tx, mesh, E, params, capacity_factor=cf)
    p_sh = shard_moe(params, mesh)
    o_sh = shard_moe_opt(tx.init(params), tx, params, mesh, E)
    new_params, _, loss = step(p_sh, o_sh, x, target)

    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
