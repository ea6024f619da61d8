"""Pipeline parallelism on the REAL SetVAE (parallel/pp_setvae.py):
the pipelined encoder-stack train step must match the single-device
composite step — loss, gradients (via the sgd(1.0) delta trick), and
param-tree round-tripping."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vae_song_tpu.models import SetLRVAE, SetVAE
from vae_song_tpu.parallel.pp import make_pp_mesh
from vae_song_tpu.parallel.pp_setvae import (
    make_dp_pp_mesh,
    make_setvae_pp_train_step,
    merge_params,
    shard_pp_setvae_state,
    split_params,
)
from vae_song_tpu.train.loop import init_model

B, N = 8, 32
N_LAYERS = 4


def _model():
    return SetVAE(latent_channel=8, num_points=N, d_model=16, num_heads=2,
                  ff_dim=32, beta=0.1, num_encoder_layers=N_LAYERS,
                  num_decoder_layers=1)


def _data():
    return np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)


def _single_device_grads(model, params, x, wu):
    """Composite gradient of the real model path with z = mu."""

    def loss_fn(p):
        outs = model.apply(
            {"params": p}, x, latent_rand_sampling=False, train=True,
        )
        total, *_ = model.loss(x, *outs, wu_alpha=wu)
        return total

    return jax.value_and_grad(loss_fn)(params)


def test_split_merge_roundtrip():
    model = _model()
    params, _ = init_model(model, _data()[:2], seed=0)
    pp = split_params(params, N_LAYERS)
    back = merge_params(pp, N_LAYERS)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 2)])
def test_pp_setvae_matches_single_device(n_stages, n_micro):
    model = _model()
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    wu = jnp.float32(1.0)

    want_loss, want_grads = _single_device_grads(model, params, jnp.asarray(x), wu)

    mesh = make_pp_mesh(n_stages)
    tx = optax.sgd(1.0)  # params - new_params == pipelined gradient
    pp = split_params(params, N_LAYERS)
    pp_host = jax.tree.map(np.asarray, pp)  # step donates its inputs
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro,
                                     latent_rand_sampling=False)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    new_pp, _, metrics = step(p_sh, o_sh, jnp.asarray(x), wu,
                              jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    got_grads = merge_params(
        jax.tree.map(lambda a, b: a - b, pp_host, jax.device_get(new_pp)),
        N_LAYERS,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got_grads)[0],
        jax.tree_util.tree_flatten_with_path(want_grads)[0],
    ):
        # atol floor: the params-minus-new-params extraction loses the
        # low f32 bits of tiny gradient entries to the subtraction
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_setlrvae_matches_single_device():
    """SetLRVAE under PP: the latent-recon re-encode runs the pipeline a
    SECOND time — gradients (detached-z decode, re-encode path through
    both passes' collective transposes) must equal the single-device
    composite step."""
    model = SetLRVAE(latent_channel=8, num_points=N, d_model=16, num_heads=2,
                     ff_dim=32, beta=0.1, alpha=0.01,
                     num_encoder_layers=N_LAYERS, num_decoder_layers=1)
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    wu = jnp.float32(1.0)

    want_loss, want_grads = _single_device_grads(model, params, jnp.asarray(x), wu)
    # the latent-recon term must be live, else the second pipeline pass
    # contributes nothing and this test reduces to the SetVAE one
    lr_term = float(model.loss(
        jnp.asarray(x),
        *model.apply({"params": params}, jnp.asarray(x),
                     latent_rand_sampling=False, train=True),
        wu_alpha=wu,
    )[3])
    assert lr_term > 0.0, lr_term

    mesh = make_pp_mesh(2)
    tx = optax.sgd(1.0)
    pp = split_params(params, N_LAYERS)
    pp_host = jax.tree.map(np.asarray, pp)
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro=4,
                                     latent_rand_sampling=False)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    new_pp, _, metrics = step(p_sh, o_sh, jnp.asarray(x), wu,
                              jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    assert float(metrics["lr"]) > 0.0
    got_grads = merge_params(
        jax.tree.map(lambda a, b: a - b, pp_host, jax.device_get(new_pp)),
        N_LAYERS,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got_grads)[0],
        jax.tree_util.tree_flatten_with_path(want_grads)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_dp_pp_setvae_matches_single_device():
    """Combined DP x PP on a 2x2 ('data','stage') mesh: batch shards
    across two pipelines, grads pmean across them — must equal the MEAN
    of the two shards' single-device composite gradients (DP's exact
    semantics). The full-batch composite gradient is NOT bit-comparable:
    the decoder's batch-constant first self-attention sums its broadcast
    cotangent over the batch BEFORE _xla_attention's by-design bf16
    backward matmuls, so batch-split vs full-batch gradients differ at
    the documented ~1e-3 bf16 level (ops/attention.py:84) — the loss,
    computed before any bf16 cotangent rounding, IS checked against the
    full batch."""
    model = _model()
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    wu = jnp.float32(1.0)

    want_loss, _ = _single_device_grads(model, params, jnp.asarray(x), wu)
    _, g_a = _single_device_grads(model, params, jnp.asarray(x[:4]), wu)
    _, g_b = _single_device_grads(model, params, jnp.asarray(x[4:]), wu)
    want_grads = jax.tree.map(lambda a, b: (a + b) / 2, g_a, g_b)

    mesh = make_dp_pp_mesh(2, 2)
    tx = optax.sgd(1.0)  # params - new_params == gradient
    pp = split_params(params, N_LAYERS)
    pp_host = jax.tree.map(np.asarray, pp)
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro=2,
                                     latent_rand_sampling=False)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    new_pp, _, metrics = step(p_sh, o_sh, jnp.asarray(x), wu,
                              jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    got_grads = merge_params(
        jax.tree.map(lambda a, b: a - b, pp_host, jax.device_get(new_pp)),
        N_LAYERS,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got_grads)[0],
        jax.tree_util.tree_flatten_with_path(want_grads)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_dp_pp_rand_sampling_decorrelates_shards():
    """Under DP x PP with latent_rand_sampling, the two data rows must
    draw DIFFERENT eps (fold_in of the row index): one Adam step from
    identical shard inputs must produce a different result than the
    pure-PP step that draws a single shared eps."""
    model = _model()
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    params = jax.tree.map(np.asarray, params)  # steps donate their inputs
    tx = optax.adam(1e-3)
    # identical data in both shards: any output difference can only
    # come from the eps stream
    x_twin = np.concatenate([x[:4], x[:4]], axis=0)

    pp = split_params(jax.tree.map(jnp.asarray, params), N_LAYERS)
    step_dp = make_setvae_pp_train_step(model, tx, make_dp_pp_mesh(2, 2),
                                        n_micro=2)
    p1, _, _ = step_dp(*shard_pp_setvae_state(pp, tx.init(pp),
                                              make_dp_pp_mesh(2, 2), tx),
                       jnp.asarray(x_twin), jnp.float32(1.0),
                       jax.random.PRNGKey(0))
    pp = split_params(jax.tree.map(jnp.asarray, params), N_LAYERS)
    step_pp = make_setvae_pp_train_step(model, tx, make_pp_mesh(2), n_micro=2)
    p2, _, _ = step_pp(*shard_pp_setvae_state(pp, tx.init(pp),
                                              make_pp_mesh(2), tx),
                       jnp.asarray(x[:4]), jnp.float32(1.0),
                       jax.random.PRNGKey(0))
    deltas = [
        float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                        jax.tree.leaves(jax.device_get(p2)))
    ]
    assert max(deltas) > 1e-7, deltas


def test_pp_setvae_adam_step_trains():
    """Stochastic smoke test: a few pipelined Adam steps reduce the loss
    and keep everything finite."""
    model = _model()
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    mesh = make_pp_mesh(4)
    tx = optax.adam(1e-3)
    pp = split_params(params, N_LAYERS)
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro=2)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    losses = []
    for i in range(5):
        p_sh, o_sh, m = step(p_sh, o_sh, jnp.asarray(x), jnp.float32(1.0),
                             jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]


def test_pp_setvae_rejects_bad_config():
    model = _model()
    mesh = make_pp_mesh(3)  # 4 layers don't divide over 3 stages
    with pytest.raises(ValueError):
        make_setvae_pp_train_step(model, optax.adam(1e-3), mesh, n_micro=2)


def test_pp_setvae_grad_clip_matches_optax():
    """Norm clip under PP must use the true global norm (stage-local
    enc_stack slices psum'd, replicated pre/post counted once) — equal
    to optax.clip_by_global_norm of the single-device composite
    gradient. sgd(1.0) so the param delta IS the clipped gradient."""
    clip_cfg = {"enabled": True, "clip_type": "norm", "max_norm": 0.05}
    model = _model()
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    wu = jnp.float32(1.0)

    _, want_grads = _single_device_grads(model, params, jnp.asarray(x), wu)
    clip = optax.clip_by_global_norm(0.05)
    want_clipped, _ = clip.update(want_grads, clip.init(params))
    # the clip must bind, else this test is vacuous
    raw_norm = float(optax.global_norm(want_grads))
    assert raw_norm > 0.05, raw_norm

    mesh = make_pp_mesh(2)
    tx = optax.sgd(1.0)
    pp = split_params(params, N_LAYERS)
    pp_host = jax.tree.map(np.asarray, pp)
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro=4,
                                     latent_rand_sampling=False,
                                     grad_clip=clip_cfg)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    new_pp, _, _ = step(p_sh, o_sh, jnp.asarray(x), wu, jax.random.PRNGKey(0))
    got = merge_params(
        jax.tree.map(lambda a, b: a - b, pp_host, jax.device_get(new_pp)),
        N_LAYERS,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got)[0],
        jax.tree_util.tree_flatten_with_path(want_clipped)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-7,
            err_msg=f"clipped-gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_opt_state_split_merge_roundtrip():
    """split_opt_state must equal tx.init on the split params (fresh
    run) and merge back to the full-format state exactly — the resume
    path restores Adam moments through this round trip."""
    from vae_song_tpu.parallel.pp_setvae import merge_opt_state, split_opt_state
    from vae_song_tpu.train.state import make_optimizer

    model = _model()
    params, _ = init_model(model, _data()[:2], seed=0)
    tx = make_optimizer(lr=1e-3, total_steps=100,
                        grad_clip=None)
    full = tx.init(params)
    pp = split_params(params, N_LAYERS)

    got_split = split_opt_state(full, params, N_LAYERS)
    want_split = tx.init(pp)
    assert jax.tree.structure(got_split) == jax.tree.structure(want_split)
    for a, b in zip(jax.tree.leaves(got_split), jax.tree.leaves(want_split)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    back = merge_opt_state(got_split, pp, N_LAYERS)
    assert jax.tree.structure(back) == jax.tree.structure(full)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_rejects_dropout():
    model = SetVAE(latent_channel=8, num_points=N, d_model=16, num_heads=2,
                   ff_dim=32, beta=0.1, num_encoder_layers=N_LAYERS,
                   num_decoder_layers=1, attn_dropout=0.1)
    mesh = make_pp_mesh(2)
    with pytest.raises(NotImplementedError):
        make_setvae_pp_train_step(model, optax.adam(1e-3), mesh, n_micro=2)


def test_pp_rejects_moe():
    """moe_experts under PP would die at apply() with an opaque flax
    missing-param error (the PP step rebuilds layers with dense FFNs) —
    it must refuse at construction with the real reason."""
    model = SetVAE(latent_channel=8, num_points=N, d_model=16, num_heads=2,
                   ff_dim=32, beta=0.1, num_encoder_layers=N_LAYERS,
                   num_decoder_layers=1, moe_experts=4)
    mesh = make_pp_mesh(2)
    with pytest.raises(NotImplementedError, match="moe_experts"):
        make_setvae_pp_train_step(model, optax.adam(1e-3), mesh, n_micro=2)


def test_pp_remat_matches_single_device():
    """model.remat must carry into the PP step (recompute-in-backward is
    an identity on the gradients, so the non-remat parity bound holds)."""
    model = SetVAE(latent_channel=8, num_points=N, d_model=16, num_heads=2,
                   ff_dim=32, beta=0.1, num_encoder_layers=N_LAYERS,
                   num_decoder_layers=1, remat=True)
    x = _data()
    params, _ = init_model(model, x[:2], seed=0)
    wu = jnp.float32(1.0)
    want_loss, want_grads = _single_device_grads(model, params, jnp.asarray(x), wu)

    mesh = make_pp_mesh(2)
    tx = optax.sgd(1.0)
    pp = split_params(params, N_LAYERS)
    pp_host = jax.tree.map(np.asarray, pp)
    step = make_setvae_pp_train_step(model, tx, mesh, n_micro=2,
                                     latent_rand_sampling=False)
    p_sh, o_sh = shard_pp_setvae_state(pp, tx.init(pp), mesh, tx)
    new_pp, _, metrics = step(p_sh, o_sh, jnp.asarray(x), wu,
                              jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    got_grads = merge_params(
        jax.tree.map(lambda a, b: a - b, pp_host, jax.device_get(new_pp)),
        N_LAYERS,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got_grads)[0],
        jax.tree_util.tree_flatten_with_path(want_grads)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )
