"""Model-zoo shape/dtype tests under jit, + ICNN convexity and Brenier
monotonicity for LID-VAE."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.models import (
    VanillaVAE,
    LRVAE,
    NaiveAE,
    LIDVAE,
    SetVAE,
    SetLRVAE,
)
from vae_song_tpu.nn.blocks import ICNN


def _init_apply(model, x, key, **kwargs):
    variables = model.init({"params": key, "sampling": key}, x, train=True, **kwargs)
    outs, mut = model.apply(
        variables, x, train=True, rngs={"sampling": key},
        mutable=["batch_stats"], **kwargs,
    )
    return variables, outs


def test_lrvae_pinwheel_shapes(key):
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp",
                          beta=0.01, alpha=0.1)
    x = jax.random.normal(key, (8, 2))
    _, outs = _init_apply(m, x, key, L=3)
    recon, mu, log_var, z, z_rec = outs
    assert recon.shape == (8, 2)
    assert mu.shape == (8, 2) and log_var.shape == (8, 2)
    assert z.shape == (3, 8, 2) and z_rec.shape == (3, 8, 2)
    total, rec, reg, lr = m.loss(x, *outs, wu_alpha=0.5)
    assert np.isfinite(float(total))
    # composite identity: total = rec + reg_scaled + lr_scaled
    assert float(total) == pytest.approx(float(rec) + float(reg) + float(lr), rel=1e-5)


def test_z_is_stop_gradient(key):
    """z stack returned by forward must carry no gradient (detach parity)."""
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp")
    x = jax.random.normal(key, (4, 2))
    variables = m.init({"params": key, "sampling": key}, x, train=True)

    def z_sum(params):
        outs, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"sampling": key}, mutable=["batch_stats"],
        )
        return outs[3].sum()

    g = jax.grad(z_sum)(variables["params"])
    assert all(float(jnp.abs(v).max()) == 0.0 for v in jax.tree.leaves(g))


def test_vanilla_vae_mnist_mlp(key):
    m = VanillaVAE.for_dataset("mnist", hidden_channels=(8, 8), encoder_type="mlp",
                               decoder_type="mlp")
    x = jax.random.uniform(key, (4, 28, 28, 1))
    _, outs = _init_apply(m, x, key)
    assert outs[0].shape == (4, 28, 28, 1)
    assert outs[1].shape == (4, 28)


def test_naive_ae_loss_is_mse_only(key):
    m = NaiveAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp")
    x = jax.random.normal(key, (4, 2))
    _, outs = _init_apply(m, x, key)
    total, rec, reg, lr = m.loss(x, *outs)
    assert float(total) == pytest.approx(float(rec))
    assert float(reg) == 0.0 and float(lr) == 0.0


def test_icnn_convexity(key):
    """ICNN must be convex: f(tx + (1-t)y) <= t f(x) + (1-t) f(y)."""
    icnn = ICNN(hidden_channel=16)
    x = jax.random.normal(key, (32, 2))
    y = jax.random.normal(jax.random.fold_in(key, 1), (32, 2))
    params = icnn.init(key, x)
    f = lambda v: icnn.apply(params, v)
    for t in (0.25, 0.5, 0.75):
        lhs = f(t * x + (1 - t) * y)
        rhs = t * f(x) + (1 - t) * f(y)
        assert np.all(np.asarray(lhs) <= np.asarray(rhs) + 1e-5)


def test_lidvae_brenier_monotone(key):
    """grad of a convex potential is a monotone map:
    <T(z1) - T(z2), z1 - z2> >= 0."""
    m = LIDVAE.for_dataset("pinwheel", hidden_channels=(8, 8, 2), icnn_channels=(16, 16))
    x = jax.random.normal(key, (8, 2))
    variables = m.init({"params": key, "sampling": key}, x, train=True)

    z1 = jax.random.normal(jax.random.fold_in(key, 2), (64, 2))
    z2 = jax.random.normal(jax.random.fold_in(key, 3), (64, 2))
    d1 = m.apply(variables, z1, train=False, method="decode")
    d2 = m.apply(variables, z2, train=False, method="decode")
    inner = ((np.asarray(d1) - np.asarray(d2)) * np.asarray(z1 - z2)).sum(axis=1)
    assert np.all(inner >= -1e-4)


def test_lidvae_trainable_through_decode(key):
    """Differentiating through the Brenier decode (second-order) works."""
    m = LIDVAE.for_dataset("pinwheel", hidden_channels=(8, 2), icnn_channels=(8, 8))
    x = jax.random.normal(key, (4, 2))
    variables = m.init({"params": key, "sampling": key}, x, train=True)

    def loss_fn(params):
        outs, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"sampling": key}, mutable=["batch_stats"],
        )
        total, *_ = m.loss(x, *outs)
        return total

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    assert any(float(jnp.abs(v).sum()) > 0 for v in flat)


def test_setvae_shapes(key):
    m = SetVAE(latent_channel=8, num_points=32, d_model=16, num_heads=2, ff_dim=32)
    pts = jax.random.normal(key, (2, 32, 3))
    _, outs = _init_apply(m, pts, key)
    assert outs[0].shape == (2, 32, 3)
    total, rec, reg, lr = m.loss(pts, *outs)
    assert np.isfinite(float(total))


def test_setlrvae_latent_recon_path(key):
    m = SetLRVAE(latent_channel=8, num_points=16, use_attention=False,
                 encoder_hidden=(16,), decoder_hidden=(16,), alpha=0.1)
    pts = jax.random.normal(key, (2, 16, 3))
    _, outs = _init_apply(m, pts, key)
    assert outs[4] is not None and outs[4].shape == (2, 8)
    total, rec, reg, lr = m.loss(pts, *outs, wu_alpha=1.0)
    assert float(lr) > 0


def test_setvae_mixed_precision_trains(key):
    """mixed_precision=True runs all transformer matmuls in bf16 while
    params stay f32; one train step must stay finite and close to the
    f32 step's loss."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vae_song_tpu.models import SetVAE
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.steps import make_train_step

    pts = np.random.default_rng(0).normal(size=(4, 32, 3)).astype(np.float32)
    losses = {}
    # (mixed_precision, use_flash): flash falls back to XLA attention off
    # TPU (ops/attention.py:_flash_ok), so the third variant exercises
    # the fallback composition on the CPU backend
    for mp_flag, flash in ((False, False), (True, False), (True, True)):
        m = SetVAE(latent_channel=8, num_points=32, d_model=16, num_heads=2,
                   ff_dim=32, beta=0.1, mixed_precision=mp_flag, use_flash=flash)
        params, bs = init_model(m, pts, seed=0)
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
        tx = make_optimizer(lr=1e-3)
        state = TrainState.create(params, bs, tx)
        step = make_train_step(m, tx)
        state, metrics = step(state, jnp.asarray(pts), jnp.float32(0.0), key)
        losses[(mp_flag, flash)] = float(metrics["loss"])
        assert np.isfinite(losses[(mp_flag, flash)])
    # same init => bf16 compute stays within ~1% of the f32 loss
    np.testing.assert_allclose(losses[(True, False)], losses[(False, False)], rtol=1e-2)
    # CPU flash fallback is exactly the XLA bf16 path
    np.testing.assert_allclose(losses[(True, True)], losses[(True, False)], rtol=1e-6)


def test_flexible_mixed_precision_trains(key):
    """mixed_precision on the conv/MLP families: bf16 trunk compute,
    f32 params, f32 (mu, logvar) heads and recon outputs. One train
    step stays finite and within ~1% of the f32 loss; staged LRVAE
    gradients compose with the bf16 trunk."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vae_song_tpu.models import LRVAE, VanillaVAE
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.steps import make_train_step

    x = np.random.default_rng(0).uniform(size=(4, 28, 28, 1)).astype(np.float32)
    for cls, kw in ((VanillaVAE, {}), (LRVAE, {"alpha": 0.1})):
        losses = {}
        for mp_flag in (False, True):
            m = cls.for_dataset(
                "mnist", hidden_channels=(2, 2), encoder_type="conv",
                decoder_type="conv", beta=0.01, mixed_precision=mp_flag, **kw,
            )
            params, bs = init_model(m, x, seed=0)
            assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
            tx = make_optimizer(lr=1e-3)
            state = TrainState.create(params, bs, tx)
            step = make_train_step(m, tx)
            state, metrics = step(state, jnp.asarray(x), jnp.float32(0.1), key)
            losses[mp_flag] = float(metrics["loss"])
            assert np.isfinite(losses[mp_flag])
            # mu/logvar head and recon stay f32 under mixed precision
            outs = m.apply({"params": state.params, "batch_stats": state.batch_stats},
                           jnp.asarray(x), train=False, rngs={"sampling": key})
            assert outs[0].dtype == jnp.float32  # recon
            assert outs[1].dtype == jnp.float32  # mu
        np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)


def test_setvae_remat_gradient_identity(key):
    """remat=True (jax.checkpoint on every transformer layer) must be
    an identity on loss and gradients — only the backward's memory/
    recompute schedule changes. The remat decoder path also skips the
    batch-constant first-self-attention shortcut, which is algebraically
    identical, so grads match to fp tolerance."""
    import numpy as np
    from vae_song_tpu.train.loop import init_model

    pts = np.random.default_rng(7).normal(size=(2, 16, 3)).astype(np.float32)
    grads = {}
    for flag in (False, True):
        m = SetVAE(latent_channel=8, num_points=16, d_model=16, num_heads=2,
                   ff_dim=32, beta=0.1, remat=flag)
        params, bs = init_model(m, pts, seed=0)

        def loss_fn(p):
            outs = m.apply({"params": p}, pts, latent_rand_sampling=False,
                           train=True)
            total, *_ = m.loss(pts, *outs)
            return total

        loss, g = jax.value_and_grad(loss_fn)(params)
        grads[flag] = (float(loss), g)

    assert np.isclose(grads[False][0], grads[True][0], rtol=1e-6)
    # gradient comparison is RELATIVE and loose-ish: the remat path
    # skips the [1, N, d] batch-constant shortcut, whose different XLA
    # tiling shifts forward values by ~1e-7 — enough to flip a Chamfer
    # nearest-neighbour near-tie, which discretely moves the decoder
    # first-layer grads (observed only there; all other leaves are
    # bit-identical). Loss itself matches to 1e-6.
    rel = jax.tree.map(
        lambda a, b: float(
            jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()
            / (jnp.abs(jnp.asarray(a)).max() + 1e-3)
        ),
        grads[False][1], grads[True][1],
    )
    assert max(jax.tree.leaves(rel)) < 2e-2, rel
