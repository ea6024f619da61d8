"""Closed-form loss/maths parity tests, checked against the reference's
torch formulas via hand-computed values."""

import numpy as np
import jax.numpy as jnp
import pytest

from vae_song_tpu.ops import losses


def test_mse_recon_matches_reference_reduction():
    # mean over batch, sum over features
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    r = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    # per-feature mean over batch: [(1+9)/2, (4+16)/2] = [5, 10] -> sum 15
    assert float(losses.mse_recon(x, r)) == pytest.approx(15.0)


def test_kl_of_standard_normal_is_zero():
    mu = jnp.zeros((4, 3))
    log_var = jnp.zeros((4, 3))
    assert float(losses.kl_divergence(mu, log_var)) == pytest.approx(0.0)


def test_kl_closed_form():
    # KL(N(m, s^2) || N(0,1)) per-dim = -0.5*(1 + log s^2 - m^2 - s^2)
    mu = jnp.full((2, 1), 1.0)
    log_var = jnp.full((2, 1), np.log(4.0))
    expected = -0.5 * (1 + np.log(4.0) - 1.0 - 4.0)
    assert float(losses.kl_divergence(mu, log_var)) == pytest.approx(expected, rel=1e-5)


def test_latent_recon_reduction():
    # [L, B, D]: mean over L, sum over B and D (reference quirk)
    z_in = jnp.ones((2, 3, 4))
    z_rec = jnp.zeros((2, 3, 4))
    assert float(losses.latent_recon_loss(z_in, z_rec)) == pytest.approx(12.0)


def test_log_mse_recon_value():
    x = jnp.ones((2, 2, 2, 1))
    r = jnp.zeros((2, 2, 2, 1))
    d = 4  # features per sample
    expected = 0.5 * d * (np.log(2 * np.pi * 1.0 + 1e-5) + 1.0)
    assert float(losses.log_mse_recon(x, r)) == pytest.approx(expected, rel=1e-4)


def test_pairwise_reg_shapes():
    z = jnp.ones((2, 5, 3)) + jnp.arange(5.0)[None, :, None] * 0.1
    base = jnp.array(1.0)
    out = losses.pairwise_reg(base, z)
    assert np.isfinite(float(out))
