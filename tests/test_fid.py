"""FID math tests against closed-form Gaussian values."""

import numpy as np
import pytest

from vae_song_tpu.ops.fid import frechet_distance, fid_from_features


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 8))
    assert fid_from_features(x, x) == pytest.approx(0.0, abs=1e-6)


def test_mean_shift_closed_form():
    # same covariance, mean shift d: FID = ||d||^2
    mu1, mu2 = np.zeros(4), np.full(4, 2.0)
    sigma = np.eye(4)
    assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(16.0, rel=1e-6)


def test_variance_scale_closed_form():
    # N(0, I) vs N(0, 4I) in d dims: Tr(I + 4I - 2*sqrt(4I)) = d(1+4-4) = d
    d = 3
    assert frechet_distance(
        np.zeros(d), np.eye(d), np.zeros(d), 4 * np.eye(d)
    ) == pytest.approx(d, rel=1e-6)


def test_sampled_matches_population():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20000, 2))
    b = rng.normal(loc=1.0, size=(20000, 2))
    # population FID = ||(1,1)||^2 = 2
    assert fid_from_features(a, b) == pytest.approx(2.0, rel=0.05)


def test_legacy_forwards_shapes(key=None):
    import jax
    import jax.numpy as jnp
    from vae_song_tpu.models import LRVAE

    key = jax.random.PRNGKey(0)
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp",
                          z_source="pz")
    x = jax.random.normal(key, (4, 2))
    variables = m.init({"params": key, "sampling": key}, x, train=True)
    for method in ("forward_ex", "forward_qzx", "forward_pz", "forward_legacy"):
        outs, _ = m.apply(
            variables, x, train=True, rngs={"sampling": key},
            mutable=["batch_stats"], method=method,
        )
        assert outs[0].shape == (4, 2)
        assert outs[3].shape == (4, 2)
