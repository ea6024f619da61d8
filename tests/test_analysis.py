"""Analysis-layer tests: per-cell KL segment math, batched cellwise
Lipschitz vs the naive estimator, Z-grid plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu import analysis
from vae_song_tpu.ops.lipschitz import estimate_local_lipschitz


def test_per_cell_kl_segments():
    mu = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]])
    log_var = jnp.zeros((3, 2))
    labels = jnp.array([0, 0, 2])
    kl, counts = analysis.per_cell_kl(mu, log_var, labels, num_cells=3)
    # sample KLs: 0, 0.5, 0 -> cell0 mean 0.25, cell1 empty -> fill, cell2 0
    assert float(kl[0]) == pytest.approx(0.25)
    assert float(kl[1]) == analysis.DEFAULT_EMPTY_CELL_FILL_VALUE
    assert float(kl[2]) == pytest.approx(0.0)
    assert np.asarray(counts).tolist() == [2, 0, 1]


def test_cellwise_lipschitz_linear_map(key):
    """For a linear decoder z -> A z the Lipschitz ratios lie between
    the singular values of A."""
    a = jnp.array([[2.0, 0.0], [0.0, 0.5]])
    decode = lambda z: z @ a.T
    z = jax.random.normal(key, (4, 64, 2))
    valid = jnp.ones(4, bool)
    inv_l, lips, bi = analysis.cellwise_decoder_lipschitz(decode, z, valid, key, num_pairs=500)
    for c in range(4):
        assert 0.5 - 1e-3 <= float(lips[c]) <= 2.0 + 1e-3
        assert float(bi[c]) >= 1.0


def test_cellwise_matches_naive_estimator(key):
    """Single-cell batched estimate should be in the same ballpark as the
    straightforward estimator on the same sample cloud."""
    w = jax.random.normal(key, (2, 3))
    decode = lambda z: jnp.tanh(z @ w)
    z = jax.random.normal(jax.random.fold_in(key, 1), (256, 2))
    inv1, l1, b1 = estimate_local_lipschitz(decode, z, jax.random.fold_in(key, 2), num_pairs=2000)
    inv2, l2, b2 = analysis.cellwise_decoder_lipschitz(
        decode, z[None], jnp.ones(1, bool), jax.random.fold_in(key, 3), num_pairs=2000
    )
    assert float(l2[0]) == pytest.approx(l1, rel=0.15)
    assert float(b2[0]) == pytest.approx(b1, rel=0.25)


def test_z_grid_samples_layout(key):
    z = analysis.z_grid_samples(4, -1.0, 1.0, 2, key, nsamples_per_cell=8, jitter_std=0.0)
    assert z.shape == (16, 8, 2)
    # cell 1 is x-index 1, y-index 0 (reference ordering y*K+x)
    np.testing.assert_allclose(np.asarray(z[1, 0]), [-1.0 + 2 / 3, -1.0], atol=1e-6)


def test_z_grid_requires_2d(key):
    with pytest.raises(ValueError):
        analysis.z_grid_samples(4, -1, 1, 3, key)


def test_data_based_z_samples_large_and_small(key):
    mu = jnp.zeros((10, 2))
    lv = jnp.zeros((10, 2))
    z, mu_s, lv_s = analysis.data_based_z_samples(mu, lv, key, num_samples=50)
    assert z.shape == (50, 2)
    mu2 = jnp.zeros((100, 2))
    z2, mu_s2, _ = analysis.data_based_z_samples(mu2, jnp.zeros((100, 2)), key, num_samples=20)
    assert z2.shape == (20, 2) and mu_s2.shape == (20, 2)
