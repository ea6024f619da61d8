"""Chamfer distance: hand-built sets, torch-reference parity, grad flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.ops.chamfer import chamfer_distance, _min_dists_tiled, _sq_dists


def test_identical_sets_zero():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 3)).astype(np.float32))
    assert float(chamfer_distance(pts, pts)) == pytest.approx(0.0, abs=1e-5)


def test_hand_built_value():
    # pred: single point at origin; gt: two points at distance 1 and 2
    pred = jnp.array([[[0.0, 0.0, 0.0]]])
    gt = jnp.array([[[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]]])
    # pred->gt: min(1, 4) = 1, mean = 1
    # gt->pred: [1, 4], mean = 2.5
    assert float(chamfer_distance(pred, gt)) == pytest.approx(3.5)


def test_tiled_matches_dense():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 48, 3)).astype(np.float32))
    dense = _sq_dists(a, b).min(axis=2)
    tiled = _min_dists_tiled(a, b, tile=24)  # non-divisible tile
    np.testing.assert_allclose(np.asarray(dense), np.asarray(tiled), rtol=1e-5, atol=1e-5)


def test_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 32, 3)).astype(np.float32)
    b = rng.normal(size=(3, 40, 3)).astype(np.float32)

    ta, tb = torch.tensor(a), torch.tensor(b)
    dist2 = torch.cdist(ta, tb, p=2).pow(2)
    ref = (dist2.min(dim=2).values.mean(dim=1) + dist2.min(dim=1).values.mean(dim=1)).mean()

    ours = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_gradient_flows():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    g = jax.grad(lambda x: chamfer_distance(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
