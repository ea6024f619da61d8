"""Data-layer tests: generators, pipeline semantics, on-device augs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu import data as data_lib
from vae_song_tpu.data.pipeline import ArrayDataset, iterate_batches, num_batches
from vae_song_tpu.data import synthetic, images


def test_pinwheel_dataset_shapes_and_determinism():
    tr, te, aug = data_lib.load_dataset("pinwheel", seed=3)
    assert tr.X.shape == (10000, 2) and tr.y.shape == (10000,)
    assert aug is None
    tr2, _, _ = data_lib.load_dataset("pinwheel", seed=3)
    np.testing.assert_array_equal(tr.X, tr2.X)


def test_chessboard_points_on_black_squares():
    X, y = synthetic.generate_chessboard_data(2000, 4, np.random.default_rng(0))
    grid = (X * 4).astype(int)
    assert (((grid[:, 0] + grid[:, 1]) % 2) == 1).all()
    assert len(X) == 2000


def test_weights_patterns():
    for pattern in ("uniform", "corner_heavy", "center_heavy", "sparse_random"):
        w = synthetic.generate_weights_from_pattern(
            pattern, 16, K=4, rng=np.random.default_rng(0)
        )
        assert len(w) == 16
        assert sum(w) == pytest.approx(16.0 if pattern == "uniform" else 1.0)
    with pytest.raises(ValueError):
        synthetic.generate_weights_from_pattern("bogus", 4)


def test_grid_mixture_counts():
    X, y = synthetic.generate_weighted_grid_mixture(
        4, 1000, pattern="corner_heavy", seed=1
    )
    assert len(X) == 1000
    # corner cell 0 gets ~half the mass
    assert (y == 0).sum() > 300


def test_iterate_batches_drop_last_and_coverage():
    ds = ArrayDataset(np.arange(23, dtype=np.float32)[:, None], np.arange(23))
    batches = list(iterate_batches(ds, 5, rng=np.random.default_rng(0)))
    assert len(batches) == 4 == num_batches(ds, 5)
    seen = np.concatenate([np.asarray(y) for _x, y in batches])
    assert len(set(seen.tolist())) == 20  # distinct rows, 3 dropped


def test_fake_image_dataset_shapes():
    (xtr, ytr), (xte, yte) = images.fake_image_dataset("mnist", 64, 16, seed=0)
    assert xtr.shape == (64, 28, 28, 1) and xte.shape == (16, 28, 28, 1)
    assert xtr.min() >= 0 and xtr.max() <= 1
    (ctr, _), _ = images.fake_image_dataset("cifar10", 8, 4, seed=0)
    assert ctr.shape == (8, 32, 32, 3)


def test_mnist_augment_shapes_and_range(key):
    aug = images.make_mnist_augment()
    batch = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 28, 28, 1)).astype(np.float32))
    out = aug(key, batch)
    assert out.shape == batch.shape
    assert np.isfinite(np.asarray(out)).all()
    # different keys give different augmentations
    out2 = aug(jax.random.fold_in(key, 1), batch)
    assert float(jnp.abs(out - out2).max()) > 0


def test_flip_augment_flips(key):
    aug = images.make_flip_augment()
    batch = jnp.asarray(np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1))
    out = np.asarray(aug(key, batch))
    for i in range(2):
        same = np.array_equal(out[i], np.asarray(batch)[i])
        flipped = np.array_equal(out[i], np.asarray(batch)[i, :, ::-1])
        assert same or flipped


def test_shapenet_fake_clouds():
    from vae_song_tpu.data.shapenet import fake_point_clouds

    X, y = fake_point_clouds(4, 128, seed=0)
    assert X.shape == (4, 128, 3)
    norms = np.linalg.norm(X, axis=-1)
    assert norms.max() < 1.5  # roughly unit-sphere surface


def test_fake_shapenet_respects_num_samples():
    """dataset_params num_samples/num_test_samples reach the fake
    generator (regression: they were silently ignored, every fake
    ShapeNet run got 256/64 shapes regardless of config)."""
    from vae_song_tpu.data import load_dataset

    tr, te, aug = load_dataset(
        "shapenet_chair", fake=True, num_points=32, num_samples=40
    )
    assert len(tr) == 40
    assert len(te) == 10  # default: num_samples // 4
    assert tr.X.shape == (40, 32, 3)
    tr2, te2, _ = load_dataset(
        "shapenet_chair", fake=True, num_points=32, num_samples=40,
        num_test_samples=7,
    )
    assert len(te2) == 7
