"""Native threaded prefetch loader: epoch coverage, x/y pairing, and
determinism against the native permutation it shares a seed with."""

import numpy as np
import pytest

from vae_song_tpu.data import native


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(103, 4, 3)).astype(np.float32)
    y = rng.integers(0, 7, size=(103,)).astype(np.int64)
    return X, y


def test_loader_matches_native_permutation(data):
    if not native.available():
        pytest.skip("native library unavailable")
    X, y = data
    batch = 16
    loader = native.NativeBatchLoader(X, y, batch_size=batch, seed=42,
                                      n_workers=3, depth=2)
    perm = native.make_permutation(len(X), seed=42)
    got_x = np.concatenate([bx for bx, _ in loader], axis=0)
    got_y = np.concatenate([by for _, by in loader], axis=0)
    n_used = (len(X) // batch) * batch
    np.testing.assert_array_equal(got_x, X[perm[:n_used]])
    np.testing.assert_array_equal(got_y, y[perm[:n_used]])


def test_loader_epoch_coverage_no_shuffle(data):
    X, y = data
    batch = 10
    loader = native.NativeBatchLoader(X, y, batch_size=batch, shuffle=False)
    xs, ys = [], []
    for bx, by in loader:
        assert bx.shape == (batch, 4, 3) and by.shape == (batch,)
        xs.append(bx)
        ys.append(by)
    assert len(xs) == len(X) // batch  # drop_last
    np.testing.assert_array_equal(np.concatenate(xs), X[: len(xs) * batch])
    np.testing.assert_array_equal(np.concatenate(ys), y[: len(ys) * batch])


def test_loader_x_only(data):
    X, _ = data
    loader = native.NativeBatchLoader(X, None, batch_size=32, seed=1)
    for bx, by in loader:
        assert by is None
        assert bx.dtype == np.float32 and bx.shape == (32, 4, 3)


def test_loader_reiterable_same_order(data):
    X, y = data
    loader = native.NativeBatchLoader(X, y, batch_size=16, seed=7)
    first = [bx.copy() for bx, _ in loader]
    second = [bx.copy() for bx, _ in loader]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
