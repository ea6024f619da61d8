"""Native host library (C++ via ctypes) tests, with fallback parity."""

import numpy as np
import pytest

from vae_song_tpu.data import native


def test_library_builds_and_loads():
    # g++ is part of the image; the lib should auto-build
    assert native.available()


def test_resample_exact_pass_through():
    clouds = [np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)]
    out = native.resample_point_clouds(clouds, 32, seed=1)
    np.testing.assert_array_equal(out[0], clouds[0])


def test_resample_subsample_and_pad():
    rng = np.random.default_rng(1)
    big = rng.normal(size=(100, 3)).astype(np.float32)
    small = rng.normal(size=(10, 3)).astype(np.float32)
    out = native.resample_point_clouds([big, small], 32, seed=2)
    assert out.shape == (2, 32, 3)
    # subsampled rows all come from the source cloud, no duplicates
    as_set = {tuple(r) for r in out[0]}
    src_set = {tuple(r) for r in big}
    assert as_set <= src_set and len(as_set) == 32
    # padded cloud keeps the originals as its first rows
    np.testing.assert_array_equal(out[1][:10], small)
    pad_set = {tuple(r) for r in out[1][10:]}
    assert pad_set <= {tuple(r) for r in small}


def test_shuffled_gather_matches_numpy():
    data = np.random.default_rng(2).normal(size=(50, 4, 2)).astype(np.float32)
    perm = native.make_permutation(50, seed=3)
    assert sorted(perm.tolist()) == list(range(50))
    out = native.shuffled_gather(data, perm[:16])
    np.testing.assert_array_equal(out, data[perm[:16]])


def test_chamfer_cpu_matches_jax_kernel():
    import jax.numpy as jnp
    from vae_song_tpu.ops.chamfer import chamfer_distance

    rng = np.random.default_rng(3)
    a = rng.normal(size=(2, 24, 3)).astype(np.float32)
    b = rng.normal(size=(2, 30, 3)).astype(np.float32)
    ours = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    oracle = native.chamfer_cpu(a, b)
    assert ours == pytest.approx(oracle, rel=1e-4)
