"""iterate_batches(native_prefetch=True): same batch count/shapes as
the numpy path and exact one-epoch coverage."""

import numpy as np

from vae_song_tpu.data.pipeline import ArrayDataset, iterate_batches


def test_native_prefetch_epoch_coverage():
    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        X=rng.normal(size=(70, 5)).astype(np.float32),
        y=np.arange(70).astype(np.int64),
    )
    batches = list(
        iterate_batches(ds, 16, rng=np.random.default_rng(1),
                        native_prefetch=True)
    )
    assert len(batches) == 4  # drop_last
    ys = np.concatenate([np.asarray(y) for _, y in batches])
    assert len(set(ys.tolist())) == 64  # no duplicates: a permutation prefix
    for x, y in batches:
        assert x.shape == (16, 5) and y.shape == (16,)
        # x rows must still pair with their labels
        np.testing.assert_allclose(np.asarray(x), ds.X[np.asarray(y)])
