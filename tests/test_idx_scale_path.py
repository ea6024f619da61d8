"""The IDX FILE path and the fake generator must produce identical
pipeline behavior at equal shapes (VERDICT r2 item 8): same dtypes,
same [0, 1] normalization, and — because the fixture writer quantizes
the same generator output — pixel equality to 1/255."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def idx_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("idxfix") / "MNIST" / "raw"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_idx_fixture.py"),
         "--out", str(out), "--n_train", "512", "--n_test", "128",
         "--seed", "0"],
        check=True, cwd=REPO,
    )
    return str(out.parent.parent)


def test_idx_path_matches_fake_generator(idx_root, monkeypatch):
    import vae_song_tpu.data.images as images

    monkeypatch.setattr(images, "DATA_ROOT", idx_root)
    (xtr, ytr), (xte, yte) = images.load_idx_dataset("mnist")
    (fxtr, fytr), (fxte, fyte) = images.fake_image_dataset(
        "mnist", n_train=512, n_test=128, seed=0
    )

    assert xtr.shape == fxtr.shape == (512, 28, 28, 1)
    assert xte.shape == fxte.shape == (128, 28, 28, 1)
    assert xtr.dtype == fxtr.dtype == np.float32
    assert ytr.dtype == fytr.dtype == np.int64
    assert 0.0 <= xtr.min() and xtr.max() <= 1.0
    # uint8 round trip: |file - generator| <= half a quantization step
    np.testing.assert_allclose(xtr, fxtr, atol=0.5 / 255 + 1e-7)
    np.testing.assert_array_equal(ytr, fytr)
    np.testing.assert_array_equal(yte, fyte)


def test_load_dataset_dispatch_uses_idx_files(idx_root, monkeypatch):
    """End-to-end through the load_dataset factory (fake=False) — the
    path config_mnist.yaml exercises when real files exist."""
    import vae_song_tpu.data.images as images
    from vae_song_tpu.data import load_dataset

    monkeypatch.setattr(images, "DATA_ROOT", idx_root)
    train_ds, test_ds, augment = load_dataset("mnist")
    assert len(train_ds) == 512 and len(test_ds) == 128
    assert train_ds.X.shape[1:] == (28, 28, 1)
    assert augment is not None  # RandomRotation+RandomResizedCrop active
