"""IDX-format readers (MNIST family) against synthetic files, raw + gz."""

import gzip
import os
import struct

import numpy as np

from vae_song_tpu.data import images


def _write_idx_pair(d, n=5):
    imgs = np.random.default_rng(0).integers(0, 255, (n, 28, 28), dtype=np.uint8)
    labels = np.arange(n, dtype=np.uint8)
    with open(os.path.join(d, "train-images-idx3-ubyte"), "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(imgs.tobytes())
    with open(os.path.join(d, "train-labels-idx1-ubyte"), "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    return imgs, labels


def test_idx_readers_raw_and_gz(tmp_path):
    d = str(tmp_path)
    imgs, labels = _write_idx_pair(d)
    x = images._read_idx_images(os.path.join(d, "train-images-idx3-ubyte"))
    y = images._read_idx_labels(os.path.join(d, "train-labels-idx1-ubyte"))
    assert x.shape == (5, 28, 28, 1)
    assert (y == labels).all()
    np.testing.assert_allclose(x[..., 0], imgs / 255.0)

    # gz variant picked up transparently
    raw = open(os.path.join(d, "train-images-idx3-ubyte"), "rb").read()
    os.remove(os.path.join(d, "train-images-idx3-ubyte"))
    with gzip.open(os.path.join(d, "train-images-idx3-ubyte.gz"), "wb") as f:
        f.write(raw)
    x2 = images._read_idx_images(os.path.join(d, "train-images-idx3-ubyte"))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_load_idx_dataset_discovery(tmp_path, monkeypatch):
    root = tmp_path / "MNIST" / "raw"
    os.makedirs(root)
    _write_idx_pair(str(root))
    # test split files
    imgs = np.zeros((2, 28, 28), np.uint8)
    with open(root / "t10k-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 2, 28, 28))
        f.write(imgs.tobytes())
    with open(root / "t10k-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, 2))
        f.write(np.zeros(2, np.uint8).tobytes())
    monkeypatch.setattr(images, "DATA_ROOT", str(tmp_path))
    (xtr, ytr), (xte, yte) = images.load_idx_dataset("mnist")
    assert xtr.shape == (5, 28, 28, 1) and xte.shape == (2, 28, 28, 1)
