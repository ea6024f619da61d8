"""CelebA / Omniglot folder loaders against synthetic on-disk trees.

The fixture images use the REAL dataset dimensions — CelebA aligned
JPEGs are natively 178x218 (W x H; PIL size (218, 178) as (H, W) below)
and Omniglot PNGs are 105x105 — so the full crop/resize pipeline
(CelebA: CenterCrop(148) -> 64x64, dataset.py:484-489; Omniglot:
resize 28, dataset.py:516-520) runs on true input shapes; only the
pixel content is synthetic (no egress on this box)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vae_song_tpu.data import images  # noqa: E402


def _write_img(path, size, mode="RGB"):
    arr = np.random.default_rng(0).integers(0, 255, (*size, 3 if mode == "RGB" else 1),
                                            dtype=np.uint8)
    img = Image.fromarray(arr.squeeze(), mode="RGB" if mode == "RGB" else "L")
    img.save(path)


def test_celeba_folder_loader(tmp_path, monkeypatch):
    root = tmp_path / "celeba" / "img_align_celeba"
    os.makedirs(root)
    for i in range(12):
        _write_img(root / f"{i:06d}.jpg", (218, 178))  # CelebA native size
    monkeypatch.setattr(images, "DATA_ROOT", str(tmp_path))
    (xtr, ytr), (xte, yte) = images.load_image_folder("celeba")
    assert xtr.shape[1:] == (64, 64, 3)
    assert len(xtr) + len(xte) == 12
    assert 0.0 <= xtr.min() and xtr.max() <= 1.0


def test_omniglot_folder_loader(tmp_path, monkeypatch):
    for split in ("images_background", "images_evaluation"):
        d = tmp_path / "omniglot-py" / split / "Alphabet1" / "character01"
        os.makedirs(d)
        for i in range(3):
            _write_img(d / f"{i}.png", (105, 105), mode="L")
    monkeypatch.setattr(images, "DATA_ROOT", str(tmp_path))
    (xtr, ytr), (xte, yte) = images.load_image_folder("omniglot")
    assert xtr.shape == (3, 28, 28, 1)
    assert xte.shape == (3, 28, 28, 1)


def test_missing_folder_raises(tmp_path, monkeypatch):
    monkeypatch.setattr(images, "DATA_ROOT", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        images.load_image_folder("celeba")
