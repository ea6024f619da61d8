#!/usr/bin/env python
"""Generate a full-size synthetic MNIST-format IDX fixture on disk.

Purpose (VERDICT r2 item 8): prove the real FILE-READING data path
(data/images.py:load_idx_dataset — the reference's torchvision MNIST
analogue, dataset.py:459-480) holds at the true dataset scale, not just
the in-memory `fake=True` generator. Writes the four standard files

  train-images-idx3-ubyte  train-labels-idx1-ubyte
  t10k-images-idx3-ubyte   t10k-labels-idx1-ubyte

(magic 2051/2049, big-endian dims) under --out, with the SAME smooth
random-blob content as fake_image_dataset quantized to uint8, so runs
against the fixture are statistically comparable to fake-data runs.

Usage:
  python scripts/make_idx_fixture.py --out /tmp/idx_fixture/MNIST/raw \
      --n_train 60000 --n_test 10000 --seed 0
  VST_DATA_ROOT=/tmp/idx_fixture python -m vae_song_tpu.cli.main \
      --config configs/config_mnist.yaml
"""

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_idx_images(path, imgs_u8):
    n, h, w = imgs_u8.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w))
        f.write(imgs_u8.tobytes())


def write_idx_labels(path, labels_u8):
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 2049, len(labels_u8)))
        f.write(labels_u8.astype(np.uint8).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=60000)
    ap.add_argument("--n_test", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from vae_song_tpu.data.images import fake_image_dataset

    (xtr, ytr), (xte, yte) = fake_image_dataset(
        "mnist", n_train=args.n_train, n_test=args.n_test, seed=args.seed
    )
    xtr8 = np.round(xtr[..., 0] * 255).astype(np.uint8)
    xte8 = np.round(xte[..., 0] * 255).astype(np.uint8)
    write_idx_images(os.path.join(args.out, "train-images-idx3-ubyte"), xtr8)
    write_idx_labels(os.path.join(args.out, "train-labels-idx1-ubyte"), ytr)
    write_idx_images(os.path.join(args.out, "t10k-images-idx3-ubyte"), xte8)
    write_idx_labels(os.path.join(args.out, "t10k-labels-idx1-ubyte"), yte)
    print(f"wrote {args.n_train}+{args.n_test} images to {args.out}")


if __name__ == "__main__":
    main()
