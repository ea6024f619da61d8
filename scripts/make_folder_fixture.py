#!/usr/bin/env python
"""Generate full-layout synthetic CelebA / Omniglot folder fixtures.

Purpose (VERDICT r4 item 8, symmetric to make_cifar_fixture.py): the
two FOLDER dataset formats — CelebA's aligned-JPEG directory
(dataset.py:484-495 pipeline) and Omniglot's
alphabet/character/sample PNG tree (dataset.py:515-523) — previously
had only tiny hand-made fixtures (tests/test_image_folders.py). This
writes the real on-disk layout at NATIVE image dimensions (CelebA
178x218 JPEG, Omniglot 105x105 grayscale PNG) and configurable counts
up to the real scale, with smooth random-blob content, so
data/images.py:load_image_folder can be driven exactly like the
downloaded datasets (no egress on this box).

Usage:
  python scripts/make_folder_fixture.py --dataset celeba \
      --out /tmp/celeba_fixture --count 2000 --seed 0
  python scripts/make_folder_fixture.py --dataset omniglot \
      --out /tmp/omni_fixture --alphabets 6 --chars 10 --samples 4
  VST_DATA_ROOT=<out> python ...   # loaders find the trees
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def blob_images(rng, n, h, w, channels):
    """Smooth random-blob content, the fake_image_dataset recipe at
    native folder-image dimensions."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = np.zeros((n, h, w, channels), np.float32)
    cx = rng.uniform(0, w, (n, 3))
    cy = rng.uniform(0, h, (n, 3))
    s = rng.uniform(h / 12, h / 4, (n, 3))
    a = rng.uniform(0.4, 1.0, (n, 3))
    for k in range(3):
        g = a[:, k, None, None] * np.exp(
            -(
                (xx[None] - cx[:, k, None, None]) ** 2
                + (yy[None] - cy[:, k, None, None]) ** 2
            )
            / (2 * s[:, k, None, None] ** 2)
        )
        imgs += g[..., None]
    return (np.clip(imgs, 0, 1) * 255).astype(np.uint8)


def write_celeba(out, count, seed, chunk=256):
    from PIL import Image

    root = os.path.join(out, "celeba", "img_align_celeba")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = 0
    while written < count:
        n = min(chunk, count - written)
        # CelebA aligned faces are 178 wide x 218 tall
        batch = blob_images(rng, n, 218, 178, 3)
        for img in batch:
            written += 1
            Image.fromarray(img).save(
                os.path.join(root, f"{written:06d}.jpg"), quality=92
            )
    print(f"celeba fixture: {written} JPEGs (178x218) under {root}")


def write_omniglot(out, alphabets, chars, samples, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    base = os.path.join(out, "omniglot-py")
    # evaluation split keeps the real dataset's rough 2:1 ratio
    for split, n_alpha in (("images_background", alphabets),
                           ("images_evaluation", max(1, alphabets // 2))):
        n = 0
        for a in range(n_alpha):
            for c in range(chars):
                d = os.path.join(base, split, f"Alphabet_{a:02d}",
                                 f"character{c + 1:02d}")
                os.makedirs(d, exist_ok=True)
                batch = blob_images(rng, samples, 105, 105, 1)
                for i, img in enumerate(batch):
                    # real files are binary strokes; keep grayscale blobs
                    Image.fromarray(img[..., 0], mode="L").save(
                        os.path.join(d, f"{i:04d}.png")
                    )
                    n += 1
        print(f"omniglot fixture: {n} PNGs (105x105) under {base}/{split}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=("celeba", "omniglot"), required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--count", type=int, default=2000,
                    help="celeba: number of JPEGs (real scale: 202599)")
    ap.add_argument("--alphabets", type=int, default=6,
                    help="omniglot: background alphabets (real: 30)")
    ap.add_argument("--chars", type=int, default=10,
                    help="omniglot: characters per alphabet (real: ~32)")
    ap.add_argument("--samples", type=int, default=4,
                    help="omniglot: samples per character (real: 20)")
    args = ap.parse_args()

    if args.dataset == "celeba":
        write_celeba(args.out, args.count, args.seed)
    else:
        write_omniglot(args.out, args.alphabets, args.chars, args.samples,
                       args.seed)


if __name__ == "__main__":
    main()
