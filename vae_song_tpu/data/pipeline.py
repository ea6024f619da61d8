"""Host-side batching with double-buffered device prefetch.

Replaces torch DataLoader(num_workers=8, pin_memory, drop_last)
(main.py:182-197). Data lives in host numpy arrays; batches are
`jax.device_put` one step ahead so H2D transfer overlaps compute
(JAX dispatch is async, so keeping one batch in flight suffices on a
single chip).
"""

from dataclasses import dataclass

import numpy as np
import jax


@dataclass
class ArrayDataset:
    """In-memory dataset: X [N, ...], y [N]."""

    X: np.ndarray
    y: np.ndarray

    def __len__(self):
        return len(self.X)


def iterate_batches(
    dataset: ArrayDataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
    drop_last: bool = True,
    device=None,
    augment=None,
    augment_key=None,
    native_prefetch: bool = False,
):
    """Yield (x, y) device arrays; optional on-device augmentation fn.

    `native_prefetch=True` assembles host batches on the C++ worker
    threads (data/native.py:NativeBatchLoader — the reference
    DataLoader(num_workers=8) analogue) so the gather/copy overlaps TPU
    dispatch; the device-side double buffering is identical. Requires
    drop_last (the loader's contract) and falls back silently when the
    native library is unavailable."""
    if native_prefetch and drop_last:
        from vae_song_tpu.data import native

        if native.available():
            seed = int((rng or np.random.default_rng()).integers(2**63))
            loader = native.NativeBatchLoader(
                dataset.X, dataset.y, batch_size,
                shuffle=shuffle, seed=seed,
            )
            pending = None
            for i, (hx, hy) in enumerate(loader):
                x = jax.device_put(hx, device)
                y = jax.device_put(hy, device)
                if augment is not None:
                    x = augment(jax.random.fold_in(augment_key, i), x)
                if pending is not None:
                    yield pending
                pending = (x, y)
            if pending is not None:
                yield pending
            return

    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    nb = n // batch_size if drop_last else -(-n // batch_size)

    def make(i):
        sel = idx[i * batch_size : (i + 1) * batch_size]
        x = jax.device_put(dataset.X[sel], device)
        y = jax.device_put(dataset.y[sel], device)
        if augment is not None:
            x = augment(jax.random.fold_in(augment_key, i), x)
        return x, y

    if nb == 0:
        return
    pending = make(0)
    for i in range(1, nb):
        nxt = make(i)  # enqueue next H2D while caller consumes current
        yield pending
        pending = nxt
    yield pending


def num_batches(dataset, batch_size, drop_last=True):
    n = len(dataset)
    return n // batch_size if drop_last else -(-n // batch_size)
