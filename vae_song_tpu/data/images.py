"""Image dataset loaders — raw-file readers (no torchvision) + synthetic
fallback, and TPU-side data augmentation.

The reference depends on torchvision downloads (dataset.py:474-523);
this environment has no torchvision and no egress, so:
  * MNIST / FashionMNIST are read from the standard IDX files if they
    exist under `<root>/<NAME>/raw/` (the torchvision layout) or
    directly under `<root>`;
  * CIFAR-10 is read from the python-pickle batches if present;
  * otherwise `fake=True` (or dataset 'fake_<name>') generates
    shape-correct synthetic image data so that training/benchmarking
    pipelines run everywhere.

Augmentations (MNIST train: RandomRotation(20) + RandomResizedCrop
(0.9-1.0 scale, 0.9-1.1 ratio), dataset.py:475-479) run ON-DEVICE as a
jitted batched bilinear affine warp — the host here is a single core,
so host-side per-image scipy transforms would bottleneck the chip.
Images are NHWC float32 in [0, 1].
"""

import gzip
import os
import struct

import numpy as np
import jax
import jax.numpy as jnp

DATA_ROOT = os.environ.get("VST_DATA_ROOT", "dataset")

IMAGE_SHAPES = {
    "mnist": (28, 28, 1),
    "fashionmnist": (28, 28, 1),
    "cifar10": (32, 32, 3),
    "omniglot": (28, 28, 1),
    "celeba": (64, 64, 3),
}


def _open_maybe_gz(path):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return open(path, "rb")


def _read_idx_images(path):
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad IDX image magic in {path}"
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return data.reshape(n, rows, cols, 1).astype(np.float32) / 255.0


def _read_idx_labels(path):
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad IDX label magic in {path}"
        return np.frombuffer(f.read(n), dtype=np.uint8).astype(np.int64)


def _find_idx_root(name: str):
    dirname = {"mnist": "MNIST", "fashionmnist": "FashionMNIST"}[name]
    candidates = [
        os.path.join(DATA_ROOT, dirname, "raw"),
        os.path.join(DATA_ROOT, dirname),
        os.path.join(DATA_ROOT, name),
        DATA_ROOT,
    ]
    for c in candidates:
        if os.path.exists(os.path.join(c, "train-images-idx3-ubyte")) or os.path.exists(
            os.path.join(c, "train-images-idx3-ubyte.gz")
        ):
            return c
    return None


def load_idx_dataset(name: str):
    root = _find_idx_root(name)
    if root is None:
        raise FileNotFoundError(
            f"No IDX files for '{name}' under {DATA_ROOT!r} (no download in this "
            f"environment). Use fake=True for synthetic stand-in data."
        )
    xtr = _read_idx_images(os.path.join(root, "train-images-idx3-ubyte"))
    ytr = _read_idx_labels(os.path.join(root, "train-labels-idx1-ubyte"))
    xte = _read_idx_images(os.path.join(root, "t10k-images-idx3-ubyte"))
    yte = _read_idx_labels(os.path.join(root, "t10k-labels-idx1-ubyte"))
    return (xtr, ytr), (xte, yte)


def load_cifar10():
    import pickle

    root = None
    for c in [os.path.join(DATA_ROOT, "cifar-10-batches-py"), DATA_ROOT]:
        if os.path.exists(os.path.join(c, "data_batch_1")):
            root = c
            break
    if root is None:
        raise FileNotFoundError(
            f"No CIFAR-10 batches under {DATA_ROOT!r}. Use fake=True."
        )

    def _load(fname):
        with open(os.path.join(root, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x.astype(np.float32) / 255.0, np.array(d[b"labels"], np.int64)

    xs, ys = zip(*[_load(f"data_batch_{i}") for i in range(1, 6)])
    xte, yte = _load("test_batch")
    return (np.concatenate(xs), np.concatenate(ys)), (xte, yte)


def load_image_folder(name: str, max_items: int | None = None):
    """CelebA / Omniglot from local image folders (PIL-gated).

    CelebA: <root>/celeba/img_align_celeba/*.jpg with the reference's
    transform pipeline (CenterCrop(148) + Resize(64), dataset.py:486-495;
    the random flip is applied at train time on device).
    Omniglot: <root>/omniglot-py/images_background/** (train) and
    images_evaluation/** (test), resized to 28 (dataset.py:515-523).
    """
    try:
        from PIL import Image
    except ImportError as e:
        raise FileNotFoundError(f"PIL unavailable for image-folder loading: {e}")

    if name == "celeba":
        root = None
        for c in [os.path.join(DATA_ROOT, "celeba", "img_align_celeba"),
                  os.path.join(DATA_ROOT, "img_align_celeba")]:
            if os.path.isdir(c):
                root = c
                break
        if root is None:
            raise FileNotFoundError(f"No CelebA image folder under {DATA_ROOT!r}.")
        files = sorted(f for f in os.listdir(root) if f.lower().endswith((".jpg", ".png")))
        if max_items:
            files = files[:max_items]

        def load_one(fname):
            img = Image.open(os.path.join(root, fname)).convert("RGB")
            w, h = img.size
            left, top = (w - 148) // 2, (h - 148) // 2
            img = img.crop((left, top, left + 148, top + 148)).resize((64, 64))
            return np.asarray(img, np.float32) / 255.0

        xs = np.stack([load_one(f) for f in files])
        n_test = max(1, len(xs) // 10)
        ys = np.zeros(len(xs), np.int64)
        return (xs[:-n_test], ys[:-n_test]), (xs[-n_test:], ys[-n_test:])

    if name == "omniglot":
        base = os.path.join(DATA_ROOT, "omniglot-py")
        tr_dir = os.path.join(base, "images_background")
        te_dir = os.path.join(base, "images_evaluation")
        if not os.path.isdir(tr_dir):
            raise FileNotFoundError(f"No Omniglot folders under {base!r}.")

        def load_split(d):
            xs, ys = [], []
            label = 0
            for alphabet in sorted(os.listdir(d)):
                adir = os.path.join(d, alphabet)
                if not os.path.isdir(adir):
                    continue
                for character in sorted(os.listdir(adir)):
                    cdir = os.path.join(adir, character)
                    for f in sorted(os.listdir(cdir)):
                        img = Image.open(os.path.join(cdir, f)).convert("L").resize((28, 28))
                        xs.append(np.asarray(img, np.float32)[..., None] / 255.0)
                        ys.append(label)
                    label += 1
            return np.stack(xs), np.array(ys, np.int64)

        return load_split(tr_dir), load_split(te_dir)

    raise ValueError(f"load_image_folder does not handle {name}")


def fake_image_dataset(name: str, n_train=4096, n_test=1024, seed=0):
    """Shape-correct synthetic images: smooth random blobs in [0, 1]."""
    h, w, c = IMAGE_SHAPES[name]
    rng = np.random.default_rng(seed)

    def make(n):
        # sum of a few random 2-D gaussians -> image-like smooth content
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        imgs = np.zeros((n, h, w, c), np.float32)
        cx = rng.uniform(0, w, (n, 3))
        cy = rng.uniform(0, h, (n, 3))
        s = rng.uniform(2, 6, (n, 3))
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
        imgs = np.clip(imgs, 0, 1)
        labels = rng.integers(0, 10, n).astype(np.int64)
        return imgs, labels

    return make(n_train), make(n_test)


# ---------------------------------------------------------------------------
# On-device augmentation
# ---------------------------------------------------------------------------

def _affine_sample(img, matrix, out_h, out_w):
    """Bilinear-sample one image [H, W, C] with a 2x3 inverse affine map
    from output pixel coords to input coords."""
    yy, xx = jnp.mgrid[0:out_h, 0:out_w]
    coords = jnp.stack([yy.ravel(), xx.ravel(), jnp.ones(out_h * out_w)], 0).astype(
        jnp.float32
    )
    src = matrix @ coords  # [2, H*W] -> (y, x) source coords
    sy = src[0].reshape(out_h, out_w)
    sx = src[1].reshape(out_h, out_w)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, [sy, sx], order=1, mode="constant")

    return jnp.stack(
        [sample_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1
    )


def _rotation_crop_matrix(key, h, w, degrees, scale_range, ratio_range):
    """Inverse affine (output->input) for RandomRotation + RandomResizedCrop."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    angle = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    scale = jax.random.uniform(k2, (), minval=scale_range[0], maxval=scale_range[1])
    log_ratio = jax.random.uniform(
        k3, (), minval=jnp.log(ratio_range[0]), maxval=jnp.log(ratio_range[1])
    )
    ratio = jnp.exp(log_ratio)
    crop_h = jnp.sqrt(scale / ratio) * h
    crop_w = jnp.sqrt(scale * ratio) * w
    crop_h = jnp.minimum(crop_h, h)
    crop_w = jnp.minimum(crop_w, w)
    top = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (h - crop_h)
    left = jax.random.uniform(k5, (), minval=0.0, maxval=1.0) * (w - crop_w)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse map, output (y, x) -> input: first undo the resized crop
    # (p_crop = S @ p_out + t), then undo the rotation about the center
    # (p_in = R @ (p_crop - c) + c) — i.e. crop(rotate(img)), matching
    # torchvision's RandomRotation -> RandomResizedCrop order.
    # map output [0, h-1] onto the crop window [top, top+crop_h-1]
    sy = (crop_h - 1.0) / (h - 1.0)
    sx = (crop_w - 1.0) / (w - 1.0)
    # m = [R S | R (t - c) + c]
    ty, tx = top - cy, left - cx
    m = jnp.array(
        [
            [cos * sy, -sin * sx, cos * ty - sin * tx + cy],
            [sin * sy, cos * sx, sin * ty + cos * tx + cx],
        ]
    )
    return m


def make_mnist_augment(degrees=20.0, scale=(0.9, 1.0), ratio=(0.9, 1.1)):
    """Jitted batched augmentation ≈ torchvision RandomRotation(20) +
    RandomResizedCrop((28,28),(0.9,1),(0.9,1.1)) (dataset.py:475-479)."""

    @jax.jit
    def augment(key, batch):
        b, h, w, _ = batch.shape
        keys = jax.random.split(key, b)

        def one(img, k):
            m = _rotation_crop_matrix(k, h, w, degrees, scale, ratio)
            return _affine_sample(img, m, h, w)

        return jax.vmap(one)(batch, keys)

    return augment


def make_flip_augment():
    """Random horizontal flip (celeba/cifar10, dataset.py:488,508)."""

    @jax.jit
    def augment(key, batch):
        b = batch.shape[0]
        flips = jax.random.bernoulli(key, 0.5, (b,))
        return jnp.where(flips[:, None, None, None], batch[:, :, ::-1, :], batch)

    return augment


AUGMENTATIONS = {
    "mnist": make_mnist_augment,
    "cifar10": make_flip_augment,
    "celeba": make_flip_augment,
}


def load_image_dataset(name: str, fake: bool = False, seed: int = 0):
    """Returns ((xtr, ytr), (xte, yte)) NHWC float32 in [0, 1]."""
    if fake:
        return fake_image_dataset(name, seed=seed)
    if name in ("mnist", "fashionmnist"):
        return load_idx_dataset(name)
    if name == "cifar10":
        return load_cifar10()
    if name in ("celeba", "omniglot"):
        return load_image_folder(name)
    raise FileNotFoundError(
        f"Image dataset '{name}' requires local files (no egress); "
        f"pass fake=True for synthetic stand-ins."
    )
