"""ctypes bindings to the native host library (native/vsthost.cpp).

Auto-builds `libvsthost.so` on first use (g++ is part of the image);
every entry point has a numpy fallback so the framework works without
a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvsthost.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resample_point_clouds.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.shuffled_gather.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.make_permutation.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.chamfer_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.chamfer_cpu.restype = ctypes.c_double
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.loader_create.argtypes = [
            u8p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_num_batches.argtypes = [ctypes.c_void_p]
        lib.loader_num_batches.restype = ctypes.c_int64
        lib.loader_next.argtypes = [ctypes.c_void_p, u8p, u8p]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing -> numpy fallbacks
        print(f"native vsthost unavailable ({e}); using numpy fallbacks")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def resample_point_clouds(clouds, target: int, seed: int = 0):
    """Resample a list of [n_i, dim] float32 arrays to [len, target, dim]."""
    lib = _load()
    dim = clouds[0].shape[1]
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.empty((len(clouds), target, dim), np.float32)
        for i, pts in enumerate(clouds):
            n = pts.shape[0]
            if n == target:
                out[i] = pts
            elif n > target:
                out[i] = pts[rng.choice(n, target, replace=False)]
            else:
                idx = rng.choice(n, target - n, replace=True)
                out[i] = np.concatenate([pts, pts[idx]], axis=0)
        return out
    flat = np.ascontiguousarray(np.concatenate(clouds, axis=0), np.float32)
    counts = np.array([c.shape[0] for c in clouds], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out = np.empty((len(clouds), target, dim), np.float32)
    lib.resample_point_clouds(
        _fptr(flat), _iptr(offsets), _iptr(counts),
        len(clouds), dim, target, seed, _fptr(out),
    )
    return out


def shuffled_gather(data, perm):
    """out[i] = data[perm[i]], contiguous batch assembly."""
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    if lib is None:
        return data[perm]
    perm = np.ascontiguousarray(perm, np.int64)
    rows = perm.shape[0]
    row_elems = int(np.prod(data.shape[1:]))
    out = np.empty((rows, *data.shape[1:]), np.float32)
    lib.shuffled_gather(_fptr(data), _iptr(perm), rows, row_elems, _fptr(out))
    return out


def make_permutation(n: int, seed: int = 0):
    lib = _load()
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.int64)
    out = np.empty(n, np.int64)
    lib.make_permutation(n, seed, _iptr(out))
    return out


class NativeBatchLoader:
    """Threaded prefetch batch loader (native loader_* entry points) —
    the framework's equivalent of the reference's
    DataLoader(num_workers=8, pin_memory, drop_last) (main.py:182-197):
    C++ worker threads gather shuffled contiguous batches into a bounded
    ring ahead of the consumer, overlapping host batch assembly with TPU
    dispatch.

    Iterates one epoch of (x, y) numpy batches; deterministic for a
    given seed. Note the native path shuffles with the C++ mt19937_64
    Fisher-Yates (`make_permutation`) while the numpy fallback (used
    only when the shared library is unavailable — pipeline.py gates on
    `available()`, so in-framework use never mixes the two) draws a
    numpy permutation: both are seed-deterministic but their orders
    DIFFER, so don't compare trajectories across the two backends.
    Single consumer; drop_last semantics always.
    """

    def __init__(self, X, y=None, batch_size: int = 1, shuffle: bool = True,
                 seed: int = 0, n_workers: int = 2, depth: int = 4):
        self.X = np.ascontiguousarray(X)
        self.y = np.ascontiguousarray(y) if y is not None else None
        self.batch = int(batch_size)
        self.n_batches = len(self.X) // self.batch
        self._shuffle = shuffle
        self._seed = seed
        self._nw = n_workers
        self._depth = depth
        self._h = None
        self._lib = _load()

    def __len__(self):
        return self.n_batches

    def _u8(self, a):
        return a.view(np.uint8).reshape(len(a), -1) if a is not None else None

    def __iter__(self):
        if self._lib is None:
            perm = (
                np.random.default_rng(self._seed).permutation(len(self.X))
                if self._shuffle else np.arange(len(self.X))
            )
            for b in range(self.n_batches):
                sel = perm[b * self.batch:(b + 1) * self.batch]
                yield self.X[sel], (self.y[sel] if self.y is not None else None)
            return

        u8p = ctypes.POINTER(ctypes.c_uint8)
        Xb = self._u8(self.X)
        Yb = self._u8(self.y)
        x_row = Xb.shape[1]
        y_row = Yb.shape[1] if Yb is not None else 0
        h = self._lib.loader_create(
            Xb.ctypes.data_as(u8p),
            Yb.ctypes.data_as(u8p) if Yb is not None else None,
            len(self.X), x_row, y_row, self.batch, 1,
            1 if self._shuffle else 0, self._seed, self._nw, self._depth,
        )
        try:
            ox = np.empty((self.batch, x_row), np.uint8)
            oy = np.empty((self.batch, max(y_row, 1)), np.uint8)
            for _ in range(self.n_batches):
                ok = self._lib.loader_next(
                    h, ox.ctypes.data_as(u8p), oy.ctypes.data_as(u8p)
                )
                if not ok:
                    break
                x = ox.view(self.X.dtype).reshape((self.batch,) + self.X.shape[1:]).copy()
                yv = None
                if self.y is not None:
                    yv = oy[:, :y_row].view(self.y.dtype).reshape(
                        (self.batch,) + self.y.shape[1:]
                    ).copy()
                yield x, yv
        finally:
            self._lib.loader_destroy(h)


def chamfer_cpu(pred, gt) -> float:
    """Reference CPU chamfer (oracle for kernel tests)."""
    lib = _load()
    pred = np.ascontiguousarray(pred, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    if lib is None:
        d2 = (
            (pred[:, :, None, :] - gt[:, None, :, :]) ** 2
        ).sum(-1)
        return float((d2.min(2).mean(1) + d2.min(1).mean(1)).mean())
    b, np_, _ = pred.shape
    ng = gt.shape[1]
    return float(lib.chamfer_cpu(_fptr(pred), _fptr(gt), b, np_, ng))
