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
