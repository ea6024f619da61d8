"""InceptionV3 pool3 feature extractor in JAX, for Inception-comparable
FID scores from locally-provided weights.

The reference computes FID by shelling out to the external `pytorch_fid`
package (main.py:349-360), whose scores come from an InceptionV3 pool3
(2048-d) embedding. Weights cannot be downloaded on a no-egress box, so
this module implements the FEATURE GRAPH and loads weights from a local
file supplied by the user (env `VST_FID_WEIGHTS` or an explicit path):

  * a `.npz` whose keys are torchvision `inception_v3` state_dict names
    ("Conv2d_1a_3x3.conv.weight", "Mixed_5b.branch1x1.bn.running_mean",
    ...) — convert a checkpoint with
      np.savez(out, **{k: v.numpy() for k, v in sd.items()})
  * a torch `.pt`/`.pth` state_dict directly (loaded via torch when
    available).

Architecture transcribed from the published torchvision inception_v3
(BasicConv2d = bias-free conv + BN(eps=1e-3) + ReLU; Mixed_5b..7c
inception blocks; final global average pool -> 2048 features). The
pytorch_fid variant's only numerical deviation from stock torchvision
is `count_include_pad=False` in the in-block average pools, which
`_avg_pool_3x3` reproduces exactly (window-sum / valid-element count).
Input pipeline matches pytorch_fid: bilinear resize to 299x299 on
[0, 1] images, then normalize to [-1, 1].

Component semantics (conv/avg-pool) are parity-tested against torch's
own functional ops in tests/test_inception.py; the weight-loading
contract is tested with a shape-correct synthetic checkpoint.
"""

import functools
import os

import numpy as np


def _to_hwio(w):
    """torch OIHW conv weight -> JAX HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def load_state_dict(path):
    """Load {torchvision-name: array} from .npz or a torch checkpoint."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch  # torch checkpoints need torch's unpickler

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


class InceptionV3Features:
    """pool3 (2048-d) InceptionV3 feature extractor.

    extractor = InceptionV3Features(weights_path)
    feats = extractor(images)   # [B, H, W, C] or [B, H, W] in [0, 1]
    """

    def __init__(self, weights_path: str):
        sd = load_state_dict(weights_path)
        self.params = self._index(sd)

    # ---- weight indexing -------------------------------------------

    def _bc(self, sd, prefix):
        """BasicConv2d params: conv weight (HWIO) + folded BN affine."""
        w = _to_hwio(sd[f"{prefix}.conv.weight"])
        gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
        beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
        mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
        var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
        # fold inference-mode BN into a per-channel scale/shift
        scale = gamma / np.sqrt(var + 1e-3)
        shift = beta - mean * scale
        return {"w": w.astype(np.float32), "scale": scale, "shift": shift}

    def _index(self, sd):
        p = {}
        for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                     "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
            p[name] = self._bc(sd, name)
        for blk, convs in _BLOCK_CONVS.items():
            p[blk] = {c: self._bc(sd, f"{blk}.{c}") for c in convs}
        return p

    # ---- forward ----------------------------------------------------

    def __call__(self, images):
        import jax.numpy as jnp

        x = jnp.asarray(images, jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        x = _resize_bilinear(x, 299, 299)
        x = x * 2.0 - 1.0  # pytorch_fid's [-1, 1] normalization
        return _jit_forward(self._hashable(), x)

    def _hashable(self):
        # params keyed by id for the jit cache (weights are immutable)
        return _ParamsBox(self.params)


class _ParamsBox:
    """Hashable wrapper so the param dict can be a static jit operand
    backing one compiled executable per loaded checkpoint."""

    def __init__(self, params):
        self.params = params

    def __hash__(self):
        return id(self.params)

    def __eq__(self, other):
        return isinstance(other, _ParamsBox) and other.params is self.params


def _resize_bilinear(x, h, w):
    """Bilinear resize matching pytorch_fid's
    F.interpolate(mode='bilinear', align_corners=False): half-pixel
    centers, NO antialias filter. jax.image.resize defaults to
    antialias=True, which only differs on DOWNSCALE (inputs larger
    than 299px) — measured 0.33 max pixel delta at 400x320 vs torch,
    1.8e-7 with antialias=False (tests/test_inception.py)."""
    import jax.image

    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[-1]), "bilinear", antialias=False
    )


def _conv(x, bc, stride=1, padding="VALID"):
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(bc["w"]), (stride, stride) if isinstance(stride, int) else stride,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * jnp.asarray(bc["scale"]) + jnp.asarray(bc["shift"]))


def _max_pool_3x3_s2(x):
    import jax
    import jax.numpy as jnp

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avg_pool_3x3(x):
    """3x3 stride-1 SAME average pool with count_include_pad=False —
    the pytorch_fid FIDInception blocks' pooling semantics: divide each
    window sum by the number of VALID (non-padding) elements."""
    import jax
    import jax.numpy as jnp

    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / cnt


_PAD17 = ((0, 0), (3, 3))  # 1x7 conv padding (h, w)
_PAD71 = ((3, 3), (0, 0))


def _block_a(x, p):
    import jax.numpy as jnp

    b1 = _conv(x, p["branch1x1"])
    b5 = _conv(_conv(x, p["branch5x5_1"]), p["branch5x5_2"],
               padding=((2, 2), (2, 2)))
    b3 = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
                     padding=((1, 1), (1, 1))),
               p["branch3x3dbl_3"], padding=((1, 1), (1, 1)))
    bp = _conv(_avg_pool_3x3(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(x, p):
    import jax.numpy as jnp

    b3 = _conv(x, p["branch3x3"], stride=2)
    bd = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
                     padding=((1, 1), (1, 1))),
               p["branch3x3dbl_3"], stride=2)
    bp = _max_pool_3x3_s2(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(x, p):
    import jax.numpy as jnp

    b1 = _conv(x, p["branch1x1"])
    b7 = _conv(_conv(_conv(x, p["branch7x7_1"]), p["branch7x7_2"],
                     padding=_PAD17),
               p["branch7x7_3"], padding=_PAD71)
    bd = x
    for name, pad in (("branch7x7dbl_1", "VALID"), ("branch7x7dbl_2", _PAD71),
                      ("branch7x7dbl_3", _PAD17), ("branch7x7dbl_4", _PAD71),
                      ("branch7x7dbl_5", _PAD17)):
        bd = _conv(bd, p[name], padding=pad)
    bp = _conv(_avg_pool_3x3(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(x, p):
    import jax.numpy as jnp

    b3 = _conv(_conv(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = _conv(_conv(_conv(x, p["branch7x7x3_1"]), p["branch7x7x3_2"],
                     padding=_PAD17),
               p["branch7x7x3_3"], padding=_PAD71)
    b7 = _conv(b7, p["branch7x7x3_4"], stride=2)
    bp = _max_pool_3x3_s2(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(x, p):
    import jax.numpy as jnp

    b1 = _conv(x, p["branch1x1"])
    b3 = _conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _conv(b3, p["branch3x3_2a"], padding=((0, 0), (1, 1))),
        _conv(b3, p["branch3x3_2b"], padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
               padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _conv(bd, p["branch3x3dbl_3a"], padding=((0, 0), (1, 1))),
        _conv(bd, p["branch3x3dbl_3b"], padding=((1, 1), (0, 0))),
    ], axis=-1)
    bp = _conv(_avg_pool_3x3(x), p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


_BLOCK_FNS = {"Mixed_5b": _block_a, "Mixed_5c": _block_a, "Mixed_5d": _block_a,
              "Mixed_6a": _block_b,
              "Mixed_6b": _block_c, "Mixed_6c": _block_c, "Mixed_6d": _block_c,
              "Mixed_6e": _block_c,
              "Mixed_7a": _block_d, "Mixed_7b": _block_e, "Mixed_7c": _block_e}

_A_CONVS = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
            "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
_B_CONVS = ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3")
_C_CONVS = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
            "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
            "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
_D_CONVS = ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
            "branch7x7x3_3", "branch7x7x3_4")
_E_CONVS = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
            "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
            "branch3x3dbl_3b", "branch_pool")
_BLOCK_CONVS = {"Mixed_5b": _A_CONVS, "Mixed_5c": _A_CONVS, "Mixed_5d": _A_CONVS,
                "Mixed_6a": _B_CONVS,
                "Mixed_6b": _C_CONVS, "Mixed_6c": _C_CONVS, "Mixed_6d": _C_CONVS,
                "Mixed_6e": _C_CONVS,
                "Mixed_7a": _D_CONVS, "Mixed_7b": _E_CONVS, "Mixed_7c": _E_CONVS}


def _forward(params, x):
    x = _conv(x, params["Conv2d_1a_3x3"], stride=2)
    x = _conv(x, params["Conv2d_2a_3x3"])
    x = _conv(x, params["Conv2d_2b_3x3"], padding=((1, 1), (1, 1)))
    x = _max_pool_3x3_s2(x)
    x = _conv(x, params["Conv2d_3b_1x1"])
    x = _conv(x, params["Conv2d_4a_3x3"])
    x = _max_pool_3x3_s2(x)
    for blk, fn in _BLOCK_FNS.items():
        x = fn(x, params[blk])
    return x.mean(axis=(1, 2))  # global average pool -> [B, 2048]


@functools.lru_cache(maxsize=4)
def _compiled_forward(box):
    """One jitted executable per loaded checkpoint (_ParamsBox keys by
    param identity). Module-scope cache: defining it inside
    _jit_forward would rebuild the jit wrapper per call and retrace
    the full pool3 graph for every feature batch."""
    import jax

    return jax.jit(lambda img: _forward(box.params, img))


def _jit_forward(box, x):
    return _compiled_forward(box)(x)


# ---- synthetic checkpoint for tests ---------------------------------

def synthetic_state_dict(rng=None):
    """Shape-correct random torchvision-named state dict (test fixture
    for the loading path; NOT real Inception weights)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def bc(prefix, cin, cout, kh, kw):
        sd[f"{prefix}.conv.weight"] = rng.normal(
            scale=0.05, size=(cout, cin, kh, kw)
        ).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)

    bc("Conv2d_1a_3x3", 3, 32, 3, 3)
    bc("Conv2d_2a_3x3", 32, 32, 3, 3)
    bc("Conv2d_2b_3x3", 32, 64, 3, 3)
    bc("Conv2d_3b_1x1", 64, 80, 1, 1)
    bc("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(name, cin, pool_features):
        bc(f"{name}.branch1x1", cin, 64, 1, 1)
        bc(f"{name}.branch5x5_1", cin, 48, 1, 1)
        bc(f"{name}.branch5x5_2", 48, 64, 5, 5)
        bc(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        bc(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        bc(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        bc(f"{name}.branch_pool", cin, pool_features, 1, 1)
        return 64 + 64 + 96 + pool_features

    def block_b(name, cin):
        bc(f"{name}.branch3x3", cin, 384, 3, 3)
        bc(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        bc(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        bc(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        return 384 + 96 + cin

    def block_c(name, cin, c7):
        bc(f"{name}.branch1x1", cin, 192, 1, 1)
        bc(f"{name}.branch7x7_1", cin, c7, 1, 1)
        bc(f"{name}.branch7x7_2", c7, c7, 1, 7)
        bc(f"{name}.branch7x7_3", c7, 192, 7, 1)
        bc(f"{name}.branch7x7dbl_1", cin, c7, 1, 1)
        bc(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        bc(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        bc(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        bc(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        bc(f"{name}.branch_pool", cin, 192, 1, 1)
        return 192 * 4

    def block_d(name, cin):
        bc(f"{name}.branch3x3_1", cin, 192, 1, 1)
        bc(f"{name}.branch3x3_2", 192, 320, 3, 3)
        bc(f"{name}.branch7x7x3_1", cin, 192, 1, 1)
        bc(f"{name}.branch7x7x3_2", 192, 192, 1, 7)
        bc(f"{name}.branch7x7x3_3", 192, 192, 7, 1)
        bc(f"{name}.branch7x7x3_4", 192, 192, 3, 3)
        return 320 + 192 + cin

    def block_e(name, cin):
        bc(f"{name}.branch1x1", cin, 320, 1, 1)
        bc(f"{name}.branch3x3_1", cin, 384, 1, 1)
        bc(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        bc(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        bc(f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        bc(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        bc(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        bc(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        bc(f"{name}.branch_pool", cin, 192, 1, 1)
        return 320 + 768 + 768 + 192

    c = block_a("Mixed_5b", 192, 32)
    c = block_a("Mixed_5c", c, 64)
    c = block_a("Mixed_5d", c, 64)
    c = block_b("Mixed_6a", c)
    c = block_c("Mixed_6b", c, 128)
    c = block_c("Mixed_6c", c, 160)
    c = block_c("Mixed_6d", c, 160)
    c = block_c("Mixed_6e", c, 192)
    c = block_d("Mixed_7a", c)
    c = block_e("Mixed_7b", c)
    c = block_e("Mixed_7c", c)
    assert c == 2048, c
    return sd
