"""InceptionV3 pool3 extractor (ops/inception.py): component semantics
parity-tested against torch's own functional ops, and the local-weights
loading contract exercised with a shape-correct synthetic checkpoint."""

import numpy as np
import pytest

from vae_song_tpu.ops.inception import (
    InceptionV3Features,
    _avg_pool_3x3,
    _conv,
    _max_pool_3x3_s2,
    synthetic_state_dict,
)


def test_avg_pool_matches_torch_count_include_pad_false():
    """The pytorch_fid FIDInception blocks' pooling: SAME 3x3 stride-1
    average pool dividing by the VALID element count."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(2, 9, 9, 5)).astype(np.float32)
    got = np.asarray(_avg_pool_3x3(x))
    want = F.avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=1, padding=1,
        count_include_pad=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_bn_relu_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    w_oihw = rng.normal(scale=0.1, size=(6, 3, 3, 3)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 6).astype(np.float32)
    beta = rng.normal(size=6).astype(np.float32)
    mean = rng.normal(size=6).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 6).astype(np.float32)

    scale = gamma / np.sqrt(var + 1e-3)
    bc = {"w": np.transpose(w_oihw, (2, 3, 1, 0)), "scale": scale,
          "shift": beta - mean * scale}
    got = np.asarray(_conv(x, bc, stride=2, padding="VALID"))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.conv2d(xt, torch.from_numpy(w_oihw), stride=2)
    y = F.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(gamma), torch.from_numpy(beta),
                     training=False, eps=1e-3)
    want = F.relu(y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.default_rng(2).normal(size=(2, 9, 9, 4)).astype(np.float32)
    got = np.asarray(_max_pool_3x3_s2(x))
    want = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=2
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def fake_weights(tmp_path_factory):
    path = tmp_path_factory.mktemp("fidw") / "inception_fake.npz"
    np.savez(str(path), **synthetic_state_dict())
    return str(path)


def test_loading_and_feature_shape(fake_weights):
    """Small input (resized to 299 internally), grayscale broadcast,
    deterministic [B, 2048] output."""
    ex = InceptionV3Features(fake_weights)
    imgs = np.random.default_rng(3).uniform(size=(2, 28, 28, 1)).astype(np.float32)
    f1 = np.asarray(ex(imgs))
    f2 = np.asarray(ex(imgs))
    assert f1.shape == (2, 2048)
    assert np.isfinite(f1).all()
    np.testing.assert_array_equal(f1, f2)


def test_default_extractor_env_hook(fake_weights, monkeypatch):
    from vae_song_tpu.ops import fid as fid_lib

    monkeypatch.delenv("VST_FID_WEIGHTS", raising=False)
    ex, is_inc = fid_lib.default_extractor((28, 28, 1))
    assert not is_inc

    monkeypatch.setenv("VST_FID_WEIGHTS", fake_weights)
    ex, is_inc = fid_lib.default_extractor((28, 28, 1))
    assert is_inc

    monkeypatch.setenv("VST_FID_WEIGHTS", fake_weights + ".missing")
    with pytest.raises(FileNotFoundError):
        fid_lib.default_extractor((28, 28, 1))


# ---- per-block golden tests (VERDICT r3 #6) --------------------------
#
# The component ops above can't see a WIRING slip inside a Mixed block
# (concat order, a wrong stride/padding on one branch). Each test below
# pushes a fixed input through one JAX block function with randomized
# synthetic weights and checks it against an INDEPENDENT torch
# composition of the same published torchvision block (pytorch_fid
# pooling variant: count_include_pad=False in-block average pools).
# The torch side is written branch by branch from the torchvision
# forward order — any misrouted branch or swapped concat changes the
# values because every conv weight and BN stat is random.

def _randomized_sd():
    """synthetic_state_dict with random BN stats so the inference-BN
    folding (_bc) is exercised, not just the convs."""
    rng = np.random.default_rng(7)
    sd = synthetic_state_dict()
    for k in list(sd):
        if ".bn.running_var" in k or k.endswith(".bn.weight"):
            sd[k] = rng.uniform(0.5, 1.5, sd[k].shape).astype(np.float32)
        elif ".bn." in k:
            sd[k] = rng.normal(scale=0.1, size=sd[k].shape).astype(np.float32)
    return sd


def _torch_bc(x, sd, prefix, stride=1, padding=0):
    import torch
    import torch.nn.functional as F

    y = F.conv2d(x, torch.from_numpy(sd[f"{prefix}.conv.weight"]),
                 stride=stride, padding=padding)
    y = F.batch_norm(
        y,
        torch.from_numpy(sd[f"{prefix}.bn.running_mean"]),
        torch.from_numpy(sd[f"{prefix}.bn.running_var"]),
        torch.from_numpy(sd[f"{prefix}.bn.weight"]),
        torch.from_numpy(sd[f"{prefix}.bn.bias"]),
        training=False, eps=1e-3,
    )
    return F.relu(y)


def _block_case(block_name, cin, torch_fn):
    """Run ops/inception's block fn vs the independent torch block."""
    torch = pytest.importorskip("torch")
    from vae_song_tpu.ops import inception as inc

    sd = _randomized_sd()
    params = {c: None for c in inc._BLOCK_CONVS[block_name]}
    ex = object.__new__(InceptionV3Features)   # skip file loading
    for c in params:
        params[c] = ex._bc(sd, f"{block_name}.{c}")
    x = np.random.default_rng(11).normal(
        size=(2, 12, 12, cin)).astype(np.float32)
    got = np.asarray(inc._BLOCK_FNS[block_name](x, params))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch_fn(xt, sd, block_name).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _torch_block_a(x, sd, n):
    import torch
    import torch.nn.functional as F

    b1 = _torch_bc(x, sd, f"{n}.branch1x1")
    b5 = _torch_bc(_torch_bc(x, sd, f"{n}.branch5x5_1"),
                   sd, f"{n}.branch5x5_2", padding=2)
    bd = _torch_bc(x, sd, f"{n}.branch3x3dbl_1")
    bd = _torch_bc(bd, sd, f"{n}.branch3x3dbl_2", padding=1)
    bd = _torch_bc(bd, sd, f"{n}.branch3x3dbl_3", padding=1)
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = _torch_bc(bp, sd, f"{n}.branch_pool")
    return torch.cat([b1, b5, bd, bp], 1)


def _torch_block_b(x, sd, n):
    import torch
    import torch.nn.functional as F

    b3 = _torch_bc(x, sd, f"{n}.branch3x3", stride=2)
    bd = _torch_bc(x, sd, f"{n}.branch3x3dbl_1")
    bd = _torch_bc(bd, sd, f"{n}.branch3x3dbl_2", padding=1)
    bd = _torch_bc(bd, sd, f"{n}.branch3x3dbl_3", stride=2)
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, bd, bp], 1)


def _torch_block_c(x, sd, n):
    import torch
    import torch.nn.functional as F

    b1 = _torch_bc(x, sd, f"{n}.branch1x1")
    b7 = _torch_bc(x, sd, f"{n}.branch7x7_1")
    b7 = _torch_bc(b7, sd, f"{n}.branch7x7_2", padding=(0, 3))
    b7 = _torch_bc(b7, sd, f"{n}.branch7x7_3", padding=(3, 0))
    bd = _torch_bc(x, sd, f"{n}.branch7x7dbl_1")
    bd = _torch_bc(bd, sd, f"{n}.branch7x7dbl_2", padding=(3, 0))
    bd = _torch_bc(bd, sd, f"{n}.branch7x7dbl_3", padding=(0, 3))
    bd = _torch_bc(bd, sd, f"{n}.branch7x7dbl_4", padding=(3, 0))
    bd = _torch_bc(bd, sd, f"{n}.branch7x7dbl_5", padding=(0, 3))
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = _torch_bc(bp, sd, f"{n}.branch_pool")
    return torch.cat([b1, b7, bd, bp], 1)


def _torch_block_d(x, sd, n):
    import torch
    import torch.nn.functional as F

    b3 = _torch_bc(x, sd, f"{n}.branch3x3_1")
    b3 = _torch_bc(b3, sd, f"{n}.branch3x3_2", stride=2)
    b7 = _torch_bc(x, sd, f"{n}.branch7x7x3_1")
    b7 = _torch_bc(b7, sd, f"{n}.branch7x7x3_2", padding=(0, 3))
    b7 = _torch_bc(b7, sd, f"{n}.branch7x7x3_3", padding=(3, 0))
    b7 = _torch_bc(b7, sd, f"{n}.branch7x7x3_4", stride=2)
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, b7, bp], 1)


def _torch_block_e(x, sd, n):
    import torch
    import torch.nn.functional as F

    b1 = _torch_bc(x, sd, f"{n}.branch1x1")
    b3 = _torch_bc(x, sd, f"{n}.branch3x3_1")
    b3 = torch.cat([
        _torch_bc(b3, sd, f"{n}.branch3x3_2a", padding=(0, 1)),
        _torch_bc(b3, sd, f"{n}.branch3x3_2b", padding=(1, 0)),
    ], 1)
    bd = _torch_bc(x, sd, f"{n}.branch3x3dbl_1")
    bd = _torch_bc(bd, sd, f"{n}.branch3x3dbl_2", padding=1)
    bd = torch.cat([
        _torch_bc(bd, sd, f"{n}.branch3x3dbl_3a", padding=(0, 1)),
        _torch_bc(bd, sd, f"{n}.branch3x3dbl_3b", padding=(1, 0)),
    ], 1)
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = _torch_bc(bp, sd, f"{n}.branch_pool")
    return torch.cat([b1, b3, bd, bp], 1)


def test_block_a_golden():
    _block_case("Mixed_5b", 192, _torch_block_a)


def test_block_b_golden():
    _block_case("Mixed_6a", 288, _torch_block_b)


def test_block_c_golden():
    _block_case("Mixed_6b", 768, _torch_block_c)


def test_block_d_golden():
    _block_case("Mixed_7a", 768, _torch_block_d)


def test_block_e_golden():
    _block_case("Mixed_7b", 1280, _torch_block_e)


# ---- preprocessing + full-graph goldens (VERDICT r4 #2) ---------------

def test_resize_matches_pytorch_fid_interpolate():
    """_resize_bilinear vs pytorch_fid's
    F.interpolate(mode='bilinear', align_corners=False), upscale AND
    downscale. Downscale is the case that catches the antialias
    default: jax.image.resize(antialias=True) deviates by ~0.33 max
    pixel at 400x320 -> 299x299."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from vae_song_tpu.ops.inception import _resize_bilinear

    rng = np.random.default_rng(5)
    for h, w in [(28, 28), (64, 48), (299, 299), (400, 320)]:
        x = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(_resize_bilinear(x, 299, 299))
        want = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(299, 299),
            mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"resize {h}x{w} -> 299")


def test_full_graph_golden():
    """END-TO-END golden: InceptionV3Features (resize + [-1,1] scaling
    + stem + all 11 Mixed blocks + global average pool) against a fully
    independent torch functional composition of the same pool3 graph
    with the same randomized synthetic weights — catches inter-block
    wiring slips the per-block goldens cannot see, and pins
    pytorch_fid's input preprocessing convention ([0,1] images,
    bilinear 299 resize, then 2x-1)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sd = _randomized_sd()
    ex = object.__new__(InceptionV3Features)
    ex.params = ex._index(sd)

    imgs = np.random.default_rng(17).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(ex(imgs))
    assert got.shape == (1, 2048)

    t = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(299, 299), mode="bilinear",
                      align_corners=False)
    t = 2.0 * t - 1.0
    t = _torch_bc(t, sd, "Conv2d_1a_3x3", stride=2)
    t = _torch_bc(t, sd, "Conv2d_2a_3x3")
    t = _torch_bc(t, sd, "Conv2d_2b_3x3", padding=1)
    t = F.max_pool2d(t, 3, stride=2)
    t = _torch_bc(t, sd, "Conv2d_3b_1x1")
    t = _torch_bc(t, sd, "Conv2d_4a_3x3")
    t = F.max_pool2d(t, 3, stride=2)
    for blk, fn in [
        ("Mixed_5b", _torch_block_a), ("Mixed_5c", _torch_block_a),
        ("Mixed_5d", _torch_block_a), ("Mixed_6a", _torch_block_b),
        ("Mixed_6b", _torch_block_c), ("Mixed_6c", _torch_block_c),
        ("Mixed_6d", _torch_block_c), ("Mixed_6e", _torch_block_c),
        ("Mixed_7a", _torch_block_d), ("Mixed_7b", _torch_block_e),
        ("Mixed_7c", _torch_block_e),
    ]:
        t = fn(t, sd, blk)
    want = t.mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stem_golden():
    """Conv2d_1a..4a + the two stem max-pools against the independent
    torch composition — the pre-Mixed wiring (strides/VALID pads)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from vae_song_tpu.ops import inception as inc

    sd = _randomized_sd()
    ex = object.__new__(InceptionV3Features)
    x = np.random.default_rng(13).normal(size=(1, 75, 75, 3)).astype(np.float32)
    y = inc._conv(x, ex._bc(sd, "Conv2d_1a_3x3"), stride=2)
    y = inc._conv(y, ex._bc(sd, "Conv2d_2a_3x3"))
    y = inc._conv(y, ex._bc(sd, "Conv2d_2b_3x3"), padding=((1, 1), (1, 1)))
    y = inc._max_pool_3x3_s2(y)
    y = inc._conv(y, ex._bc(sd, "Conv2d_3b_1x1"))
    y = inc._conv(y, ex._bc(sd, "Conv2d_4a_3x3"))
    got = np.asarray(inc._max_pool_3x3_s2(y))

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    t = _torch_bc(t, sd, "Conv2d_1a_3x3", stride=2)
    t = _torch_bc(t, sd, "Conv2d_2a_3x3")
    t = _torch_bc(t, sd, "Conv2d_2b_3x3", padding=1)
    t = F.max_pool2d(t, 3, stride=2)
    t = _torch_bc(t, sd, "Conv2d_3b_1x1")
    t = _torch_bc(t, sd, "Conv2d_4a_3x3")
    want = F.max_pool2d(t, 3, stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
