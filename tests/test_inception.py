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
