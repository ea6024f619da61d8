"""Int8 post-training quantization for the serving path (serving/quant.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.serving import (
    int8_dense,
    make_quantized_decode,
    quantize_dense_params,
)
from vae_song_tpu.serving.quant import quantized_coverage


def test_int8_dense_exact_on_representable_values():
    """Weights on an exact int8 grid + activations on an exact int8 grid
    -> the quantized matmul reproduces the float matmul exactly."""
    rng = np.random.default_rng(0)
    w_int = rng.integers(-127, 128, size=(32, 16)).astype(np.float32)
    w = w_int * 0.25  # per-column absmax 127*0.25 -> scale exactly 0.25
    # make every column hit the full range so scale is exactly 0.25
    w[0, :] = 127 * 0.25
    x_int = rng.integers(-127, 128, size=(4, 32)).astype(np.float32)
    x = x_int * 0.5
    x[:, 0] = 127 * 0.5
    b = rng.normal(size=(16,)).astype(np.float32)

    from vae_song_tpu.serving.quant import _quantize_kernel

    w8, scale = _quantize_kernel(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(scale), np.full(16, 0.25, np.float32))
    got = int8_dense(jnp.asarray(x), w8, scale, jnp.asarray(b))
    want = x @ w + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-5)


def test_int8_dense_relative_error_random():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 128)).astype(np.float32)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    from vae_song_tpu.serving.quant import _quantize_kernel

    w8, scale = _quantize_kernel(jnp.asarray(w))
    got = np.asarray(int8_dense(jnp.asarray(x), w8, scale, None))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def _mlp_model_and_state():
    from vae_song_tpu.models import build_model
    from vae_song_tpu.train.loop import init_model

    model = build_model(
        "vae", "pinwheel",
        {"encoder_type": "mlp", "decoder_type": "mlp", "hchans": [32, 32]},
        beta=0.01, alpha=0.01, il=0.0,
    )
    params, bstats = init_model(model, np.zeros((2, 2), np.float32), seed=0)
    return model, params, bstats


def test_quantized_decode_matches_float_mlp():
    model, params, bstats = _mlp_model_and_state()
    table = quantize_dense_params(params)
    assert table, "no dense layers quantized"
    covered, total = quantized_coverage(table, params)
    assert 0 < covered <= total

    z = jax.random.normal(jax.random.PRNGKey(0), (16, model.latent_channel))
    decode_q = make_quantized_decode(model, bstats)
    got = np.asarray(decode_q(table, params, z))
    want = np.asarray(
        model.apply({"params": params, "batch_stats": bstats}, z,
                    train=False, method="decode")
    )
    assert got.shape == want.shape
    denom = np.abs(want).max()
    rel = np.abs(got - want).max() / max(denom, 1e-6)
    assert rel < 0.05, rel
    # and it is genuinely different bits (the int8 path actually ran)
    assert not np.array_equal(got, want)


def test_quantized_decode_matches_float_setvae():
    from vae_song_tpu.models.setvae import SetVAE
    from vae_song_tpu.train.loop import init_model

    model = SetVAE(
        latent_channel=16, num_points=128, d_model=64, num_heads=2,
        ff_dim=64, num_encoder_layers=1, num_decoder_layers=1,
        use_attention=True,
    )
    params, bstats = init_model(
        model, np.zeros((2, 128, 3), np.float32), seed=0
    )
    table = quantize_dense_params(params)
    assert table
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    decode_q = make_quantized_decode(model, bstats)
    got = np.asarray(decode_q(table, params, z))
    want = np.asarray(
        model.apply({"params": params, "batch_stats": bstats}, z,
                    train=False, method="decode")
    )
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 0.05, rel


def test_min_fan_in_skips_small_kernels():
    model, params, bstats = _mlp_model_and_state()
    table_all = quantize_dense_params(params, min_fan_in=0)
    table = quantize_dense_params(params, min_fan_in=16)
    assert len(table) < len(table_all)
    skipped = set(table_all) - set(table)
    assert skipped, "expected the fan-in-2 encoder input layer skipped"


def test_generate_cli_quant_int8(tmp_path):
    """cli/generate.py --quant int8 end-to-end from a saved checkpoint."""
    import glob
    import os

    import yaml

    from vae_song_tpu.cli import generate as gen_cli
    from vae_song_tpu.train import checkpoint as ckpt_lib
    from vae_song_tpu.train.loop import init_model

    config = {
        "experiment_type": "vae",
        "common_params": {"exp_data": "pinwheel"},
        "model_params": {
            "beta_list": [0.01],
            "encoder_type": "mlp",
            "decoder_type": "mlp",
            "hchans": [32, 32],
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    model = gen_cli.create_model_from_config(config)
    params, bstats = init_model(model, np.zeros((2, 2), np.float32), seed=0)
    ckpt = tmp_path / "params" / "model_4.pkl"
    os.makedirs(ckpt.parent)
    ckpt_lib.save_params_only(str(ckpt), params, bstats)

    gen_cli.main([
        "--config", str(cfg_path),
        "--param_dir", str(ckpt),
        "--n_samples", "8",
        "--batch_size", "4",
        "--quant", "int8",
    ])
    outs = glob.glob(str(tmp_path / "params" / "gen_samples" / "*"))
    assert outs, "quantized generation CLI produced no artifacts"
