"""Config loading / sweep-grid semantics (main.py:395-580 parity)."""

import os

import pytest

from vae_song_tpu.config import load_config, resolve_names, sweep_grid
from vae_song_tpu.models import build_model, LRVAE, SetLRVAE, LIDVAE

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_shipped_configs_load_and_sweep():
    for name in os.listdir(CONFIG_DIR):
        cfg = load_config(os.path.join(CONFIG_DIR, name))
        logf, resf = resolve_names(cfg)
        assert logf.endswith(".csv")
        points = list(sweep_grid(cfg))
        assert len(points) >= 1


def test_lrvae_grid_is_alpha_cross_beta():
    cfg = {
        "experiment_type": "lrvae",
        "common_params": {"exp_data": "pinwheel", "niter": 2},
        "model_params": {"alpha_list": [0.1, 0.2], "beta_list": [1.0, 2.0, 3.0],
                         "hchans": [8], "num_mc_samples": 1,
                         "residual_connection": False},
    }
    points = list(sweep_grid(cfg))
    assert len(points) == 2 * 3 * 2
    assert points[0] == dict(beta=1.0, alpha=0.1, il=0.0, rep=0)


def test_build_model_dispatch():
    mp = {"hchans": [8, 8], "encoder_type": "mlp", "decoder_type": "mlp"}
    m = build_model("lrvae", "pinwheel", mp, beta=0.5, alpha=0.3)
    assert isinstance(m, LRVAE) and m.beta == 0.5 and m.alpha == 0.3
    m2 = build_model("lidvae", "pinwheel", mp, beta=0.5, il=0.2)
    assert isinstance(m2, LIDVAE) and m2.inverse_lipschitz == 0.2
    m3 = build_model("setlrvae", "shapenet", {"latent_channel": 8, "num_points": 16},
                     alpha=0.1)
    assert isinstance(m3, SetLRVAE)
    with pytest.raises(ValueError):
        build_model("bogus", "pinwheel", mp)


def test_fingerprint_names():
    cfg = {
        "experiment_type": "lrvae",
        "common_params": {"exp_data": "mnist", "logfilename": None, "resultname": None},
        "model_params": {"hchans": [1, 2, 3], "num_mc_samples": 4,
                         "residual_connection": True},
    }
    logf, resf = resolve_names(cfg)
    assert logf == "log_mnist_lrvae_res_depth3_mc4.csv"
    assert resf == "result_mnist_lrvae_res_depth3_mc4"
