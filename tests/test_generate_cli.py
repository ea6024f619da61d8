"""Drive cli/generate.py's main() end-to-end (the reference test.py
path: config + checkpoint -> z ~ N(0,I) -> decode -> saved artifacts),
including the reference-compat --device flag (test.py:147)."""

import glob
import os

import numpy as np
import yaml

from vae_song_tpu.cli import generate as gen_cli
from vae_song_tpu.models import build_model
from vae_song_tpu.train import checkpoint as ckpt_lib
from vae_song_tpu.train.loop import init_model


def test_generate_cli_main(tmp_path):
    config = {
        "experiment_type": "vae",
        "common_params": {"exp_data": "pinwheel"},
        "model_params": {
            "beta_list": [0.01],
            "encoder_type": "mlp",
            "decoder_type": "mlp",
            "hchans": [4, 4],
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    model = gen_cli.create_model_from_config(config)
    params, bstats = init_model(
        model, np.zeros((2, 2), np.float32), seed=0
    )
    ckpt = tmp_path / "params" / "model_4.pkl"
    os.makedirs(ckpt.parent)
    ckpt_lib.save_params_only(str(ckpt), params, bstats)

    gen_cli.main([
        "--config", str(cfg_path),
        "--param_dir", str(ckpt),
        "--n_samples", "10",
        "--batch_size", "4",
        "--device", "cpu",
    ])
    outs = glob.glob(str(tmp_path / "params" / "gen_samples" / "*"))
    assert outs, "generation CLI produced no artifacts"
