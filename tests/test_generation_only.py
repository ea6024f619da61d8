"""Generation-only mode (epochs < 0, main.py:323-360): no training,
50 x batch individual sample PNGs + graceful FID fallback."""

import glob
import os

from vae_song_tpu.models import VanillaVAE
from vae_song_tpu.train.loop import train_and_test


def test_generation_only_mode(tmp_path):
    m = VanillaVAE.for_dataset("mnist", hidden_channels=(4, 4),
                               encoder_type="mlp", decoder_type="mlp")
    state, summary = train_and_test(
        m,
        epochs=-1,
        batch_size=4,
        dataset_name="mnist",
        resultname="res_gen",
        dataset_params={"fake": True, "seed": 0},
        output_root=str(tmp_path),
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    pngs = glob.glob(str(tmp_path / "results/res_gen/*/generation/*.png"))
    assert len(pngs) == 50 * 4  # SAMPLE_ITERATION x batch (main.py:326)
    # unified CSV row written with fid fallback
    logs = glob.glob(str(tmp_path / "log/*.csv"))
    assert logs and "fid" in open(logs[0]).read()
