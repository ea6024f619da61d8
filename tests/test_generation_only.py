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
    # unified CSV row carries a REAL (finite) fid computed with the local
    # seeded random-conv extractor (main.py:349-360, 390-393 analogue)
    logs = glob.glob(str(tmp_path / "log/*.csv"))
    assert logs
    import csv

    with open(logs[0]) as f:
        rows = list(csv.DictReader(f))
    assert rows and "fid" in rows[0]
    import math

    fid = float(rows[0]["fid"])
    assert math.isfinite(fid) and fid > 0.0  # real score, not the -1 sentinel
