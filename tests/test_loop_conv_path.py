"""train_and_test conv dispatched path (use_scan off) with on-device
augmentation — the route MNIST conv configs take."""

import numpy as np

from vae_song_tpu.models import VanillaVAE
from vae_song_tpu.train.loop import train_and_test


def test_conv_model_routes_through_dispatched_path(tmp_path):
    m = VanillaVAE.for_dataset(
        "mnist", hidden_channels=(2, 2), encoder_type="conv", decoder_type="mlp",
        beta=0.01,
    )
    state, summary = train_and_test(
        m,
        epochs=2,
        batch_size=64,
        dataset_name="mnist",
        resultname="res_conv",
        dataset_params={"fake": True, "seed": 0},
        output_root=str(tmp_path),
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    assert np.isfinite(summary["eval"]["loss"])
    assert int(state.step) == 2 * (4096 // 64)
