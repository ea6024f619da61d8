"""Trainer-LEVEL fast-eval parity (VERDICT r4 item 7): run
train_and_test twice on a tiny non-augmented set config — once with the
single-dispatch scanned eval active (the default for multistep-eligible
set models, train/loop.py) and once with it monkeypatched off so eval
falls back to the legacy one-dispatch-per-batch loop — and assert the
reported eval metrics match. This pins the LOOP wiring (test_X_stack
slicing, key threading, chunk aggregation, last_eval_batch handling),
not just the step builders (those have their own exact-parity test,
tests/test_train_steps.py)."""

import numpy as np
import pytest

from vae_song_tpu.models import SetVAE
from vae_song_tpu.train import steps as steps_mod
from vae_song_tpu.train.loop import train_and_test


def _model():
    return SetVAE(latent_channel=8, num_points=16, d_model=16,
                  num_heads=2, ff_dim=32, beta=0.1,
                  num_encoder_layers=1, num_decoder_layers=1)


def _cfg(root, tag):
    return dict(
        epochs=2,
        batch_size=16,
        dataset_name="shapenet",
        resultname=f"res_fast_eval_{tag}",
        # 2 full test batches: the scan must aggregate across batches,
        # not just run one (num_test_samples defaults to n//4 = 12,
        # which is LESS than one batch and would skip eval entirely)
        dataset_params={"fake": True, "num_samples": 96,
                        "num_test_samples": 32, "num_points": 16},
        visualize_artifacts=False,
        progress=False,
        seed=0,
        output_root=str(root),
    )


def test_trainer_fast_eval_matches_legacy_eval(tmp_path):
    # fast run, with a spy proving the scanned-eval gate actually engaged
    engaged = []
    real_builder = steps_mod.make_scanned_eval_epoch
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            steps_mod, "make_scanned_eval_epoch",
            lambda model: (engaged.append(1), real_builder(model))[1],
        )
        _, sum_fast = train_and_test(_model(), **_cfg(tmp_path, "fast"))
    assert engaged, "scanned fast-eval was never built — gate not exercised"

    # legacy run: builder returns None so train_and_test falls back to
    # the dispatched per-batch eval loop (same seed, same data stream)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(steps_mod, "make_scanned_eval_epoch", lambda model: None)
        _, sum_legacy = train_and_test(_model(), **_cfg(tmp_path, "legacy"))

    assert set(sum_fast["eval"]) == set(sum_legacy["eval"])
    for k in sum_fast["eval"]:
        np.testing.assert_allclose(
            sum_fast["eval"][k], sum_legacy["eval"][k],
            rtol=1e-6, atol=1e-7, err_msg=f"eval metric {k}",
        )
    # posterior metrics come from the last eval batch — pins the
    # last_eval_batch composition across the two eval paths
    pf, pl = sum_fast["posterior_metrics"], sum_legacy["posterior_metrics"]
    assert set(pf) == set(pl)
    for k in pf:
        np.testing.assert_allclose(
            pf[k], pl[k], rtol=1e-5, atol=1e-6,
            err_msg=f"posterior metric {k}",
        )
