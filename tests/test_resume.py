"""Checkpoint mid-run resume + data-parallel train_and_test."""

import os

import numpy as np
import jax
import pytest

from vae_song_tpu.models import LRVAE
from vae_song_tpu.train.loop import train_and_test


def _model():
    return LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                             encoder_type="mlp", decoder_type="mlp",
                             beta=0.01, alpha=0.01)


def _common(tmp_path, **kw):
    return dict(
        epochs=4,
        batch_size=512,
        dataset_name="pinwheel",
        resultname="res_test",
        dataset_params={"seed": 0},
        output_root=str(tmp_path),
        visualize_artifacts=False,
        progress=False,
        seed=0,
        **kw,
    )


def test_checkpoint_and_resume(tmp_path):
    state, summary = train_and_test(_model(), checkpoint_every=2, **_common(tmp_path))
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path)):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    assert ckpts, "periodic checkpoint was not written"
    ckpt = sorted(ckpts)[-1]  # ckpt_1 (epoch index 1)

    state2, summary2 = train_and_test(
        _model(), resume_from=ckpt, **_common(tmp_path)
    )
    # resumed run continued to the end and produced finite eval losses
    assert np.isfinite(summary2["eval"]["loss"])
    assert int(state2.step) > int(2 * (10000 // 512))  # > 2 epochs of steps


def test_kl_adaptive_resume_matches_continuous(tmp_path):
    """Resume restores wu_alpha/last_kl from the checkpoint extra and the
    per-epoch fold_in RNG keys make the resumed trajectory identical to
    the continuous one — including the KL-history-dependent kl_adaptive
    warmup (model.py:37-63 semantics under resume)."""
    import pickle

    cont_state, _ = train_and_test(
        _model(), wu_strat="kl_adaptive", checkpoint_every=2,
        **_common(tmp_path / "a"),
    )
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path / "a")):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    ckpt = sorted(ckpts)[0]  # ckpt_1 — end of epoch index 1

    with open(ckpt, "rb") as f:
        extra = pickle.load(f)["extra"]
    assert "wu_alpha" in extra and "last_kl" in extra
    assert extra["last_kl"] > 0.0  # KL history actually recorded

    resumed_state, _ = train_and_test(
        _model(), wu_strat="kl_adaptive", resume_from=ckpt,
        **_common(tmp_path / "b"),
    )
    cont = jax.tree.leaves(cont_state.params)
    res = jax.tree.leaves(resumed_state.params)
    for c, r in zip(cont, res):
        np.testing.assert_allclose(np.asarray(c), np.asarray(r), rtol=1e-6, atol=1e-7)


def test_data_parallel_training(tmp_path):
    assert len(jax.devices()) == 8
    state, summary = train_and_test(
        _model(), data_parallel=True, **_common(tmp_path)
    )
    assert np.isfinite(summary["eval"]["loss"])


def test_checkpoint_portable_across_strategies(tmp_path):
    """A grad_clip run's checkpoint must resume under a DIFFERENT
    parallel strategy: PP/EP strip the clip from the optax chain (they
    apply it in-step with the true global norm), but make_optimizer
    keeps an identity placeholder in the clip slot so the opt_state
    pytree structure — and therefore flax deserialization — matches the
    single-device/DP chained-clip optimizer."""
    from vae_song_tpu.models import SetVAE

    def _set_model():
        return SetVAE(latent_channel=8, num_points=16, d_model=16,
                      num_heads=2, ff_dim=32, beta=0.1,
                      num_encoder_layers=2, num_decoder_layers=1)

    common = dict(
        epochs=2,
        batch_size=16,
        dataset_name="shapenet",
        resultname="res_xs",
        dataset_params={"fake": True, "num_samples": 32, "num_points": 16},
        visualize_artifacts=False,
        progress=False,
        seed=0,
        grad_clip={"enabled": True, "clip_type": "norm", "max_norm": 1.0},
    )
    # dense (no PP) run writes the checkpoint with the chained clip
    train_and_test(_set_model(), checkpoint_every=2,
                   output_root=str(tmp_path / "a"), **common)
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path / "a")):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    assert ckpts
    # resume it under pipeline parallelism (clip moved in-step)
    state, summary = train_and_test(
        _set_model(), resume_from=sorted(ckpts)[0], pipeline_parallel=2,
        output_root=str(tmp_path / "b"), epochs=3,
        **{k: v for k, v in common.items() if k != "epochs"},
    )
    assert np.isfinite(summary["eval"]["loss"])


def test_pipeline_parallel_resume_matches_continuous(tmp_path):
    """Resume THROUGH the pipeline-parallel path: the checkpoint holds
    the merged params + optimizer state (pp_sync), and the PP trainer
    restores the Adam moments and cosine-schedule position via
    split_opt_state — so resuming from epoch 2 of 4 must reproduce the
    continuous run's final params exactly."""
    from vae_song_tpu.models import SetVAE

    def _set_model():
        return SetVAE(latent_channel=8, num_points=16, d_model=16,
                      num_heads=2, ff_dim=32, beta=0.1,
                      num_encoder_layers=2, num_decoder_layers=1)

    common = dict(
        epochs=4,
        batch_size=16,
        dataset_name="shapenet",
        resultname="res_pp",
        dataset_params={"fake": True, "num_samples": 32, "num_points": 16},
        visualize_artifacts=False,
        progress=False,
        seed=0,
        pipeline_parallel=2,
    )
    cont_state, _ = train_and_test(
        _set_model(), checkpoint_every=2, output_root=str(tmp_path / "a"),
        **common,
    )
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path / "a")):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    assert ckpts, "periodic checkpoint was not written under PP"
    ckpt = sorted(ckpts)[0]  # ckpt_1 — end of epoch index 1

    resumed_state, _ = train_and_test(
        _set_model(), resume_from=ckpt, output_root=str(tmp_path / "b"),
        **common,
    )
    for (path, c), (_, r) in zip(
        jax.tree_util.tree_flatten_with_path(cont_state.params)[0],
        jax.tree_util.tree_flatten_with_path(resumed_state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(r), rtol=1e-6, atol=1e-7,
            err_msg=f"resume mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fsdp_checkpoint_portable_to_single_device(tmp_path):
    """A checkpoint written under FSDP (state sharded at save time —
    serialization device_gets the global arrays) must resume on the
    plain single-device path, and vice-versa-style strategies per
    test_checkpoint_portable_across_strategies."""
    from vae_song_tpu.models import SetVAE

    def _set_model():
        return SetVAE(latent_channel=8, num_points=16, d_model=16,
                      num_heads=2, ff_dim=32, beta=0.1,
                      num_encoder_layers=2, num_decoder_layers=1)

    common = dict(
        epochs=2,
        batch_size=16,
        dataset_name="shapenet",
        resultname="res_xs",
        dataset_params={"fake": True, "num_samples": 32, "num_points": 16},
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    train_and_test(_set_model(), fsdp=True, checkpoint_every=2,
                   output_root=str(tmp_path / "a"), **common)
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path / "a")):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    assert ckpts
    state, summary = train_and_test(
        _set_model(), resume_from=sorted(ckpts)[0],
        output_root=str(tmp_path / "b"), epochs=3,
        **{k: v for k, v in common.items() if k != "epochs"},
    )
    assert np.isfinite(summary["eval"]["loss"])
    assert int(state.step) == 3 * 2  # 2 steps/epoch x 3 epochs
