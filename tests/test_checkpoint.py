"""Checkpoint backends: pickle roundtrip + orbax roundtrip."""

import os

import numpy as np
import jax
import pytest

from vae_song_tpu.models import LRVAE
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train import checkpoint as ck


@pytest.fixture
def state():
    m = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                          encoder_type="mlp", decoder_type="mlp")
    x = np.random.default_rng(0).normal(size=(16, 2)).astype(np.float32)
    params, bs = init_model(m, x, seed=0)
    return TrainState.create(params, bs, make_optimizer(lr=1e-3))


def _assert_state_equal(a, b):
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pickle_roundtrip(tmp_path, state):
    p = str(tmp_path / "ck.pkl")
    ck.save_checkpoint(p, state, epoch=3, extra={"note": "x"})
    st2, ep, extra = ck.load_checkpoint(p, state)
    assert ep == 3 and extra["note"] == "x"
    _assert_state_equal(state, st2)


def test_orbax_roundtrip(tmp_path, state):
    p = str(tmp_path / "ck_orbax")
    ck.save_checkpoint_orbax(p, state, epoch=7)
    st2, ep = ck.load_checkpoint_orbax(p, state)
    assert ep == 7
    _assert_state_equal(state, st2)


def test_params_only_roundtrip(tmp_path, state):
    p = str(tmp_path / "model.pkl")
    ck.save_params_only(p, state.params, state.batch_stats)
    params, bs = ck.load_params_only(p, state.params, state.batch_stats)
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_checkpointer_roundtrip(tmp_path, state):
    p = str(tmp_path / "ck_async.pkl")
    acp = ck.AsyncCheckpointer()
    acp.submit(p, state, epoch=5, extra={"wu_alpha": 0.25})
    acp.close()
    st2, ep, extra = ck.load_checkpoint(p, state)
    assert ep == 5 and extra["wu_alpha"] == 0.25
    _assert_state_equal(state, st2)


def test_async_checkpointer_survives_donation(tmp_path, state):
    """submit() must snapshot BEFORE returning: the next train step
    donates the live state's buffers, so a lazy reference would read
    deleted arrays (or silently updated ones)."""
    import jax.numpy as jnp
    from vae_song_tpu.models import LRVAE
    from vae_song_tpu.train.steps import make_train_step

    m = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                          encoder_type="mlp", decoder_type="mlp")
    x = np.random.default_rng(1).normal(size=(16, 2)).astype(np.float32)
    want = jax.device_get(state)

    p = str(tmp_path / "ck_donate.pkl")
    acp = ck.AsyncCheckpointer()
    acp.submit(p, state, epoch=0)
    # donate the submitted state's buffers immediately (same tx the
    # fixture's opt_state was built with)
    step = make_train_step(m, make_optimizer(lr=1e-3))
    new_state, _ = step(state, jnp.asarray(x), 0.5, jax.random.PRNGKey(0))
    acp.close()

    st2, _, _ = ck.load_checkpoint(p, new_state)
    for a, b in zip(jax.tree.leaves(want.params), jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointer_error_surfaces(tmp_path, state):
    acp = ck.AsyncCheckpointer()
    acp.submit(str(tmp_path / "nonexistent_dir_ro") + "/x/" + "\0bad", state)
    with pytest.raises(BaseException):
        acp.wait()


def test_async_checkpoint_trainer_path(tmp_path):
    """train_and_test(async_checkpoint=True) writes the same resumable
    artifacts as the sync path (joined before return)."""
    from vae_song_tpu.train.loop import train_and_test

    m = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                          encoder_type="mlp", decoder_type="mlp",
                          beta=0.01, alpha=0.01)
    state, summary = train_and_test(
        m, epochs=4, batch_size=64, dataset_name="pinwheel",
        resultname="res_ack", dataset_params={"num_samples": 256},
        output_root=str(tmp_path), visualize_artifacts=False,
        progress=False, seed=0, checkpoint_every=2, async_checkpoint=True,
    )
    ckpts = []
    for root, _d, files in os.walk(str(tmp_path)):
        ckpts += [os.path.join(root, f) for f in files if f.startswith("ckpt_")]
    assert sorted(os.path.basename(c) for c in ckpts) == [
        "ckpt_1.pkl", "ckpt_3.pkl"
    ]
    st2, ep, extra = ck.load_checkpoint(sorted(ckpts)[-1], state)
    assert ep == 3 and "wu_alpha" in extra


def test_async_checkpointer_submit_survives_prior_error(tmp_path, state, capsys):
    """A failed periodic write must not abort the training run at the
    NEXT checkpoint epoch: submit() warns and keeps going; close()
    still surfaces the error (train_and_test catches it and warns)."""
    acp = ck.AsyncCheckpointer()
    acp.submit(str(tmp_path / "nonexistent_dir_ro") + "/x/" + "\0bad", state)
    acp._q.join()  # let the worker record the failure
    good = tmp_path / "good.pkl"
    acp.submit(str(good), state)  # must NOT raise
    err = capsys.readouterr().err
    assert "async checkpoint write failed" in err
    with pytest.raises(BaseException):
        acp.close()
    assert good.exists()  # the later submit still wrote its snapshot
