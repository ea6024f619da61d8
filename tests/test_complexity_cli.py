"""cli/complexity.py train_one_model: timing harness robustness
(reference complexity_benchmark.py:104-143 semantics)."""

import numpy as np
import pytest

from vae_song_tpu.cli.complexity import train_one_model
from vae_song_tpu.data.pipeline import ArrayDataset
from vae_song_tpu.models import VanillaVAE


def _tiny():
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(16, 28, 28, 1)).astype(np.float32)
    ds = ArrayDataset(X, np.zeros(16, np.int64))
    model = VanillaVAE.for_dataset(
        "mnist", encoder_type="mlp", decoder_type="mlp",
        hidden_channels=(8, 8), beta=1.0,
    )
    return model, ds


@pytest.mark.parametrize("epochs", [0, 1])
def test_train_one_model_runs(epochs):
    """epochs=0 is the compile+eval-only invocation — it must report a
    row (near-zero train time, finite eval losses), not crash on an
    unbound metrics dict or a 0-step cosine lr horizon."""
    model, ds = _tiny()
    state, row = train_one_model(
        model, ds, ds, augment=None, epochs=epochs, batch_size=8,
        eval_trials=1,
    )
    assert row["train_time_sec"] >= 0.0
    assert np.isfinite(row["eval_time_sec"])
    assert all(np.isfinite(v) for v in row["eval_losses"])
    # params must stay finite after the warmup step (a NaN lr from a
    # zero-step schedule would poison them)
    import jax

    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(state.params))
