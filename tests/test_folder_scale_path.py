"""CelebA / Omniglot FOLDER formats at fixture scale (VERDICT r4 item
8, symmetric to tests/test_cifar_scale_path.py): generate the real
on-disk layouts at native image dimensions with
scripts/make_folder_fixture.py, load them through the real readers and
the load_dataset dispatch, and drive a short MLP training run on each
— the full reference pipeline (dataset.py:484-495 CelebA crop/resize,
dataset.py:515-523 Omniglot resize) on true input shapes."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("PIL")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fixture(out, *args):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_folder_fixture.py"),
         "--out", str(out), "--seed", "0", *args],
        check=True, cwd=REPO,
    )


@pytest.fixture(scope="module")
def celeba_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("celebafix")
    _make_fixture(out, "--dataset", "celeba", "--count", "240")
    return str(out)


@pytest.fixture(scope="module")
def omniglot_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("omnifix")
    _make_fixture(out, "--dataset", "omniglot",
                  "--alphabets", "4", "--chars", "5", "--samples", "4")
    return str(out)


def test_celeba_fixture_through_reader(celeba_root, monkeypatch):
    import vae_song_tpu.data.images as images

    monkeypatch.setattr(images, "DATA_ROOT", celeba_root)
    (xtr, ytr), (xte, yte) = images.load_image_folder("celeba")
    # reader holds out the last 10% as the test split
    assert len(xtr) == 216 and len(xte) == 24
    assert xtr.shape[1:] == (64, 64, 3)  # CenterCrop(148) -> 64
    assert xtr.dtype == np.float32 and ytr.dtype == np.int64
    assert 0.0 <= xtr.min() and xtr.max() <= 1.0
    # native-size JPEGs really were decoded and cropped: the content is
    # smooth blobs, so adjacent-pixel deltas stay small post-resize
    assert float(np.abs(np.diff(xtr[0], axis=0)).max()) < 0.5


def test_omniglot_fixture_through_reader(omniglot_root, monkeypatch):
    import vae_song_tpu.data.images as images

    monkeypatch.setattr(images, "DATA_ROOT", omniglot_root)
    (xtr, ytr), (xte, yte) = images.load_image_folder("omniglot")
    assert xtr.shape == (4 * 5 * 4, 28, 28, 1)   # background split
    assert xte.shape == (2 * 5 * 4, 28, 28, 1)   # evaluation split
    # per-character labels increase across the alphabet/character walk
    assert ytr.min() == 0 and ytr.max() == 4 * 5 - 1
    assert np.array_equal(np.unique(ytr), np.arange(20))
    assert 0.0 <= xtr.min() and xtr.max() <= 1.0


@pytest.mark.parametrize("name,enc_hw", [("celeba", 64), ("omniglot", 28)])
def test_short_training_run_on_folder_fixture(
    name, enc_hw, celeba_root, omniglot_root, monkeypatch
):
    """load_dataset dispatch (fake=False) + train_and_test end-to-end
    on the folder fixture: batching, augment hook, eval, summary."""
    import vae_song_tpu.data.images as images
    from vae_song_tpu.models import VanillaVAE
    from vae_song_tpu.train.loop import train_and_test

    root = celeba_root if name == "celeba" else omniglot_root
    monkeypatch.setattr(images, "DATA_ROOT", root)

    m = VanillaVAE.for_dataset(
        name, hidden_channels=(8, 8), encoder_type="mlp",
        decoder_type="mlp", beta=0.01, latent_channel=4,
    )
    out_root = os.path.join(root, f"train_{name}")
    state, summary = train_and_test(
        m,
        epochs=2,
        batch_size=16,
        dataset_name=name,
        resultname=f"res_folder_{name}",
        dataset_params={},          # fake=False: the folder reader path
        output_root=out_root,
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    assert np.isfinite(summary["eval"]["loss"])
    n_train = 216 if name == "celeba" else 80
    assert int(state.step) == 2 * (n_train // 16)
