"""Visualization smoke tests: every plot function writes its file."""

import os

import numpy as np
import jax

from vae_song_tpu import viz


def test_scatter_heatmap_histogram(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 2)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 5, 100)

    viz.visualize_2c_points_on_image(pts, labels, "res", "run", 3, "input", str(tmp_path))
    assert os.path.exists(tmp_path / "results/res/run/scatter2d/3_input.png")

    viz.plot_heatmap(np.arange(16.0), 4, "t", str(tmp_path / "hm.png"))
    assert os.path.exists(tmp_path / "hm.png")

    extent = viz.plot_2d_histogram(pts, 8, filepath=str(tmp_path / "hist.png"))
    assert os.path.exists(tmp_path / "hist.png")
    assert extent[0] < extent[1] and extent[2] < extent[3]


def test_image_grid_and_point_cloud(tmp_path):
    imgs = np.random.default_rng(2).uniform(size=(9, 8, 8, 1)).astype(np.float32)
    viz.save_image_grid(imgs, str(tmp_path / "grid.png"), nrow=3)
    assert os.path.exists(tmp_path / "grid.png")

    pts = np.random.default_rng(3).normal(size=(16, 3)).astype(np.float32)
    viz.save_point_cloud(pts, str(tmp_path / "cloud"))
    assert os.path.exists(tmp_path / "cloud.npy")
    ply = open(tmp_path / "cloud.ply").read()
    assert ply.startswith("ply") and "element vertex 16" in ply


def test_pca_visualization(tmp_path, key):
    def encode(x):
        return x[:, :2], np.zeros((x.shape[0], 2), np.float32)

    X = np.random.default_rng(4).normal(size=(64, 4)).astype(np.float32)
    y = np.random.default_rng(5).integers(0, 3, 64)
    viz.pca_visualization(encode, X, y, key, epoch=0, name="run",
                          resultname="res", root=str(tmp_path), run_tsne=False)
    out = tmp_path / "results/res/run/pca"
    assert os.path.exists(out / "0_pca_v_mu.png")
    assert os.path.exists(out / "prior.png")


def test_visualize_flows(tmp_path):
    a = np.random.default_rng(6).normal(size=(8, 2)).astype(np.float32)
    viz.visualize_flows(a, a, a, a, "res", "run", 1, root=str(tmp_path))
    assert os.path.exists(tmp_path / "results/res/run/visualize_flows/1_flows.png")
