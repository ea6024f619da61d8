"""Dataset factory — the name-dispatch mirror of dataset.load_dataset
(dataset.py:459-585), returning (train ArrayDataset, test ArrayDataset,
augment_fn-or-None)."""

import numpy as np

from vae_song_tpu.data.pipeline import ArrayDataset, iterate_batches, num_batches
from vae_song_tpu.data import synthetic, images, shapenet


def load_dataset(dataset_name: str, **kwargs):
    """Returns (train, test, train_augment_fn)."""
    pattern = kwargs.get("distribution_pattern", "uniform")
    num_components = kwargs.get("num_components", 16)
    total_samples = kwargs.get("train_total", 10000)
    std = kwargs.get("std", 0.1)
    K = kwargs.get("K", 16)
    seed = kwargs.get("seed")
    fake = kwargs.get("fake", False)

    if dataset_name.startswith("fake_"):
        dataset_name = dataset_name[len("fake_") :]
        fake = True

    if dataset_name in ("mnist", "fashionmnist", "cifar10", "omniglot", "celeba"):
        (xtr, ytr), (xte, yte) = images.load_image_dataset(dataset_name, fake=fake, seed=seed or 0)
        aug_factory = images.AUGMENTATIONS.get(dataset_name)
        aug = aug_factory() if aug_factory else None
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), aug

    if dataset_name == "pinwheel":
        rng = np.random.default_rng(seed)
        xtr, ytr = synthetic.generate_spin_data(10000, 5, rng=rng)
        xte, yte = synthetic.generate_spin_data(10000, 5, rng=rng)
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), None

    if dataset_name == "chessboard":
        rng = np.random.default_rng(seed)
        xtr, ytr = synthetic.generate_chessboard_data(10000, rng=rng)
        xte, yte = synthetic.generate_chessboard_data(10000, rng=rng)
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), None

    if dataset_name == "grid_mixture":
        train_weights = kwargs.get("train_weights")
        test_N0 = kwargs.get("test_N0")
        if pattern == "uniform" and train_weights is None:
            xtr, ytr = synthetic.generate_grid_mixture(
                K, total_samples // (K * K), std=std, L=1.0,
                rng=np.random.default_rng(seed),
            )
        else:
            xtr, ytr = synthetic.generate_weighted_grid_mixture(
                K, total_samples, std=std, L=1.0,
                weights=train_weights, pattern=pattern, seed=seed,
            )
        # independent draw for the test set (the reference's sequential
        # global-np.random draws are independent too, dataset.py:533-546)
        test_rng = np.random.default_rng(None if seed is None else seed + 1)
        xte, yte = synthetic.generate_grid_mixture(
            K, test_N0 if test_N0 is not None else (total_samples // (K * K)),
            std=std, L=1.0, rng=test_rng,
        )
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), None

    if dataset_name == "simple_gaussian_mixture":
        rgm_total = kwargs.get("rgm_total")
        rgm_std = kwargs.get("rgm_std")
        rgm_L = kwargs.get("rgm_L")
        xtr, ytr, *_ = synthetic.generate_simple_gaussian_mixture(
            num_components=num_components,
            total_samples=rgm_total if rgm_total is not None else total_samples,
            centers=kwargs.get("rgm_centers"),
            center_range=rgm_L if rgm_L is not None else K,
            stds=rgm_std if rgm_std is not None else std,
            weights=kwargs.get("rgm_weights"),
            pattern=pattern,
            seed=seed,
        )
        xte, yte, *_ = synthetic.generate_simple_gaussian_mixture(
            num_components=num_components,
            total_samples=rgm_total if rgm_total is not None else total_samples,
            center_range=rgm_L if rgm_L is not None else K,
            stds=rgm_std if rgm_std is not None else std,
            pattern="uniform",
            seed=seed,
        )
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), None

    if dataset_name.startswith("shapenet"):
        root = kwargs.get("shapenet_root", "dataset/shapenet")
        category = kwargs.get("category")
        num_points = kwargs.get("num_points", 2048)
        if fake:
            n_train = int(kwargs.get("num_samples", 256))
            n_test = int(kwargs.get("num_test_samples", max(1, n_train // 4)))
            xtr, ytr = shapenet.fake_point_clouds(n_train, num_points, seed=seed or 0)
            xte, yte = shapenet.fake_point_clouds(n_test, num_points, seed=(seed or 0) + 1)
        else:
            xtr, ytr = shapenet.ShapeNetPointClouds(
                root, "train", category, num_points, seed=seed or 0
            ).materialize()
            xte, yte = shapenet.ShapeNetPointClouds(
                root, "test", category, num_points, seed=seed or 0
            ).materialize()
        return ArrayDataset(xtr, ytr), ArrayDataset(xte, yte), None

    raise NotImplementedError(f"{dataset_name} is not implemented")


__all__ = [
    "load_dataset",
    "ArrayDataset",
    "iterate_batches",
    "num_batches",
    "synthetic",
    "images",
    "shapenet",
]
