"""Standalone train + Lipschitz/KL field analysis CLI — the equivalent
of the reference's lipschitz.py (the paper's workhorse entry point).

`python -m vae_song_tpu.cli.lipschitz --alpha 0.1 --beta 0.5 ...`

Pipeline (lipschitz.py:225-556):
  1. SimpleGaussianMixture training data (+ 2-D histogram dump)
  2. train LRVAE (wu_alpha=1.0, composite backward) or LIDVAE
  3. X-space per-cell KL + decoder Lipschitz fields (here: one batched
     jitted pass per field instead of per-cell loops)
  4. Z-space grid fields (decode -> re-encode KL, decoder Lipschitz)
  5. data-based global KL and L(z)
  6. 8 heatmap PNGs + experiment_metrics.csv + append ../exp_lip.csv
"""

import argparse
import csv
import os

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu import analysis
from vae_song_tpu.data.pipeline import ArrayDataset
from vae_song_tpu.data.synthetic import generate_simple_gaussian_mixture
from vae_song_tpu.models import LRVAE, LIDVAE
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import make_apply_fns
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train.loggers import create_experiment_logger
from vae_song_tpu import viz


def build_argparser():
    p = argparse.ArgumentParser(
        description="Run VAE experiment for local Lipschitz and KL regularization."
    )
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--IL", type=float, default=0.0)
    p.add_argument("--model", type=str, default="lrvae", choices=["lrvae", "lidvae"])
    p.add_argument("--K", type=int, default=16)
    p.add_argument("--std", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--device", type=str, default=None, help="unused (JAX selects)")
    p.add_argument("--output_dir", type=str, default="results/ablation")
    p.add_argument("--train_total_samples", type=int, default=10000)
    p.add_argument("--test_total_samples", type=int, default=10000)
    p.add_argument("--distribution_pattern", type=str, default="corner_heavy",
                   choices=["uniform", "corner_heavy", "center_heavy", "sparse_random"])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--latent_dim", type=int, default=2)
    p.add_argument("--hidden_channels", nargs="+", type=int, default=[64, 128, 64, 2])
    p.add_argument("--num_training_components", type=int, default=8)
    p.add_argument("--K_z", type=int, default=16)
    p.add_argument("--z_min", type=float, default=-3.0)
    p.add_argument("--z_max", type=float, default=3.0)
    p.add_argument("--grad_clip_enabled", action="store_true")
    p.add_argument("--grad_clip_type", type=str, default="norm", choices=["norm", "value"])
    p.add_argument("--grad_clip_max_norm", type=float, default=1.0)
    p.add_argument("--grad_clip_norm_type", type=float, default=2.0)
    p.add_argument("--grad_clip_value", type=float, default=1.0)
    p.add_argument("--wu_strat", type=str, default="linear",
                   choices=["linear", "exponential", "repeat_linear", "kl_adaptive"])
    p.add_argument("--wu_start_epoch", type=int, default=0)
    p.add_argument("--wu_up_amount", type=float, default=None)
    p.add_argument("--wu_repeat_interval", type=int, default=10)
    return p


def train_model(model, train_ds, args, grad_clip_cfg, experiment_logger=None,
                initial_wu_alpha=0.0):
    """Training semantics of lipschitz.py:23-44 — Adam(lr), no
    scheduler, single composite backward, per-epoch warmup — compiled as
    ONE on-device lax.scan program over (epochs x steps)."""
    from vae_song_tpu.train.scan import make_scanned_trainer, precompute_alphas

    rng = jax.random.PRNGKey(args.seed)
    params, batch_stats = init_model(model, train_ds.X[: args.batch_size], seed=args.seed)
    tx = make_optimizer(lr=args.lr, total_steps=None, grad_clip=grad_clip_cfg)
    state = TrainState.create(params, batch_stats, tx)

    kl_adaptive = args.wu_strat == "kl_adaptive" and hasattr(model, "alpha")
    if hasattr(model, "alpha"):
        alphas = precompute_alphas(
            args.epochs, args.wu_strat, up_amount=args.wu_up_amount,
            start_epoch=args.wu_start_epoch, repeat_interval=args.wu_repeat_interval,
            initial_alpha=initial_wu_alpha,
        )
    else:
        alphas = jnp.zeros((args.epochs,), jnp.float32)
    if experiment_logger and alphas is not None and hasattr(model, "alpha"):
        # ONE device->host transfer, then log from the host array:
        # float(alphas[e]) per epoch is a relay roundtrip each
        # (~10-20 ms x 1000 epochs of pure logging)
        alphas_host = np.asarray(alphas)
        for e in range(args.epochs):
            experiment_logger.log_alpha_value(e, float(alphas_host[e]))

    fit = make_scanned_trainer(
        model, tx, args.batch_size, args.epochs,
        grad_mode="composite", kl_adaptive=kl_adaptive,
    )
    state, last_metrics = fit(state, jnp.asarray(train_ds.X), alphas, rng)
    # kl_adaptive uses the LAST BATCH's KL (model.py:614 semantics),
    # which scan.py exposes as last_raw_kl; "raw_kl" is the epoch mean
    wu_alpha = float(alphas[-1]) if alphas is not None else float(
        jax.nn.sigmoid(5.0 - last_metrics.get("last_raw_kl", last_metrics["raw_kl"]))
    )
    return state, wu_alpha


def main(argv=None):
    args = build_argparser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    if args.seed is None:
        args.seed = 42

    actual_latent_dim = args.hidden_channels[-1]
    if actual_latent_dim != 2:
        print(f"--- Warning: actual latent dimension ({actual_latent_dim}) is not 2;"
              f" Z-space grid evaluation will be skipped. ---")

    # 1. training data
    print(f"Generating training data with pattern: {args.distribution_pattern}")
    X, y, *_ = generate_simple_gaussian_mixture(
        num_components=args.num_training_components,
        total_samples=args.train_total_samples,
        center_range=args.K,
        stds=args.std,
        pattern=args.distribution_pattern,
        seed=args.seed,
    )
    train_ds = ArrayDataset(X, y)
    viz.plot_2d_histogram(
        X, bins=args.K,
        title=f"Training Data Distribution ({args.distribution_pattern})",
        filepath=os.path.join(args.output_dir, "train_distribution_2d.png"),
    )

    # 2. model + training
    is_lidvae = args.model == "lidvae"
    hchans = tuple(args.hidden_channels)
    if is_lidvae:
        print("Initializing and training LIDVAE model...")
        model = LIDVAE.for_dataset("pinwheel", hidden_channels=hchans,
                                   inverse_lipschitz=args.IL, beta=args.beta)
        initial_wu = 0.0
    else:
        print("Initializing and training LRVAE model...")
        model = LRVAE.for_dataset("pinwheel", hidden_channels=hchans,
                                  encoder_type="mlp", decoder_type="mlp",
                                  alpha=args.alpha, beta=args.beta)
        initial_wu = 1.0  # lipschitz.py:328 sets wu_alpha=1.0 up front

    grad_clip_cfg = {
        "enabled": args.grad_clip_enabled,
        "clip_type": args.grad_clip_type,
        "max_norm": args.grad_clip_max_norm,
        "norm_type": args.grad_clip_norm_type,
        "clip_value": args.grad_clip_value,
    }

    reg_label = "IL" if is_lidvae else "alpha"
    reg_value = args.IL if is_lidvae else args.alpha
    explog = create_experiment_logger(
        args.output_dir,
        f"{'LIDVAE' if is_lidvae else 'LRVAE'}_{reg_label}{reg_value}_beta{args.beta}",
    )
    explog.log_hyperparameters(
        model=("LIDVAE" if is_lidvae else "LRVAE"),
        alpha=(None if is_lidvae else args.alpha),
        IL=(args.IL if is_lidvae else None),
        beta=args.beta, epochs=args.epochs, lr=args.lr,
        batch_size=args.batch_size, K=args.K, K_z=args.K_z, std=args.std,
        train_total_samples=args.train_total_samples,
        distribution_pattern=args.distribution_pattern, seed=args.seed,
        latent_dim=actual_latent_dim, hidden_channels=args.hidden_channels,
        num_training_components=args.num_training_components,
        z_min=args.z_min, z_max=args.z_max, wu_strat=args.wu_strat,
        grad_clip_enabled=args.grad_clip_enabled,
    )

    state, wu_alpha = train_model(model, train_ds, args, grad_clip_cfg, explog, initial_wu)
    explog.log_model_info(model, state.params)
    print("Model training complete.")

    # 3. test data = train data (intentional, lipschitz.py:384-385)
    test_ds = train_ds
    viz.plot_2d_histogram(
        test_ds.X, bins=args.K,
        title="Test Data Distribution (X-space)",
        filepath=os.path.join(args.output_dir, "test_distribution_x_space.png"),
    )

    encode_fn, decode_fn, _forward = make_apply_fns(model)
    enc = lambda xx: encode_fn(state, jnp.asarray(xx))
    dec = jax.jit(lambda zz: decode_fn(state, zz))

    key = jax.random.PRNGKey(args.seed)
    mu_all, log_var_all = enc(test_ds.X)

    # encoded-z histogram + extent (lipschitz.py:400-424)
    z_plot_extent = [args.z_min, args.z_max, args.z_min, args.z_max]
    if actual_latent_dim == 2:
        key, kz = jax.random.split(key)
        eps = jax.random.normal(kz, mu_all.shape)
        z_test = np.asarray(mu_all + eps * jnp.exp(0.5 * log_var_all))
        viz.plot_2d_histogram(
            z_test, bins=args.K_z,
            title="Encoded Latent Z Distribution",
            filepath=os.path.join(args.output_dir, f"encoded_z_alpha{args.alpha}.png"),
        )
        z_plot_extent = [z_test[:, 0].min(), z_test[:, 0].max(),
                         z_test[:, 1].min(), z_test[:, 1].max()]
        print(f"Z-space extent set to: x=[{z_plot_extent[0]:.3f}, {z_plot_extent[1]:.3f}]")

    # 4. X-space per-cell fields — labels here are mixture-component ids;
    # the reference uses the dataset's labels the same way (test_dataset.y)
    num_cells = args.K * args.K
    labels = np.asarray(test_ds.y).astype(np.int32)
    # bin points into the KxK spatial grid occupying the data bounding box
    # (the reference's grid datasets label by cell; for the GMM training
    # set reused as test set the labels are component ids, so we re-bin
    # spatially to get K*K cells like the committed experiment_metrics.csv)
    Xn = np.asarray(test_ds.X)
    x_edges = np.linspace(Xn[:, 0].min(), Xn[:, 0].max() + 1e-6, args.K + 1)
    y_edges = np.linspace(Xn[:, 1].min(), Xn[:, 1].max() + 1e-6, args.K + 1)
    cx = np.clip(np.digitize(Xn[:, 0], x_edges) - 1, 0, args.K - 1)
    cy = np.clip(np.digitize(Xn[:, 1], y_edges) - 1, 0, args.K - 1)
    cell_labels = (cy * args.K + cx).astype(np.int32)

    print(f"\nEvaluating metrics based on X-space grid (K={args.K})...")
    kl_x, counts = analysis.per_cell_kl(mu_all, log_var_all, jnp.asarray(cell_labels), num_cells)
    kl_x = np.asarray(kl_x)

    key, kg, kl_key = jax.random.split(key, 3)
    z_by_cell, valid, _ = analysis.gather_cell_samples(
        mu_all, log_var_all, cell_labels, num_cells, key=kg
    )
    inv_x, lips_x, bi_x = analysis.cellwise_decoder_lipschitz(
        dec, z_by_cell, valid, kl_key, num_pairs=2000
    )
    inv_x, lips_x, bi_x = map(np.asarray, (inv_x, lips_x, bi_x))
    kl_x = np.where(np.asarray(counts) > 0, kl_x, analysis.DEFAULT_EMPTY_CELL_FILL_VALUE)

    for vals, nm in [(kl_x, "kl_div"), (lips_x, "lips"), (inv_x, "inv_lips"), (bi_x, "bi_lips")]:
        viz.plot_heatmap(
            vals, args.K, f"{nm} (X-space, {reg_label}={reg_value})",
            os.path.join(args.output_dir, f"{nm}_x_space_{reg_label}_{reg_value}.png"),
        )

    # 5. Z-space grid fields
    kl_z = np.full(args.K_z * args.K_z, analysis.DEFAULT_EMPTY_CELL_FILL_VALUE, np.float32)
    lips_z = kl_z.copy()
    if actual_latent_dim == 2:
        print(f"\nEvaluating metrics based on Z-space grid (K_z={args.K_z})...")
        zmin_a, zmax_a = float(z_plot_extent[0]), float(z_plot_extent[1])
        key, kzs, kzl = jax.random.split(key, 3)
        z_samples = analysis.z_grid_samples(args.K_z, zmin_a, zmax_a, 2, kzs)
        kl_z = np.asarray(analysis.z_grid_kl(dec, enc, z_samples))
        inv_z, lips_z, bi_z = analysis.cellwise_decoder_lipschitz(
            dec, z_samples, jnp.ones(args.K_z * args.K_z, bool), kzl, num_pairs=2000
        )
        inv_z, lips_z, bi_z = map(np.asarray, (inv_z, lips_z, bi_z))
        for vals, nm in [(kl_z, "kl_div"), (lips_z, "lips"), (inv_z, "inv_lips"), (bi_z, "bi_lips")]:
            viz.plot_heatmap(
                vals, args.K_z, f"{nm} (Z-space, {reg_label}={reg_value})",
                os.path.join(args.output_dir, f"{nm}_z_space_{reg_label}_{reg_value}.png"),
                extent=z_plot_extent,
            )
    else:
        print("Z-space grid evaluation skipped (latent dim != 2).")

    # 6. data-based global metrics
    print("\nMeasuring KL and L(z) from actual data distribution...")
    key, kd, kl2 = jax.random.split(key, 3)
    z_data, mu_sub, lv_sub = analysis.data_based_z_samples(mu_all, log_var_all, kd, 5000)
    data_kl = analysis.data_based_kl(mu_sub, lv_sub)
    data_inv, data_lips, data_bi = analysis.data_based_lipschitz(dec, z_data, kl2, 5000)
    print(f"Data-based KL measurement: {data_kl:.4f}")
    print(f"Data-based L(z): inv={data_inv:.4f}, lips={data_lips:.4f}, bi={data_bi:.4f}")

    # 7. CSVs (lipschitz.py:486-531)
    metrics_path = os.path.join(args.output_dir, "experiment_metrics.csv")
    with open(metrics_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["alpha", "space", "cell_idx", "kl_div", "lipschitz"])
        for i in range(num_cells):
            w.writerow([reg_value, "X", i, float(kl_x[i]), float(lips_x[i])])
        if actual_latent_dim == 2:
            for i in range(args.K_z * args.K_z):
                w.writerow([reg_value, "Z", i, float(kl_z[i]), float(lips_z[i])])

    exp_lip_file = os.path.join(os.path.dirname(args.output_dir) or ".", "exp_lip.csv")
    write_header = not os.path.exists(exp_lip_file)
    with open(exp_lip_file, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(["alpha", "beta", "kl", "L(z)"])
        w.writerow([reg_value, args.beta, data_kl, data_bi])

    explog.log_evaluation_metrics(
        kl=data_kl, bi_lipschitz=data_bi, data_based_kl=data_kl,
        data_based_bi_lips=data_bi, data_based_inv_lips=data_inv,
        data_based_lips=data_lips,
    )
    explog.log_alpha_warmup_summary(args.wu_strat)
    explog.finalize_log()

    print(f"Experiment complete. Results saved to {args.output_dir}")
    print(f"Overall metrics - KL (data-based): {data_kl:.4f}, "
          f"Bi-Lipschitz L(z) (data-based): {data_bi:.4f}")
    return dict(kl=data_kl, bi_lips=data_bi, inv_lips=data_inv, lips=data_lips)


if __name__ == "__main__":
    main()
