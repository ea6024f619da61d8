"""Paper-figure generator — the equivalent of draw_figure/draw.py:
combine `exp_lip_*.csv` sweep outputs, pick the best run per (alpha,
beta) cell, and render twin log-scale KL-vs-beta / L(z)-vs-beta plots
to SVG."""

import argparse
import glob
import os

import numpy as np
import pandas as pd
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def parse_experiment_name(filename):
    basename = os.path.basename(filename)
    if basename.startswith("exp_lip_"):
        return basename[8:-4]
    return basename[:-4]


def load_and_combine_data(input_dir):
    csv_files = glob.glob(os.path.join(input_dir, "exp_lip_*.csv"))
    if not csv_files:
        print(f"No CSV files found with 'exp_lip_' prefix in {input_dir}")
        return None, []
    frames, names = [], []
    for csv_file in csv_files:
        exp_name = parse_experiment_name(csv_file)
        names.append(exp_name)
        df = pd.read_csv(csv_file)
        df["experiment"] = exp_name
        frames.append(df)
        print(f"Loaded {csv_file} -> experiment: {exp_name}")
    return pd.concat(frames, ignore_index=True), names


def select_best_run(df, selection_method="kl_min"):
    """Best run per (alpha, beta) cell (draw.py:51-66)."""
    col, fn = {
        "kl_min": ("kl", "idxmin"),
        "kl_max": ("kl", "idxmax"),
        "lipschitz_min": ("L(z)", "idxmin"),
        "lipschitz_max": ("L(z)", "idxmax"),
    }[selection_method]
    idx = getattr(df.groupby(["alpha", "beta"])[col], fn)()
    return df.loc[idx]


def create_plot(df, output_dir, experiment_name, text_scale=2.2):
    alpha_values = sorted(df["alpha"].unique())
    beta_values = sorted(df["beta"].unique())
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(16, 8))
    colors = plt.cm.viridis(np.linspace(0, 1, len(alpha_values)))

    for i, alpha in enumerate(alpha_values):
        alpha_data = df[df["alpha"] == alpha].sort_values("beta")
        if len(alpha_data) == 0:
            continue
        if alpha == 0.0:
            color, label = "#CC0000", f"α={alpha} (β-VAE)"
        else:
            color, label = colors[i], f"α={alpha} (Ours)"
        ax1.plot(alpha_data["beta"], alpha_data["kl"], "--s", color=color,
                 linewidth=4, markersize=14, label=label)
        ax2.plot(alpha_data["beta"], alpha_data["L(z)"], "-o", color=color,
                 linewidth=4, markersize=14, label=label)

    for ax, ylab, title in [
        (ax1, "Mean KLD", "KL Divergence with β"),
        (ax2, "Mean L(z)", "Local bi-Lipschitz with β"),
    ]:
        ax.set_xlabel("β (Regularization Weight)", fontsize=14 * text_scale)
        ax.text(-0.05, 0.75, ylab, transform=ax.transAxes,
                fontsize=14 * text_scale, rotation=90, ha="center", va="top")
        ax.set_yscale("log")
        ax.grid(True, alpha=0.3)
        ax.set_title(title, fontsize=16 * text_scale)
        ax.legend(fontsize=10 * text_scale)
        ax.set_xticks(beta_values)
        ax.tick_params(axis="both", which="major", labelsize=14 * text_scale)

    plt.tight_layout()
    plt.subplots_adjust(wspace=0.16)
    output_file = os.path.join(output_dir, f"{experiment_name}_plot.svg")
    plt.savefig(output_file, format="svg", dpi=300, bbox_inches="tight")
    print(f"Combined plot saved to: {output_file}")
    plt.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description="Plot experimental results from CSVs")
    parser.add_argument("--input_dir", type=str, default="input_data")
    parser.add_argument("--output_dir", type=str, default="output_figure")
    parser.add_argument("--selection_method", type=str, default="kl_min",
                        choices=["kl_min", "kl_max", "lipschitz_min", "lipschitz_max"])
    parser.add_argument("--experiment", type=str, default=None)
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    combined_df, experiment_names = load_and_combine_data(args.input_dir)
    if combined_df is None:
        return
    if args.experiment:
        combined_df = combined_df[combined_df["experiment"] == args.experiment]
        experiment_names = [args.experiment]

    for exp_name in experiment_names:
        exp_data = combined_df[combined_df["experiment"] == exp_name].copy()
        exp_data = exp_data.replace([np.inf, -np.inf], np.nan).dropna()
        if len(exp_data) == 0:
            continue
        selected = select_best_run(exp_data, args.selection_method)
        create_plot(selected, args.output_dir, exp_name)
    print(f"All plots saved to: {args.output_dir}")


if __name__ == "__main__":
    main()
