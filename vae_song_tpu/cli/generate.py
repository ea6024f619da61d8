"""Sample-generation CLI from a trained checkpoint — the equivalent of
the reference's test.py (checkpoint -> z~N(0,I) -> decode -> .png grids
or .npy/.ply point clouds).

Usage:
    python -m vae_song_tpu.cli.generate --config configs/config_mnist.yaml \
        --param_dir results/.../params/model_99.pkl --n_samples 100
"""

import argparse
import os

import numpy as np
import jax

from vae_song_tpu.config import load_config
from vae_song_tpu.models import build_model
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train import checkpoint as ckpt_lib
from vae_song_tpu.train.steps import make_apply_fns
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu import viz


def create_model_from_config(config):
    """Per-exp_type constructor mirror (test.py:33-100)."""
    exp_type = config["experiment_type"]
    common = config["common_params"]
    mp = config["model_params"]
    beta = mp.get("beta_list", [1.0])[0]
    alpha = mp.get("alpha_list", [0.01])[0]
    il = mp.get("il_list", [0.0])[0]
    return build_model(exp_type, common.get("exp_data", "mnist"), mp,
                       beta=beta, alpha=alpha, il=il)


def _sample_input_for(model):
    """Shape-correct dummy input to initialize parameter templates."""
    if getattr(model, "data_type", None) == "set":
        return np.zeros((2, model.num_points, 3), np.float32)
    if getattr(model, "data_type", None) == "1d":
        return np.zeros((2, model.in_channel), np.float32)
    return np.zeros((2, model.input_dim, model.input_dim, model.in_channel), np.float32)


def generate_samples(model, state, n_samples, batch_size=32, seed=0,
                     quant=None):
    """Batched z ~ N(0, I) -> decode (test.py:113-140).

    quant="int8" serves the dense layers from per-channel int8 weights
    (serving/quant.py — the MXU's double-rate int8 path; beyond the
    reference, which has no quantization story)."""
    if quant == "int8":
        from vae_song_tpu.serving import (
            make_quantized_decode,
            quantize_dense_params,
        )

        table = quantize_dense_params(state.params)
        decode_q = make_quantized_decode(model, state.batch_stats)
        decode_fn = lambda st, z: decode_q(table, st.params, z)
    elif quant not in (None, "none"):
        raise ValueError(f"unknown quant mode {quant!r}")
    else:
        _, decode_fn, _ = make_apply_fns(model)
    key = jax.random.PRNGKey(seed)
    samples = []
    for i in range(0, n_samples, batch_size):
        bs = min(batch_size, n_samples - i)
        z = jax.random.normal(jax.random.fold_in(key, i), (batch_size, model.latent_channel))
        out = decode_fn(state, z)
        samples.append(np.asarray(out)[:bs])
    return np.concatenate(samples, axis=0)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate samples from a trained model")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--param_dir", type=str, required=True,
                        help="path to a .pkl params checkpoint")
    parser.add_argument("--n_samples", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", type=str, default=None,
                        choices=["cpu", "tpu", "cuda"],
                        help="reference-compat flag (test.py:147): "
                             "'cpu' forces the CPU backend; 'tpu'/'cuda' "
                             "(or unset) use the default accelerator")
    parser.add_argument("--quant", type=str, default="none",
                        choices=["none", "int8"],
                        help="serve dense layers from int8 weights "
                             "(serving/quant.py; decode-only PTQ)")
    args = parser.parse_args(argv)

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    config = load_config(args.config)
    model = create_model_from_config(config)

    if not os.path.exists(args.param_dir):
        raise FileNotFoundError(f"Checkpoint file not found: {args.param_dir}")

    params_t, batch_stats_t = init_model(model, _sample_input_for(model), seed=0)
    params, batch_stats = ckpt_lib.load_params_only(args.param_dir, params_t, batch_stats_t)
    tx = make_optimizer(lr=0.0)
    state = TrainState.create(params, batch_stats if batch_stats is not None else batch_stats_t, tx)

    print(f"Loaded model from: {args.param_dir}")
    print(f"Model type: {type(model).__name__}")
    print(f"Generating {args.n_samples} samples...")

    output_dir = os.path.join(os.path.dirname(args.param_dir), "gen_samples")
    os.makedirs(output_dir, exist_ok=True)

    samples = generate_samples(model, state, args.n_samples,
                               args.batch_size, args.seed,
                               quant=args.quant)

    if getattr(model, "data_type", None) == "set":
        print(f"Saving point cloud samples to: {output_dir}")
        for i, points in enumerate(samples):
            viz.save_point_cloud(points, os.path.join(output_dir, f"sample_{i:04d}"))
    else:
        print(f"Saving image samples to: {output_dir}")
        if samples.ndim == 2:  # 1d data: dump one scatter instead
            viz.plot_2d_histogram(samples, filepath=os.path.join(output_dir, "samples_hist.png"))
        else:
            for i in range(0, len(samples), 16):
                batch = np.clip(samples[i : i + 16], 0, 1)
                viz.save_image_grid(batch, os.path.join(output_dir, f"samples_{i//16:04d}.png"), nrow=4)
    print(f"Generation complete! Samples saved to: {output_dir}")
    return output_dir


if __name__ == "__main__":
    main()
