"""Complexity benchmark CLI — the equivalent of the reference's
complexity_benchmark.py: wall-clock + memory per model family on MNIST,
emitting the same complexity_results.csv schema
(complexity_benchmark.py:253-270).

Fixes vs. the reference (documented, not replicated): the reference
runs the staged backward unconditionally, which crashes for VanillaVAE
(detached loss_lr) and LIDVAE (float loss_lr) — here each model uses
its own gradient mode, so all three rows actually run.
"""

import argparse
import csv
import os
import resource
import time
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu import data as data_lib
from vae_song_tpu.data.pipeline import iterate_batches
from vae_song_tpu.models import VanillaVAE, LIDVAE, LRVAE
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import make_train_step, make_eval_step, make_apply_fns
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train import checkpoint as ckpt_lib
from vae_song_tpu.train.loggers import count_params
from vae_song_tpu import viz


from vae_song_tpu.train.profiling import device_memory_mb as get_device_memory_usage_mb


def get_memory_usage_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def train_one_model(model, train_ds, test_ds, augment, epochs, batch_size,
                    num_mc_samples=1, grad_clip=None, seed=42, eval_trials=1):
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    params, batch_stats = init_model(model, train_ds.X[:batch_size], seed=seed, L=num_mc_samples)
    steps_per_epoch = len(train_ds) // batch_size
    # max(1, ...): epochs=0 must not feed cosine_decay a 0-step horizon
    # (0/0 -> NaN lr in the warmup step)
    tx = make_optimizer(lr=1e-2, total_steps=max(1, epochs * steps_per_epoch),
                        grad_clip=grad_clip)
    state = TrainState.create(params, batch_stats, tx)
    train_step = make_train_step(model, tx, L=num_mc_samples)
    eval_step = make_eval_step(model)

    one = jnp.float32(1.0)

    # warm BOTH programs OUTSIDE the timed regions: the torch reference
    # has no compile phase, so including our remote XLA compile
    # (~60-120 s, relay-weather dependent — both of the round-2 table's
    # outliers were exactly this) would time the compiler, not the
    # model. The train warm-up runs on a throwaway deep copy because the
    # step donates its input state; timings close with a scalar fetch
    # (block_until_ready returns early on chained work here).
    rng, warm_key = jax.random.split(rng)
    if augment is not None:
        # the augmentation is its own jitted program — warm it too, or
        # the timed loop's first iterate_batches call compiles it
        # inside the measured region (a ~60-120 s remote compile)
        x0 = next(iter(iterate_batches(
            train_ds, batch_size, rng=np.random.default_rng(seed),
            augment=augment, augment_key=warm_key,
        )))[0]
        _ = float(jnp.asarray(x0).astype(jnp.float32).sum())
    else:
        x0 = jnp.asarray(train_ds.X[:batch_size])
    _wstate, _wm = train_step(
        jax.tree.map(jnp.array, state), jnp.asarray(x0), one, warm_key
    )
    _ = float(_wm["loss"])
    del _wstate
    _warm = eval_step(state, jnp.asarray(test_ds.X[:batch_size]), one, warm_key)
    _ = float(_warm["loss"])

    mem0 = get_memory_usage_mb()
    t0 = time.time()
    m = _wm  # epochs=0 (compile+eval-only invocation): no timed steps
    for epoch in range(epochs):
        rng, ep_key, aug_key = jax.random.split(rng, 3)
        step_keys = jax.random.split(ep_key, steps_per_epoch)
        for i, (x, _y) in enumerate(
            iterate_batches(train_ds, batch_size, rng=np_rng, augment=augment,
                            augment_key=aug_key)
        ):
            state, m = train_step(state, x, one, step_keys[i])
    _ = float(m["loss"])  # scalar fetch: block_until_ready returns
    # early on chained work on this relay (CLAUDE.md)
    train_time = time.time() - t0
    train_mem = max(0.0, get_memory_usage_mb() - mem0)
    # absolute device-resident MB at phase end, not a delta: warmup
    # pre-allocates params/opt-state/compiled buffers (so a delta is
    # ~0 by construction), and the axon backend has no allocator
    # counter — live committed arrays are the honest measurement here
    train_dev = get_device_memory_usage_mb()

    # best-of-N eval timing (round-2's table had a relay-congestion
    # outlier in this slot; a min over trials rejects transient relay
    # weather the same way bench.py's timed trials do)
    mem0 = get_memory_usage_mb()
    rng, ev_key = jax.random.split(rng)
    ev_keys = jax.random.split(ev_key, max(1, len(test_ds) // batch_size))
    eval_time = float("inf")
    totals, n = None, 0
    for _trial in range(max(1, eval_trials)):
        t1 = time.time()
        # metric dicts stay on device, fetched once per trial — the
        # shipped eval loop's relay-latency pattern (train/loop.py)
        ms, n = [], 0
        for i, (x, _y) in enumerate(iterate_batches(test_ds, batch_size, shuffle=False, rng=np_rng)):
            ms.append(eval_step(state, x, one, ev_keys[i]))
            n += 1
        if ms:
            ms_host = jax.device_get(ms)
            totals = {k: float(sum(m[k] for m in ms_host)) for k in ms_host[0]}
        else:
            totals = {"loss": 0.0, "recon": 0.0, "reg": 0.0, "lr": 0.0}
        eval_time = min(eval_time, time.time() - t1)
    eval_mem = max(0.0, get_memory_usage_mb() - mem0)
    eval_dev = get_device_memory_usage_mb()

    return state, {
        "train_time_sec": train_time,
        "eval_time_sec": eval_time,
        "train_memory_mb": train_mem,
        "eval_memory_mb": eval_mem,
        "train_gpu_memory_mb": train_dev,  # column name kept for schema parity
        "eval_gpu_memory_mb": eval_dev,
        "eval_losses": tuple(v / max(n, 1) for v in totals.values()),
    }


def sample_and_save_grids(model, state, output_dir, model_name, num_grids=4, grid_n=8, seed=0):
    os.makedirs(output_dir, exist_ok=True)
    _, decode_fn, _ = make_apply_fns(model)
    key = jax.random.PRNGKey(seed)
    for i in range(num_grids):
        z = jax.random.normal(jax.random.fold_in(key, i), (grid_n * grid_n, model.latent_channel))
        x = np.asarray(decode_fn(state, z))
        if x.ndim == 2:
            side = int(round((x.shape[1]) ** 0.5))
            x = x.reshape(-1, side, side, 1)
        x = np.clip(x, 0.0, 1.0)
        viz.save_image_grid(x, os.path.join(output_dir, f"{model_name}_samples_grid_{i+1}.png"),
                            nrow=grid_n, normalize=False)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Complexity benchmark on MNIST (vae_song_tpu)"
    )
    parser.add_argument("--output_dir", type=str, default="results/complexity_benchmark")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_mc_samples", type=int, default=1)
    parser.add_argument("--alpha", type=float, default=0.1)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--inverse_lipschitz", type=float, default=0.0)
    parser.add_argument("--fake_data", action="store_true")
    parser.add_argument("--eval_trials", type=int, default=1,
                        help="best-of-N eval wall-clock (rejects relay-latency outliers)")
    parser.add_argument("--grad_clip_enabled", action="store_true")
    parser.add_argument("--grad_clip_type", type=str, default="norm", choices=["norm", "value"])
    parser.add_argument("--grad_clip_max_norm", type=float, default=1.0)
    parser.add_argument("--grad_clip_norm_type", type=float, default=2.0,
                        help="p-norm for norm clipping (reference "
                             "complexity_benchmark.py:171)")
    parser.add_argument("--grad_clip_value", type=float, default=1.0)
    parser.add_argument("--device", type=str, default=None,
                        choices=["cpu", "tpu", "cuda"],
                        help="reference-compat flag: 'cpu' forces the "
                             "CPU backend; 'tpu'/'cuda' (or unset) use "
                             "the default accelerator")
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    train_ds, test_ds, augment = data_lib.load_dataset("mnist", fake=args.fake_data, seed=0)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    grad_clip = {
        "enabled": args.grad_clip_enabled,
        "clip_type": args.grad_clip_type,
        "max_norm": args.grad_clip_max_norm,
        "norm_type": args.grad_clip_norm_type,
        "clip_value": args.grad_clip_value,
    }

    models_to_test = [
        ("VanillaVAE", lambda: VanillaVAE.for_dataset(
            "mnist", beta=args.beta, encoder_type="conv", decoder_type="mlp")),
        ("LIDVAE", lambda: LIDVAE.for_dataset(
            "mnist", inverse_lipschitz=args.inverse_lipschitz, beta=args.beta)),
        ("LRVAE", lambda: LRVAE.for_dataset(
            "mnist", beta=args.beta, alpha=args.alpha,
            encoder_type="conv", decoder_type="mlp")),
    ]

    results = []
    for model_name, factory in models_to_test:
        print(f"\n=== Testing {model_name} on MNIST ===", flush=True)
        model = factory()
        state, metrics = train_one_model(
            model, train_ds, test_ds, augment, args.epochs, args.batch_size,
            args.num_mc_samples, grad_clip, eval_trials=args.eval_trials,
        )
        n_params = count_params(state.params)
        model_size_mb = sum(
            v.size * v.dtype.itemsize for v in jax.tree.leaves(state.params)
        ) / (1024.0**2)

        ckpt_lib.save_params_only(
            os.path.join(args.output_dir, "weights", f"{model_name}.pkl"),
            state.params, state.batch_stats,
        )
        sample_and_save_grids(model, state, os.path.join(args.output_dir, "samples"), model_name)

        results.append({
            "model": model_name,
            "parameters": n_params,
            "model_size_mb": model_size_mb,
            "train_time_sec": metrics["train_time_sec"],
            "eval_time_sec": metrics["eval_time_sec"],
            "train_memory_mb": metrics["train_memory_mb"],
            "eval_memory_mb": metrics["eval_memory_mb"],
            "train_gpu_memory_mb": metrics["train_gpu_memory_mb"],
            "eval_gpu_memory_mb": metrics["eval_gpu_memory_mb"],
            "alpha": args.alpha if model_name == "LRVAE" else None,
            "beta": args.beta,
            "inverse_lipschitz": args.inverse_lipschitz if model_name == "LIDVAE" else None,
        })
        print(f"{model_name}: {n_params:,} params, "
              f"train {metrics['train_time_sec']:.1f}s, eval {metrics['eval_time_sec']:.1f}s")

    csv_path = os.path.join(args.output_dir, "complexity_results.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        w.writeheader()
        w.writerows(results)

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join(args.output_dir, f"complexity_benchmark_log_{timestamp}.txt")
    with open(log_file, "w") as f:
        f.write(f"Complexity Benchmark Results - {datetime.now():%Y-%m-%d %H:%M:%S}\n")
        f.write("=" * 80 + "\n")
        for r in results:
            f.write(str(r) + "\n")

    print(f"\nBenchmark complete. Results saved to {args.output_dir}")
    print(f"CSV: {csv_path}")
    return results


if __name__ == "__main__":
    main()
