"""Experiment driver CLI — `python -m vae_song_tpu.cli.main --config
<yaml>`, the equivalent of main.py:395-590: loads the YAML, grid-sweeps
hyperparameters per experiment_type, and runs train_and_test for every
sweep point."""

import argparse

from vae_song_tpu.config import load_config, resolve_names, sweep_grid
from vae_song_tpu.models import build_model
from vae_song_tpu.train.loop import train_and_test


def run_experiment(config_path: str, output_root: str = ".", seed: int = 42,
                   fake_data: bool = False, profile_dir: str | None = None,
                   resume_from: str | None = None, data_parallel: bool = False,
                   checkpoint_every: int | None = None):
    config = load_config(config_path)
    exp_type = config["experiment_type"]
    common = config["common_params"]
    mp = config["model_params"]
    logfilename, resultname = resolve_names(config)
    dataset_params = dict(common.get("dataset_params") or {})
    if fake_data:
        dataset_params["fake"] = True

    points = list(sweep_grid(config))
    if resume_from is not None and len(points) > 1:
        raise ValueError(
            f"--resume_from with a {len(points)}-point sweep grid would restore "
            f"one checkpoint (trained under a single hyperparameter setting) "
            f"into every grid cell; narrow the config to the cell being resumed."
        )

    results = []
    for point in points:
        model = build_model(
            exp_type,
            common["exp_data"],
            mp,
            beta=point["beta"],
            alpha=point["alpha"],
            il=point["il"],
        )
        state, summary = train_and_test(
            model,
            epochs=common["exp_epochs"],
            batch_size=common["batch_size"],
            dataset_name=common["exp_data"],
            logfilename=logfilename,
            resultname=resultname,
            pt_param=common.get("pt_param"),
            num_mc_samples=mp.get("num_mc_samples", 1),
            grad_clip=common.get("grad_clip"),
            wu_strat=common.get("wu_strat", "linear"),
            seed=seed + point["rep"],
            dataset_params=dataset_params,
            output_root=output_root,
            profile_dir=profile_dir,
            resume_from=resume_from,
            data_parallel=data_parallel,
            checkpoint_every=checkpoint_every,
            native_prefetch=bool(common.get("native_prefetch", False)),
            # model_params key: run the attention SetVAE encoder stack
            # as GPipe stages over N devices (parallel/pp_setvae.py)
            pipeline_parallel=int(mp.get("pipeline_parallel", 0)),
            # model_params key: shard a MoE set model's experts
            # one-per-device with all_to_all exchange (parallel/ep.py)
            expert_parallel=bool(mp.get("expert_parallel", False)),
            # model_params key: Megatron-style attention-head/FFN
            # sharding over N devices via GSPMD (parallel/tp.py)
            tensor_parallel=int(mp.get("tensor_parallel", 0)),
            # model_params key: shard the point/sequence axis over N
            # devices (k/v all-gather attention, parallel/sp.py)
            sequence_parallel=int(mp.get("sequence_parallel", 0)),
            # model_params key: SP attention as a ppermute ring with
            # online softmax instead of the k/v all-gather
            sequence_parallel_ring=bool(mp.get("sequence_parallel_ring", False)),
            # model_params key: ZeRO-3-style batch + param + optimizer
            # sharding over all devices (parallel/fsdp.py)
            fsdp=bool(mp.get("fsdp", False)),
            # common_params key: write periodic checkpoints on a worker
            # thread (train/checkpoint.py:AsyncCheckpointer)
            async_checkpoint=bool(common.get("async_checkpoint", False)),
            # common_params key: accumulate each optimizer step over N
            # sequential microbatches (train/steps.py)
            grad_accum=int(common.get("grad_accum", 0)),
        )
        results.append(summary)
    return results


def main():
    parser = argparse.ArgumentParser(description="vae_song_tpu experiment driver")
    parser.add_argument("--config", type=str,
                        default="./configs/config_shapenet_setvae.yaml",
                        help="config file path")
    parser.add_argument("--output_root", type=str, default=".")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--fake_data", action="store_true",
                        help="use synthetic stand-in data for datasets that "
                             "need downloads (no-egress environments)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="jax.profiler trace of training epoch 1 -> this dir")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="full checkpoint (ckpt_*.pkl) to resume training from")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all devices (shard_map DP)")
    parser.add_argument("--checkpoint_every", type=int, default=None,
                        help="save a resumable checkpoint every N epochs")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before building the "
                             "mesh (TPU pod / multi-host DCN launches; "
                             "coordinator auto-detected from the cluster env)")
    args = parser.parse_args()
    if args.multihost:
        from vae_song_tpu.parallel import init_multihost

        pid, nproc = init_multihost()
        print(f"multihost: process {pid}/{nproc}, "
              f"{__import__('jax').device_count()} global devices")
    run_experiment(args.config, args.output_root, args.seed, args.fake_data,
                   args.profile_dir, args.resume_from, args.data_parallel,
                   args.checkpoint_every)


if __name__ == "__main__":
    main()
