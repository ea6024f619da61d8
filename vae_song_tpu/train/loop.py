"""End-to-end train/eval driver — the equivalent of main.train_and_test
(main.py:174-393), built on jitted steps and the host data pipeline.

Everything hot is compiled once per (model, shapes): per-epoch host
work is limited to batch indexing, H2D enqueue, and the (scalar)
warmup-alpha update.
"""

import os
import sys
import time
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu import data as data_lib
from vae_song_tpu.data.pipeline import iterate_batches, num_batches
from vae_song_tpu.ops.warmup import warmup_alpha
from vae_song_tpu.ops import metrics as metrics_lib
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import make_train_step, make_eval_step, make_apply_fns
from vae_song_tpu.train import loggers, checkpoint as ckpt_lib
from vae_song_tpu import viz


def _compute_fid(test_ds, generated: np.ndarray, chunk: int = 256):
    """FID between the test set and generated samples (main.py:349-360
    analogue), computed in-process. With $VST_FID_WEIGHTS pointing at a
    local InceptionV3 checkpoint, features come from the pool3 graph
    (ops/inception.py) and scores are pytorch_fid-comparable; without
    weights (no-egress boxes) a fixed seeded random-conv embedding is
    used — self-consistent across runs of this framework but not
    comparable to Inception-FID numbers.

    The reference shells out to `pytorch_fid` against a `../<dataset>/`
    directory that only exists in its author's checkout; that path is
    dropped here (see README quirks)."""
    from vae_song_tpu.ops import fid as fid_lib

    real = np.asarray(test_ds.X[:5000], np.float32)
    extractor, is_inception = fid_lib.default_extractor(real.shape[1:], seed=0)

    def chunks(a):
        for i in range(0, len(a), chunk):
            yield a[i : i + chunk]

    score = fid_lib.fid_score(extractor, chunks(real), chunks(generated))
    tag = ("InceptionV3 pool3, $VST_FID_WEIGHTS — pytorch_fid-comparable"
           if is_inception else "seeded random-conv features, non-Inception")
    print(f"FID ({tag}): {score:.4f}")
    return score


def synth_run_name(model, alpha=None) -> str:
    """Run-name synthesis (main.py:211-219)."""
    name = type(model).__name__ + datetime.now().strftime(" %m%d%H%M")
    if not type(model).__name__.startswith("NaiveAE"):
        name += "_b=" + str(float(model.beta))
    if type(model).__name__.startswith(("LR", "SetLR")):
        name += "_a=" + str(model.alpha if alpha is None else alpha)
    if getattr(model, "is_log_mse", False):
        name += "_logmse"
    if type(model).__name__ == "LIDVAE":
        name += "_il=" + str(float(model.inverse_lipschitz) / 2.0)
    return name


def init_model(model, sample_x, seed=0, L=1):
    key = jax.random.PRNGKey(seed)
    k_params, k_sampling, k_drop = jax.random.split(key, 3)
    variables = model.init(
        {"params": k_params, "sampling": k_sampling, "dropout": k_drop},
        jnp.asarray(sample_x),
        L=L,
        train=True,
    )
    return variables["params"], variables.get("batch_stats", {})


def multistep_eligible(*, epochs, start_epoch, data_parallel,
                       pipeline_parallel, expert_parallel, tensor_parallel,
                       sequence_parallel, fsdp, grad_accum, use_scan,
                       dataset_nbytes, native_prefetch) -> bool:
    """Gate for the K-steps-per-dispatch path: single-device training
    only, dataset resident in HBM (amortizes the 10-20 ms relay dispatch
    latency; see train/steps.py:make_multistep_train_step).

    "Disabled" may be spelled 1 as well as None/0 for the integer
    strategies — the strategy branches all test `> 1`, so this gate
    must match or a `tensor_parallel: 1` config would silently lose the
    K-step dispatch while still training single-device
    (tests/test_train_steps.py::test_multistep_eligible_gate).
    """
    return (
        epochs > start_epoch  # gen-only mode must not upload the dataset
        and not data_parallel
        and not (pipeline_parallel and pipeline_parallel > 1)
        and not expert_parallel
        and not (tensor_parallel and tensor_parallel > 1)
        and not (sequence_parallel and sequence_parallel > 1)
        and not fsdp
        and not (grad_accum and grad_accum > 1)
        and not use_scan
        and dataset_nbytes < 512 * 1024 * 1024
        # an explicit native_prefetch request keeps the C++ loader path;
        # the device-resident multistep path would never invoke it
        and not native_prefetch
    )


def train_and_test(
    model,
    epochs: int = 100,
    batch_size: int = 128,
    dataset_name: str = "mnist",
    logfilename: str = "log.csv",
    resultname: str = "res",
    pt_param: str | None = None,
    num_mc_samples: int = 1,
    grad_clip: dict | None = None,
    wu_strat: str = "linear",
    seed: int = 42,
    dataset_params: dict | None = None,
    output_root: str = ".",
    lr: float = 1e-2,
    use_cosine: bool = True,
    visualize_artifacts: bool = True,
    checkpoint_every: int | None = None,
    progress: bool = True,
    profile_dir: str | None = None,
    resume_from: str | None = None,
    data_parallel: bool = False,
    native_prefetch: bool = False,
    pipeline_parallel: int = 0,
    expert_parallel: bool = False,
    tensor_parallel: int = 0,
    sequence_parallel: int = 0,
    sequence_parallel_ring: bool = False,
    fsdp: bool = False,
    async_checkpoint: bool = False,
    grad_accum: int = 0,
):
    """Returns (state, summary dict).

    resume_from: a full checkpoint (params + opt state + epoch) saved by
    `checkpoint_every`; training continues from the next epoch — a
    capability the reference lacks entirely (SURVEY.md §5).
    data_parallel: shard batches over all available devices via
    shard_map DP (grad/BN pmean over ICI); params replicated.
    native_prefetch: assemble host batches on the C++ worker threads
    (data/native.py:NativeBatchLoader — the DataLoader(num_workers=8)
    analogue, main.py:186); changes the shuffle stream, so keep it OFF
    when comparing trajectories against non-prefetch runs.
    pipeline_parallel: >= 2 runs the attention SetVAE/SetLRVAE encoder
    stack as GPipe pipeline stages over that many devices
    (parallel/pp_setvae.py); params merge back for eval/checkpoints.
    Composes with data_parallel: device_count // pipeline_parallel
    independent pipelines each take a batch shard, gradients pmean
    across them (make_dp_pp_mesh). Config key `pipeline_parallel` in
    model_params (cli/main.py).
    expert_parallel: train a MoE set model (moe_experts > 1) with its
    experts sharded one-per-device and all_to_all token exchange
    (parallel/ep.py:make_setvae_ep_train_step); batch sharded over the
    'expert' axis so the non-MoE parts run data-parallel. Config key
    `expert_parallel` in model_params (cli/main.py).
    tensor_parallel: >= 2 trains an attention set model Megatron-style
    with attention heads / FFN columns sharded over that many devices
    via GSPMD param shardings (parallel/tp.py) — XLA inserts the
    activation all-reduces. Composes with data_parallel on a
    ('data', 'model') mesh. Config key `tensor_parallel` in
    model_params (cli/main.py).
    sequence_parallel: >= 2 shards the POINT axis of an attention set
    model over that many devices (parallel/sp.py): k/v all-gather
    attention, pmax pooling, per-shard Chamfer — the scaling path for
    clouds larger than one chip's HBM. Composes with data_parallel on
    a ('data', 'seq') mesh. Config key `sequence_parallel` in
    model_params (cli/main.py). sequence_parallel_ring=True swaps the
    all-gather k/v for the ppermute ring with online softmax
    (ops/attention.py:ring_attention; key `sequence_parallel_ring`).
    fsdp: ZeRO-3-style data parallelism for ANY model family — batch
    sharded over all devices AND large params + Adam moments sharded
    over the same axis (parallel/fsdp.py; XLA inserts the all-gather /
    reduce-scatter pattern). Subsumes data_parallel (which it
    overrides), with exact global BatchNorm statistics; composes with
    tensor_parallel into 2-D (data x model) weight sharding on the
    attention set models. Config key `fsdp` in model_params
    (cli/main.py).
    async_checkpoint: write `checkpoint_every` snapshots on a worker
    thread after an on-device copy (checkpoint.AsyncCheckpointer) so
    the ~30 MB/s relay fetch overlaps training instead of stalling it;
    all writes are joined before train_and_test returns. Config key
    `async_checkpoint` in common_params (cli/main.py).
    grad_accum: >= 2 accumulates each optimizer step over that many
    sequential microbatches (steps.make_accum_train_step) — batch
    sizes past one chip's activation HBM on the single-device path.
    Config key `grad_accum` in common_params (cli/main.py).
    """
    dataset_params = dataset_params or {}
    train_ds, test_ds, augment = data_lib.load_dataset(dataset_name, **dataset_params)
    data_type = "1d" if dataset_name in ("pinwheel", "chessboard") else "2d"
    if getattr(model, "data_type", None) == "set":
        data_type = "set"

    steps_per_epoch = num_batches(train_ds, batch_size)
    if steps_per_epoch == 0:
        raise ValueError("Dataset smaller than one batch")

    rng = jax.random.PRNGKey(seed)
    params, batch_stats = init_model(
        model, train_ds.X[:batch_size], seed=seed, L=num_mc_samples
    )

    active_strategies = [
        name
        for name, on in (
            ("pipeline_parallel", pipeline_parallel and pipeline_parallel > 1),
            ("expert_parallel", expert_parallel),
            ("tensor_parallel", tensor_parallel and tensor_parallel > 1),
            ("sequence_parallel", sequence_parallel and sequence_parallel > 1),
        )
        if on
    ]
    if len(active_strategies) > 1:
        raise ValueError(
            f"{' and '.join(active_strategies)} are exclusive (each owns "
            "the device mesh; compose with data_parallel instead)"
        )
    if fsdp and active_strategies and active_strategies != ["tensor_parallel"]:
        raise ValueError(
            f"fsdp and {active_strategies[0]} are exclusive (fsdp composes "
            "only with tensor_parallel: 2-D data x model weight sharding)"
        )
    if grad_accum and grad_accum > 1 and (
        active_strategies or fsdp or data_parallel
    ):
        raise ValueError(
            "grad_accum is the single-device microbatching path; it does "
            "not compose with the parallel strategies (shard the batch "
            "instead)"
        )
    if sequence_parallel_ring and not (
        sequence_parallel and sequence_parallel > 1
    ):
        # refuse loudly like every other inconsistent strategy combo:
        # silently training plain dense attention while the user believes
        # they benchmarked ring attention is worse than an error
        raise ValueError(
            "sequence_parallel_ring selects the ring variant OF sequence "
            f"parallelism; it requires sequence_parallel >= 2 (got "
            f"{sequence_parallel})"
        )

    # PP/EP hold per-device-DIFFERENT grad slices inside shard_map, so a
    # norm clip chained into tx would compute a different global norm on
    # every device and silently de-replicate the replicated params; those
    # step builders apply the clip themselves with the true (psum'd)
    # global norm (parallel/optree.py:make_shardmap_clip). The tx keeps
    # an identity placeholder in the clip slot so opt_state checkpoints
    # stay structure-compatible across strategies.
    clip_in_step = bool(
        (pipeline_parallel and pipeline_parallel > 1) or expert_parallel
    )
    tx = make_optimizer(
        lr=lr,
        total_steps=max(1, epochs * steps_per_epoch) if use_cosine else None,
        grad_clip=grad_clip,
        clip_in_step=clip_in_step,
    )
    state = TrainState.create(params, batch_stats, tx)

    if pt_param is not None:
        if not os.path.exists(pt_param):
            raise FileNotFoundError(f"No such file: {pt_param}")
        p, bs = ckpt_lib.load_params_only(pt_param, state.params, state.batch_stats)
        state = state.replace(params=p, batch_stats=bs if bs is not None else state.batch_stats)

    start_epoch = 0
    resume_extra = {}
    if resume_from is not None:
        state, ckpt_epoch, resume_extra = ckpt_lib.load_checkpoint(resume_from, state)
        start_epoch = ckpt_epoch + 1

    # multi-process launches (init_multihost): only process 0 writes the
    # shared result tree; other processes write to a throwaway dir so
    # the loggers stay callable without file races
    is_main = jax.process_index() == 0
    if not is_main:
        import tempfile

        output_root = tempfile.mkdtemp(prefix="vst_nonmain_")

    name = synth_run_name(model)
    result_dir = os.path.join(output_root, "results", resultname, name)
    os.makedirs(os.path.join(result_dir, "params"), exist_ok=True)

    writer = loggers.TensorBoardWriter(os.path.join(output_root, "runs", name))
    explog = loggers.create_experiment_logger(result_dir, name)
    explog.log_hyperparameters(
        epochs=epochs,
        batch_size=batch_size,
        device=str(jax.devices()[0]),
        dataset_name=dataset_name,
        num_mc_samples=num_mc_samples,
        wu_strat=wu_strat,
        grad_clip=grad_clip,
    )
    explog.log_model_info(model, state.params)

    # fully on-device epoch path: MLP-family models whose whole dataset
    # fits in HBM train one epoch per dispatch via lax.scan (conv models
    # stay on the dispatched step: conv-in-scan is slow on this backend)
    def _model_uses_conv(m) -> bool:
        if type(m).__name__ == "LIDVAE":
            return m.data_type == "2d"  # LIDVAE's 2d encoder is conv
        return (
            getattr(m, "encoder_type", "mlp") == "conv"
            or getattr(m, "decoder_type", "mlp") == "conv"
        )

    if data_parallel and jax.device_count() == 1:
        # silently training single-device while the user believes they
        # benchmarked DP would be worse than a loud downgrade (the same
        # rule as the sequence-parallel ring guard); normalizing the
        # flag here keeps the scan/multistep dispatch paths available
        print(
            "WARNING: data_parallel requested but only 1 device is "
            "visible; training single-device",
            flush=True,
        )
        data_parallel = False

    use_scan = (
        not data_parallel
        and not fsdp
        and not (grad_accum and grad_accum > 1)
        and augment is None
        and not _model_uses_conv(model)
        and getattr(model, "data_type", None) != "set"
        and train_ds.X.nbytes < 512 * 1024 * 1024
        # gen-only mode / fully-resumed runs must not pay the dataset
        # upload for a loop that never executes (same guard as
        # multistep_eligible's epochs test)
        and epochs > start_epoch
    )

    pp_sync = None
    if pipeline_parallel and pipeline_parallel > 1:
        if jax.device_count() < pipeline_parallel:
            raise ValueError(
                f"pipeline_parallel={pipeline_parallel} needs that many "
                f"devices; have {jax.device_count()}"
            )
        from vae_song_tpu.parallel.pp import make_pp_mesh
        from vae_song_tpu.parallel.pp_setvae import (
            make_dp_pp_mesh, make_setvae_pp_train_step, merge_opt_state,
            merge_params, shard_pp_setvae_state, split_opt_state,
            split_params,
        )

        # data_parallel composes: every group of `pipeline_parallel`
        # devices forms one pipeline, batch shards across the groups
        n_data = (
            jax.device_count() // pipeline_parallel if data_parallel else 1
        )
        if data_parallel and n_data < 2:
            raise ValueError(
                f"data_parallel x pipeline_parallel={pipeline_parallel} "
                f"needs >= {2 * pipeline_parallel} devices; have "
                f"{jax.device_count()}"
            )
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide over {n_data} "
                "data-parallel pipelines"
            )
        pp_mesh = (
            make_dp_pp_mesh(n_data, pipeline_parallel)
            if n_data > 1 else make_pp_mesh(pipeline_parallel)
        )
        # GPipe wants n_micro >= n_stages for a small bubble; pick the
        # smallest multiple of n_stages dividing the PER-PIPELINE batch,
        # else fall back to any divisor
        shard_bs = batch_size // n_data
        n_micro = next(
            (m for m in range(pipeline_parallel, 4 * pipeline_parallel + 1)
             if shard_bs % m == 0),
            1,
        )
        pp_step_fn = make_setvae_pp_train_step(
            model, tx, pp_mesh, n_micro, grad_clip=grad_clip
        )
        pp_n_layers = model.num_encoder_layers
        pp0 = split_params(state.params, pp_n_layers)
        # restore Adam moments + schedule position from the TrainState's
        # opt_state (identical to tx.init on a fresh run; carries the
        # checkpointed moments on resume_from)
        pp_opt0 = split_opt_state(state.opt_state, state.params, pp_n_layers)
        pp_sharded, pp_opt = shard_pp_setvae_state(pp0, pp_opt0, pp_mesh, tx)
        pp_box = {"params": pp_sharded, "opt": pp_opt}

        # step count stays a HOST integer: a device-scalar add per step
        # would cost a fixed dispatch latency in the hot loop
        pp_ctr = {"steps": int(state.step)}

        def train_step(state, x, wu, key):
            pp_box["params"], pp_box["opt"], m = pp_step_fn(
                pp_box["params"], pp_box["opt"], x, wu, key
            )
            pp_ctr["steps"] += 1
            return state, m

        def pp_sync(state, with_opt=False):
            # merge params back into the TrainState so eval/checkpoint/
            # artifact paths see the trained run. The Adam state (2x the
            # params' bytes over a ~30 MB/s fetch tunnel) is merged only
            # when a checkpoint actually needs it (with_opt).
            merged = merge_params(
                jax.device_get(pp_box["params"]), pp_n_layers
            )
            state = state.replace(
                params=jax.tree.map(jnp.asarray, merged),
                step=jnp.asarray(pp_ctr["steps"], jnp.int32),
            )
            if with_opt:
                merged_opt = merge_opt_state(
                    jax.device_get(pp_box["opt"]), pp0, pp_n_layers
                )
                state = state.replace(
                    opt_state=jax.tree.map(jnp.asarray, merged_opt)
                )
            return state

        eval_step = make_eval_step(model)

    mesh = None
    if pipeline_parallel and pipeline_parallel > 1:
        pass  # steps built above
    elif expert_parallel:
        n_exp = int(getattr(model, "moe_experts", 0))
        if data_parallel:
            raise ValueError("expert_parallel and data_parallel are exclusive")
        if n_exp < 2:
            raise ValueError(
                "expert_parallel needs a MoE set model (model_params key "
                f"moe_experts >= 2; got {n_exp})"
            )
        if jax.device_count() < n_exp:
            raise ValueError(
                f"expert_parallel needs moe_experts={n_exp} devices; "
                f"have {jax.device_count()}"
            )
        if batch_size % n_exp != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide over {n_exp} experts"
            )
        from jax.sharding import NamedSharding, PartitionSpec
        from vae_song_tpu.parallel.ep import (
            EXPERT_AXIS, make_ep_mesh, make_setvae_ep_train_step,
            make_setvae_ep_eval_step, shard_setvae_ep_state,
        )

        ep_mesh = make_ep_mesh(n_exp)
        ep_train = make_setvae_ep_train_step(
            model, tx, ep_mesh, state, L=num_mc_samples, grad_clip=grad_clip
        )
        ep_eval = make_setvae_ep_eval_step(
            model, ep_mesh, state, L=num_mc_samples
        )
        state = shard_setvae_ep_state(state, ep_mesh)
        ep_x_sharding = NamedSharding(ep_mesh, PartitionSpec(EXPERT_AXIS))

        def train_step(state, x, wu, key):
            return ep_train(state, jax.device_put(x, ep_x_sharding), wu, key)

        def eval_step(state, x, wu, key):
            return ep_eval(state, jax.device_put(x, ep_x_sharding), wu, key)
    elif tensor_parallel and tensor_parallel > 1:
        if getattr(model, "data_type", None) != "set" or not getattr(
            model, "use_attention", False
        ):
            raise ValueError(
                "tensor_parallel targets the attention set models "
                "(Megatron-style head/FFN sharding, parallel/tp.py); "
                f"got {type(model).__name__}"
            )
        # fsdp shards weights over 'data', so it needs the axis to span
        # the remaining devices even without data_parallel batch intent
        n_data = (
            jax.device_count() // tensor_parallel
            if (data_parallel or fsdp) else 1
        )
        if (data_parallel or fsdp) and n_data < 2:
            raise ValueError(
                f"{'fsdp' if fsdp else 'data_parallel'} x tensor_parallel="
                f"{tensor_parallel} needs >= {2 * tensor_parallel} devices; "
                f"have {jax.device_count()}"
            )
        if jax.device_count() < n_data * tensor_parallel:
            raise ValueError(
                f"tensor_parallel={tensor_parallel} needs that many "
                f"devices; have {jax.device_count()}"
            )
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide over {n_data} "
                "data-parallel shards"
            )
        if model.num_heads % tensor_parallel != 0:
            raise ValueError(
                f"num_heads={model.num_heads} must divide over "
                f"tensor_parallel={tensor_parallel} 'model' shards"
            )
        from jax.sharding import NamedSharding, PartitionSpec
        from vae_song_tpu.parallel.mesh import make_mesh

        tp_mesh = make_mesh(n_data, tensor_parallel)
        if fsdp:
            # 2-D weight sharding: attention/FFN on 'model' AND large
            # free axes + adam moments on 'data' (parallel/fsdp.py)
            from vae_song_tpu.parallel.fsdp import (
                make_tp_fsdp_train_step, shard_state_tp_fsdp,
            )

            state = shard_state_tp_fsdp(state, tp_mesh)
            tp_step = make_tp_fsdp_train_step(
                model, tx, tp_mesh, state, L=num_mc_samples
            )
        else:
            from vae_song_tpu.parallel.tp import (
                make_tp_dp_train_step, shard_state,
            )

            state = shard_state(state, tp_mesh)
            tp_step = make_tp_dp_train_step(
                model, tx, tp_mesh, state, L=num_mc_samples
            )
        tp_x_sharding = NamedSharding(tp_mesh, PartitionSpec("data"))

        def train_step(state, x, wu, key):
            return tp_step(state, jax.device_put(x, tp_x_sharding), wu, key)

        # plain jitted eval: the params stay committed to their TP
        # shardings, so GSPMD partitions the forward pass the same way;
        # the batch shards over 'data' like in training
        _tp_eval = make_eval_step(model)

        def eval_step(state, x, wu, key):
            return _tp_eval(state, jax.device_put(x, tp_x_sharding), wu, key)
    elif sequence_parallel and sequence_parallel > 1:
        if getattr(model, "data_type", None) != "set":
            raise ValueError(
                "sequence_parallel shards the POINT axis of the attention "
                f"set models (parallel/sp.py); got {type(model).__name__}"
            )
        from vae_song_tpu.parallel.sp import (
            make_sp_eval_step, make_sp_mesh, make_sp_train_step, shard_points,
        )

        n_data = (
            jax.device_count() // sequence_parallel if data_parallel else 1
        )
        if data_parallel and n_data < 2:
            raise ValueError(
                f"data_parallel x sequence_parallel={sequence_parallel} "
                f"needs >= {2 * sequence_parallel} devices; have "
                f"{jax.device_count()}"
            )
        if jax.device_count() < n_data * sequence_parallel:
            raise ValueError(
                f"sequence_parallel={sequence_parallel} needs that many "
                f"devices; have {jax.device_count()}"
            )
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide over {n_data} "
                "data-parallel shards"
            )
        sp_mesh = make_sp_mesh(n_data, sequence_parallel)
        sp_train = make_sp_train_step(
            model, tx, sp_mesh, L=num_mc_samples, ring=sequence_parallel_ring
        )
        sp_eval = make_sp_eval_step(
            model, sp_mesh, L=num_mc_samples, ring=sequence_parallel_ring
        )

        def train_step(state, x, wu, key):
            return sp_train(state, shard_points(x, sp_mesh), wu, key)

        def eval_step(state, x, wu, key):
            return sp_eval(state, shard_points(x, sp_mesh), wu, key)
    elif fsdp:
        from jax.sharding import NamedSharding, PartitionSpec
        from vae_song_tpu.parallel.fsdp import (
            make_fsdp_mesh, make_fsdp_train_step, shard_state,
        )

        n_dev = jax.device_count()
        if batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide over {n_dev} "
                "fsdp batch shards"
            )
        fsdp_mesh = make_fsdp_mesh(n_dev)
        state = shard_state(state, fsdp_mesh)
        fsdp_step = make_fsdp_train_step(
            model, tx, fsdp_mesh, state, L=num_mc_samples
        )
        fsdp_x_sharding = NamedSharding(fsdp_mesh, PartitionSpec("data"))

        def train_step(state, x, wu, key):
            return fsdp_step(
                state, jax.device_put(x, fsdp_x_sharding), wu, key
            )

        # params stay committed to their FSDP shardings, so the plain
        # jitted eval partitions the forward pass the same way; the
        # batch shards over 'data' like in training
        _fsdp_eval = make_eval_step(model)

        def eval_step(state, x, wu, key):
            return _fsdp_eval(
                state, jax.device_put(x, fsdp_x_sharding), wu, key
            )
    elif data_parallel:
        from vae_song_tpu.parallel import (
            make_mesh, replicate_state, make_dp_train_step, make_dp_eval_step,
            shard_batch,
        )

        mesh = make_mesh()
        state = replicate_state(state, mesh)
        train_step_dp = make_dp_train_step(model, tx, mesh, L=num_mc_samples)
        eval_step_dp = make_dp_eval_step(model, mesh)

        def train_step(state, x, wu, key):
            return train_step_dp(state, shard_batch(x, mesh), wu, key)

        def eval_step(state, x, wu, key):
            return eval_step_dp(state, shard_batch(x, mesh), wu, key)
    else:
        if grad_accum and grad_accum > 1:
            if batch_size % grad_accum != 0:
                raise ValueError(
                    f"batch_size={batch_size} must divide over "
                    f"grad_accum={grad_accum} microbatches"
                )
            from vae_song_tpu.train.steps import make_accum_train_step

            train_step = make_accum_train_step(
                model, tx, grad_accum, L=num_mc_samples
            )
        else:
            train_step = make_train_step(model, tx, L=num_mc_samples)
        eval_step = make_eval_step(model)

    # multi-step dispatch path: conv/augmented models whose dataset fits
    # in HBM train K steps per dispatch from a device-resident array
    # (amortizes relay dispatch latency; see make_multistep_train_step)
    multi_step = None
    multi_k = 1
    is_set = getattr(model, "data_type", None) == "set"
    ms_eligible = multistep_eligible(
        epochs=epochs, start_epoch=start_epoch,
        data_parallel=data_parallel, pipeline_parallel=pipeline_parallel,
        expert_parallel=expert_parallel, tensor_parallel=tensor_parallel,
        sequence_parallel=sequence_parallel, fsdp=fsdp,
        grad_accum=grad_accum, use_scan=use_scan,
        dataset_nbytes=train_ds.X.nbytes, native_prefetch=native_prefetch,
    )
    if ms_eligible:
        from vae_song_tpu.train.steps import pick_multistep_k

        multi_k = pick_multistep_k(steps_per_epoch, is_set)
        if multi_k > 1:
            if is_set:
                # set models: lax.scan body — compiles ONCE regardless
                # of K (the unrolled variant re-lowers the transformer
                # K times, ~25 s/step remote), and set models carry no
                # conv-in-scan penalty. 70.2 ms/step wall at K=9 vs
                # 74.4 single-dispatch on v5e (train/steps.py).
                from vae_song_tpu.train.steps import (
                    make_scanned_multistep_train_step as _make_ms,
                )
            else:
                from vae_song_tpu.train.steps import (
                    make_multistep_train_step as _make_ms,
                )

            multi_step = _make_ms(
                model, tx, multi_k, L=num_mc_samples, augment=augment
            )
            train_X_multistep = jnp.asarray(train_ds.X)

    epoch_fit = None
    eval_epoch_fit = None
    if use_scan:
        from vae_song_tpu.train.scan import make_scanned_trainer

        epoch_fit = make_scanned_trainer(
            model, tx, batch_size, epochs=1, L=num_mc_samples,
        )
        train_X_dev = jnp.asarray(train_ds.X)

        nb_test = num_batches(test_ds, batch_size)
        test_X_batches = jnp.asarray(
            test_ds.X[: nb_test * batch_size].reshape(
                nb_test, batch_size, *test_ds.X.shape[1:]
            )
        )

        # test set smaller than one batch: a lax.scan over 0 items means
        # .mean() of empty -> NaN in every logged eval metric; fall back
        # to the dispatched eval loop, which reports 0.0 like drop_last
        if nb_test == 0:
            test_X_batches = None

        @jax.jit
        def eval_epoch_fit(state, xb, wu_alpha, rng):
            keys = jax.random.split(rng, xb.shape[0])

            def body(_, inp):
                x, k = inp
                outs = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    x, train=False, rngs={"sampling": k},
                )
                total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
                return None, {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}

            _, ms = jax.lax.scan(body, None, (xb, keys))
            return jax.tree.map(lambda v: v.mean(), ms)

    # ---- batched eval for the DISPATCHED families (conv / set) ----
    # the dispatched eval loop pays one relay dispatch per test batch
    # (~39 dispatches/epoch on MNIST = ~0.6 s of pure relay tax); when
    # the single-device multistep path is active the test set is small
    # enough to live on device, so eval the whole epoch in one scan
    # dispatch (set models) or nb/K unrolled-chunk dispatches (conv —
    # conv-in-scan is ~20x slower, train/scan.py note). 1d MLP models
    # already take the use_scan eval above; their dispatched fallback
    # shuffles eval batches, so they are excluded here to keep batch
    # composition identical to the legacy path.
    fast_eval_scan = None
    fast_eval_chunk = None
    fast_eval_k = 1
    test_X_stack = None
    if (
        eval_epoch_fit is None
        and ms_eligible
        and data_type != "1d"
        and test_ds.X.nbytes < 512 * 1024 * 1024
    ):
        nb_test = num_batches(test_ds, batch_size)
        if nb_test > 0:
            from vae_song_tpu.train.steps import (
                make_scanned_eval_epoch,
                make_unrolled_eval_chunk,
                pick_multistep_k as _pick_k,
            )

            if is_set:
                fast_eval_scan = make_scanned_eval_epoch(model)
            else:
                fast_eval_k = _pick_k(nb_test, False)
                if fast_eval_k > 1:
                    fast_eval_chunk = make_unrolled_eval_chunk(
                        model, fast_eval_k
                    )
            if fast_eval_scan is not None or fast_eval_chunk is not None:
                test_X_stack = jnp.asarray(
                    test_ds.X[: nb_test * batch_size].reshape(
                        nb_test, batch_size, *test_ds.X.shape[1:]
                    )
                )
    encode_fn, decode_fn, forward_fn = make_apply_fns(model)

    has_warmup = hasattr(model, "alpha") and type(model).__name__.startswith(("LR", "SetLR"))
    wu_alpha = 0.0
    last_kl = 0.0
    if has_warmup and start_epoch > 0:
        if "wu_alpha" in resume_extra:
            # restored warmup state: exact continuation, including the
            # KL-history-dependent kl_adaptive strategy (model.py:37-63
            # semantics under resume)
            wu_alpha = float(resume_extra["wu_alpha"])
            last_kl = float(resume_extra.get("last_kl", 0.0))
        else:
            # legacy checkpoint without warmup state: replay the
            # deterministic schedules (kl_adaptive degrades to alpha(kl=0))
            for e in range(start_epoch):
                wu_alpha = warmup_alpha(wu_alpha, e, epochs, wu_strat, last_kl_loss=last_kl)
    t_start = time.time()
    eval_means = {"loss": 0.0, "recon": 0.0, "reg": 0.0, "lr": 0.0}
    last_eval_batch = None  # stays None when test set < one batch
    async_ckpt = (
        ckpt_lib.AsyncCheckpointer()
        if async_checkpoint and checkpoint_every else None
    )

    for epoch in range(start_epoch, epochs):
        if has_warmup:
            wu_alpha = warmup_alpha(
                wu_alpha, epoch, epochs, wu_strat, last_kl_loss=last_kl
            )
            explog.log_alpha_value(epoch, wu_alpha)

        tot = {"loss": 0.0, "recon": 0.0, "reg": 0.0, "lr": 0.0}
        # resume-invariant per-epoch randomness: keys are folded from the
        # base key by epoch index (not threaded sequentially), so a run
        # resumed at epoch k replays exactly the continuous trajectory
        ep_key, aug_key, ev_key = jax.random.split(jax.random.fold_in(rng, epoch), 3)
        ep_np_rng = np.random.default_rng([seed, epoch])
        # hoist per-step device constants out of the hot loop: scalar H2D
        # transfers and fold_in dispatches cost ~ms each on tunneled TPUs
        wu_dev = jnp.float32(wu_alpha)
        step_keys = None if epoch_fit is not None else jax.random.split(ep_key, steps_per_epoch)
        profiling_this_epoch = profile_dir is not None and epoch == 1
        if profiling_this_epoch:
            # profile epoch 1 (epoch 0 includes compilation)
            from vae_song_tpu.train.profiling import trace

            prof_ctx = trace(profile_dir)
            prof_ctx.__enter__()
        if epoch_fit is not None:
            # one dispatch for the whole epoch; metrics are step-means +
            # the last batch's KL (feeds kl_adaptive like model.py:614)
            state, em = epoch_fit(
                state, train_X_dev, wu_dev.reshape(1), ep_key
            )
            em_host = jax.device_get(em)
            nb = 1  # epoch metrics are already step-means
            for k in tot:
                tot[k] = float(em_host[k])
            last_batch_raw_kl = float(em_host.get("last_raw_kl", em_host.get("raw_kl", 0.0)))
        elif multi_step is not None:
            # K steps per dispatch from the device-resident dataset:
            # only [K, B] int32 indices + keys cross the host boundary.
            # Every per-chunk relay op costs fixed latency on tunneled
            # TPUs, so the hot loop below issues EXACTLY ONE op per
            # chunk: the epoch's indices upload in one transfer, the
            # key/index chunk slices pre-dispatch before the loop, and
            # metrics accumulate host-side from one device_get of the
            # per-chunk means (5 scalars each) after the loop.
            idx = np.arange(len(train_ds))
            ep_np_rng.shuffle(idx)
            nchunks = steps_per_epoch // multi_k
            idx_dev = jnp.asarray(
                idx[: steps_per_epoch * batch_size].astype(np.int32).reshape(
                    nchunks, multi_k, batch_size
                )
            )
            sk = step_keys.reshape(nchunks, multi_k, *step_keys.shape[1:])
            ak = jax.random.split(aug_key, steps_per_epoch).reshape(sk.shape)
            chunks = [(idx_dev[c], sk[c], ak[c]) for c in range(nchunks)]
            ms = []
            for cx, ck, ca in chunks:
                state, m = multi_step(
                    state, train_X_multistep, cx, wu_dev, ck, ca
                )
                ms.append(m)
            ms_host = jax.device_get(ms)
            for k in tot:
                tot[k] += float(sum(m[k] for m in ms_host))
            nb = nchunks  # chunk metrics are already K-step means
            last_batch_raw_kl = float(ms_host[-1]["raw_kl"])
        else:
            # keep per-step metric dicts on device and fetch ONCE per
            # epoch: each extra per-step op (accumulating adds, scalar
            # fetches) costs a fixed relay latency here
            ms = []
            for i, (x, _y) in enumerate(
                iterate_batches(
                    train_ds, batch_size, rng=ep_np_rng,
                    augment=augment, augment_key=aug_key,
                    native_prefetch=native_prefetch,
                )
            ):
                state, m = train_step(state, x, wu_dev, step_keys[i])
                ms.append(m)
            ms_host = jax.device_get(ms)
            for k in tot:
                tot[k] += float(sum(m[k] for m in ms_host))
            nb = steps_per_epoch
            last_batch_raw_kl = float(ms_host[-1]["raw_kl"])
        if profiling_this_epoch:
            # every path above just device_get'd the LAST step's metric
            # scalars, which forces the whole step stream (PP included —
            # its metrics come out of the same pipelined program) to
            # completion before the trace closes. That scalar fetch is
            # the reliable chain-closer on this backend —
            # jax.block_until_ready returns early on chained work here
            # (CLAUDE.md).
            prof_ctx.__exit__(None, None, None)
        writer.add_scalar("loss/train", tot["loss"] / nb, epoch)
        writer.add_scalar("recon/train", tot["recon"] / nb, epoch)
        writer.add_scalar("reg/train", tot["reg"] / nb, epoch)

        # feed kl_adaptive warmup with the LAST batch's raw (unscaled)
        # KL — the reference stores loss_reg per loss() call so the
        # final batch wins (model.py:62, 614); beta-independent
        last_kl = last_batch_raw_kl if has_warmup else 0.0

        # pipeline-parallel: merge the stage-sharded encoder stack back
        # into the flax tree so eval/checkpoint/artifact paths see the
        # trained params (+ the optimizer state when this epoch writes a
        # checkpoint, or at the end so the returned state is complete)
        last_epoch = epoch == epochs - 1
        if pp_sync is not None:
            state = pp_sync(
                state,
                with_opt=last_epoch or bool(
                    checkpoint_every and (epoch + 1) % checkpoint_every == 0
                ),
            )

        # ---- eval every epoch (main.py:303) ----
        ev = {"loss": 0.0, "recon": 0.0, "reg": 0.0, "lr": 0.0}
        n_test_batches = num_batches(test_ds, batch_size)
        if eval_epoch_fit is not None and test_X_batches is not None:
            em = jax.device_get(eval_epoch_fit(state, test_X_batches, wu_dev, ev_key))
            eval_means = {k: float(v) for k, v in em.items()}
            if last_epoch:
                sel = ep_np_rng.permutation(len(test_ds))[:batch_size]
                last_eval_batch = (jnp.asarray(test_ds.X[sel]), test_ds.y[sel])
        elif test_X_stack is not None:
            nb = test_X_stack.shape[0]
            ev_keys = jax.random.split(ev_key, nb)
            if fast_eval_scan is not None:
                em = jax.device_get(
                    fast_eval_scan(state, test_X_stack, wu_dev, ev_key)
                )
            else:
                # conv: nb/K unrolled-chunk dispatches, fetched once
                chunks = [
                    fast_eval_chunk(
                        state,
                        test_X_stack[c : c + fast_eval_k],
                        wu_dev,
                        ev_keys[c : c + fast_eval_k],
                    )
                    for c in range(0, nb, fast_eval_k)
                ]
                ch = jax.device_get(chunks)
                em = {
                    k: sum(float(c[k]) for c in ch) / len(ch) for k in ch[0]
                }
            eval_means = {k: float(v) for k, v in em.items()}
            if last_epoch:
                y_tail = (
                    test_ds.y[(nb - 1) * batch_size : nb * batch_size]
                    if getattr(test_ds, "y", None) is not None
                    else None
                )
                last_eval_batch = (test_X_stack[-1], y_tail)
        else:
            ev_keys = jax.random.split(ev_key, max(n_test_batches, 1))
            # keep per-batch metric dicts on device and fetch ONCE —
            # the same relay-latency rule as the train loop above
            # (per-batch accumulating adds are extra dispatched ops)
            ev_ms = []
            n_eval = 0
            for i, (x, yb) in enumerate(
                iterate_batches(test_ds, batch_size, shuffle=(data_type == "1d"), rng=ep_np_rng)
            ):
                ev_ms.append(eval_step(state, x, wu_dev, ev_keys[i]))
                n_eval += 1
                last_eval_batch = (x, yb)
            if ev_ms:
                ev_host = jax.device_get(ev_ms)
                for k in ev:
                    ev[k] += float(sum(m[k] for m in ev_host))
            eval_means = {k: v / max(n_eval, 1) for k, v in ev.items()}
        writer.add_scalar("loss/test", eval_means["loss"], epoch)

        if progress and (epoch % max(1, epochs // 20) == 0 or last_epoch):
            print(
                f"[{name}] epoch {epoch}: train loss {tot['loss']/nb:.4f} "
                f"recon {tot['recon']/nb:.4f} reg {tot['reg']/nb:.4f} "
                f"| test loss {eval_means['loss']:.4f}",
                flush=True,
            )

        if checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            ckpt_path = os.path.join(result_dir, "params", f"ckpt_{epoch}.pkl")
            ckpt_extra = {"wu_alpha": float(wu_alpha), "last_kl": float(last_kl)}
            if async_ckpt is not None:
                async_ckpt.submit(ckpt_path, state, epoch, extra=ckpt_extra)
            else:
                ckpt_lib.save_checkpoint(ckpt_path, state, epoch, extra=ckpt_extra)

        if last_epoch:
            ckpt_lib.save_params_only(
                os.path.join(result_dir, "params", f"model_{epoch}.pkl"),
                state.params,
                state.batch_stats,
            )
            if visualize_artifacts and not is_set and last_eval_batch is not None:
                _dump_artifacts(
                    model, state, last_eval_batch, encode_fn, decode_fn, forward_fn,
                    data_type, resultname, name, epoch, output_root, rng,
                )
            if visualize_artifacts and is_set:
                _dump_set_samples(
                    model, state, test_ds, decode_fn, forward_fn,
                    resultname, name, epoch, output_root, rng,
                )

    writer.close()

    # ---- generation-only mode (epochs < 0, main.py:323-360):
    # dump SAMPLE_ITERATION x batch individual sample images + FID ----
    fid = -1
    if epochs < 0:
        gen_dir = os.path.join(result_dir, "generation")
        os.makedirs(gen_dir, exist_ok=True)
        sample_iteration = 50
        gen_all = []
        for i in range(sample_iteration):
            rng, gk = jax.random.split(rng)
            z = jax.random.normal(gk, (batch_size, model.latent_channel))
            imgs = np.clip(np.asarray(decode_fn(state, z)), 0, 1)
            gen_all.append(imgs)
            for j in range(batch_size):
                viz.save_image_grid(
                    imgs[j : j + 1],
                    os.path.join(gen_dir, f"{i * batch_size + j}.png"),
                    nrow=1,
                    normalize=True,
                )
        if data_type == "2d":
            fid = _compute_fid(test_ds, np.concatenate(gen_all))

    # ---- final metrics on one 50-sample batch (main.py:363-372) ----
    rng, fin_key = jax.random.split(rng)
    mb = min(50, len(test_ds))
    xb = jnp.asarray(test_ds.X[:mb])
    outs = forward_fn(state, xb, fin_key)
    recon, mu, log_var = outs[0], outs[1], outs[2]
    _, loss_rec, _, _ = model.loss(xb, *outs, wu_alpha=wu_alpha)
    pm = metrics_lib.measure_posterior_metrics(fin_key, mu, log_var, loss_rec)
    pm = {k: float(v) for k, v in pm.items()}

    duration = time.time() - t_start
    explog.log_evaluation_metrics(
        au=pm["au"], kl=pm["kl"], mi=pm["mi"], nll=pm["nll"],
        mean_var=pm["mean_var"],
        vloss=eval_means["loss"], vlrec=eval_means["recon"],
        vlreg=eval_means["reg"], vllr=eval_means["lr"],
    )
    explog.log_alpha_warmup_summary(wu_strat)
    explog.finalize_log()

    loggers.log_unified_dict(
        os.path.join(output_root, "log"),
        {
            "name": name,
            "dataset_name": dataset_name,
            "epoch": epochs,
            "fid": fid,
            "au": pm["au"],
            "kl": pm["kl"],
            "mi": pm["mi"],
            "nll": pm["nll"],
            "vloss": eval_means["loss"],
            "vlrec": eval_means["recon"],
            "vlreg": eval_means["reg"],
            "vllr": eval_means["lr"],
            "mean_var": pm["mean_var"],
        },
        logfilename=logfilename,
    )

    if async_ckpt is not None:
        # join all in-flight checkpoint writes before handing the
        # result dir to the caller. A failed WRITE must not discard the
        # fully-trained state the caller is owed — warn loudly instead
        try:
            async_ckpt.close()
        except Exception as e:
            print(
                f"[{name}] WARNING: async checkpoint write failed: {e!r} "
                "(training completed; the periodic snapshot is missing)",
                file=sys.stderr, flush=True,
            )

    summary = dict(
        name=name,
        duration_sec=duration,
        eval=eval_means,
        posterior_metrics=pm,
        result_dir=result_dir,
    )
    return state, summary


def _dump_artifacts(model, state, last_batch, encode_fn, decode_fn, forward_fn,
                    data_type, resultname, name, epoch, root, rng):
    """Last-epoch artifact dumps (main.py:110-170)."""
    x, y = last_batch
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    outs = forward_fn(state, x, k1)
    if data_type == "1d":
        viz.visualize_2c_points_on_image(x, y, resultname, name, epoch, "input", root)
        viz.visualize_2c_points_on_image(outs[1], y, resultname, name, epoch, "mu", root)
        z = outs[3][0] if outs[3].ndim == 3 else outs[3]
        viz.visualize_2c_points_on_image(z, y, resultname, name, epoch, "z", root)
        viz.visualize_2c_points_on_image(outs[0], y, resultname, name, epoch, "recon", root)
        zp = jax.random.normal(k2, (x.shape[0], model.latent_channel))
        sample = decode_fn(state, zp)
        viz.visualize_2c_points_on_image(sample, y, resultname, name, epoch, "sample", root)
    else:
        outdir = os.path.join(root, "results", resultname, name, "valontr")
        os.makedirs(outdir, exist_ok=True)
        outs_wos = forward_fn(state, x, k1, latent_rand_sampling=False)
        viz.save_image_grid(np.asarray(x)[:256], os.path.join(outdir, f"{epoch}_origin.png"))
        viz.save_image_grid(
            np.clip(np.asarray(outs[0])[:256], 0, 1), os.path.join(outdir, f"{epoch}_recon.png")
        )
        viz.save_image_grid(
            np.clip(np.asarray(outs_wos[0])[:256], 0, 1),
            os.path.join(outdir, f"{epoch}_recon_wos.png"),
        )
        zp = jax.random.normal(k2, (x.shape[0], model.latent_channel))
        sample = decode_fn(state, zp)
        viz.save_image_grid(
            np.clip(np.asarray(sample)[:256], 0, 1), os.path.join(outdir, f"{epoch}_sample.png")
        )

    # PCA / t-SNE (main.py:169-170)
    def enc(xx):
        return encode_fn(state, jnp.asarray(xx))

    try:
        viz.pca_visualization(enc, x, y, k3, epoch, name, resultname, root=root)
    except Exception as e:  # visualization must never kill a training run
        print(f"pca_visualization failed: {e}")


def _dump_set_samples(model, state, test_ds, decode_fn, forward_fn,
                      resultname, name, epoch, root, rng, n_samples=4):
    """Point-cloud recon/prior .ply dumps (main.py:52-89)."""
    outdir = os.path.join(root, "results", resultname, name, "point_clouds")
    os.makedirs(outdir, exist_ok=True)
    rng, k = jax.random.split(rng)
    for i in range(min(n_samples, len(test_ds))):
        x = jnp.asarray(test_ds.X[i : i + 1])
        outs = forward_fn(state, x, k, latent_rand_sampling=False)
        viz.save_point_cloud(
            np.asarray(outs[0][0]), os.path.join(outdir, f"{name}_epoch{epoch}_recon_{i:02d}")
        )
        viz.save_point_cloud(
            np.asarray(x[0]), os.path.join(outdir, f"{name}_epoch{epoch}_orig_{i:02d}")
        )
    for i in range(n_samples):
        z = jax.random.normal(jax.random.fold_in(k, i), (1, model.latent_channel))
        pts = decode_fn(state, z)
        viz.save_point_cloud(
            np.asarray(pts[0]), os.path.join(outdir, f"{name}_epoch{epoch}_prior_{i:02d}")
        )
