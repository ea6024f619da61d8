"""Multi-chip execution: device mesh + shard_map data parallelism.

The reference has no distributed layer at all (SURVEY.md §2.5); this is
the TPU-native greenfield design:

  * a 1-D (or 2-D data x model) `jax.sharding.Mesh` over ICI,
  * DP via `shard_map`: each device computes gradients on its batch
    shard; grads / metrics / BN batch statistics are `pmean`-reduced
    over the 'data' axis (gradient all-reduce rides ICI),
  * parameters and optimizer state are replicated,
  * the whole step is one jit-compiled program — XLA overlaps the
    reduction with backward compute where profitable.

Semantics note: loss terms that SUM over the batch in the reference
(the latent-recon term, model.py:603) are pmean-reduced like everything
else, i.e. DP-over-n of global batch B matches a single-device run of
batch B/n scaled — the standard DDP convention.
"""

from typing import Callable

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.train.state import TrainState
from vae_song_tpu.train.steps import make_grads_fn


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Multi-host (DCN) entry point — call BEFORE any other jax API.

    Thin guard over `jax.distributed.initialize`: on TPU pods the
    coordinator/process parameters are auto-detected from the cluster
    environment, so all-None arguments are the normal pod usage. After
    this, `jax.devices()` returns the GLOBAL device list, so `make_mesh`
    builds a global mesh; `shard_batch`/`replicate_state` assemble
    global arrays from process-local data (each process feeds its own
    shard of the global batch), and XLA routes cross-slice collectives
    over DCN. Per-process file outputs (loggers, checkpoints, artifact
    dumps) are the caller's responsibility to gate on
    `jax.process_index() == 0`; `train_and_test` does this for its own
    writers. Validated with a real 2-process jax.distributed CPU
    cluster — the replicate_state make_array_from_callback branch, the
    shard_batch make_array_from_process_local_data branch, and a full
    DP train step whose loss equals the single-process mesh's
    (tests/test_multihost.py); no TPU pod on this box, so DCN routing
    itself is untested.

    The reference has no multi-host story at all (SURVEY.md §2.5 — its
    sweep scripts run independent processes, which `parallel/sweep.py`
    covers). Returns (process_index, process_count).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on the
    data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    used = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(used, ("data", "model"))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params/opt_state replicated on the mesh.

    Multi-process: device_put cannot place host-local data onto a
    sharding that spans non-addressable devices; assemble the global
    replicated arrays from (identical, same-seed) local copies via
    make_array_from_callback instead."""
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(state, repl)
    import numpy as np

    def rep(leaf):
        a = np.asarray(leaf)
        return jax.make_array_from_callback(a.shape, repl, lambda idx: a[idx])

    return jax.tree.map(rep, state)


def shard_batch(x, mesh: Mesh):
    """Shard a batch along 'data'. Multi-process: `x` is this process's
    LOCAL portion of the global batch (global batch = local x process
    count), assembled with make_array_from_process_local_data."""
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    import numpy as np

    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def make_dp_train_step(model, tx, mesh: Mesh, L: int = 1) -> Callable:
    """Data-parallel train step over mesh axis 'data'.

    step(state, x_sharded, wu_alpha, rng) -> (state, metrics)
    `x` must be sharded along its batch axis ('data'); state replicated.
    """
    grads_fn = make_grads_fn(model, L)

    def per_device(state: TrainState, x, wu_alpha, rng):
        # decorrelate sampling across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        # gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, "data")
        # cross-replica BN: average the updated running stats
        new_bs = jax.lax.pmean(new_bs, "data")
        metrics = jax.lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s, "raw_kl": raw_kl},
            "data",
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_eval_step(model, mesh: Mesh) -> Callable:
    """Data-parallel eval step (running BN stats, loss pmean)."""

    def per_device(state: TrainState, x, wu_alpha, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            rngs={"sampling": rng},
        )
        total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
        return jax.lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}, "data"
        )

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
