"""FSDP / ZeRO-3-style parameter + optimizer sharding over 'data'.

Plain DP (parallel/mesh.py) replicates the params AND the Adam moments
on every device — at production scale the optimizer state alone is 2x
the params' bytes. FSDP shards every large parameter leaf (and, through
the shared optree walk, its Adam mu/nu) along one axis over the SAME
'data' axis the batch shards over. Expressed the TPU-native way: pure
NamedSharding annotations on the TrainState + jit in/out shardings —
XLA's SPMD partitioner inserts the per-layer all-gather on use in the
forward/backward and the reduce-scatter for the gradients (the ZeRO-3
communication pattern) by itself; the step math (train/steps.py:
make_grads_fn) is untouched, so every model family in the zoo trains
under FSDP, BatchNorm included (the batch-axis reductions partition to
EXACT global statistics, unlike shard_map DP's per-shard-then-pmean).

The reference has no distributed layer at all (SURVEY.md §2.5); this is
greenfield TPU design alongside DP/TP/SP/PP/EP.

Sharding rule: a leaf is sharded on its LARGEST axis divisible by the
shard count, and only when the leaf holds >= min_shard_elems elements
— slicing a [64]-bias across 8 devices saves 224 bytes per device and
costs an all-gather dispatch per use, so small leaves stay replicated.
"""

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.parallel import optree
from vae_song_tpu.train.state import TrainState

# 16k elements = 64 KiB f32: below this, the per-use all-gather dispatch
# outweighs the per-device memory saved
DEFAULT_MIN_SHARD_ELEMS = 2 ** 14


def make_fsdp_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_shards if n_shards is not None else len(devices)
    return Mesh(np.array(devices[:n]), ("data",))


def _leaf_spec(shape, n_shards: int, min_shard_elems: int):
    if int(np.prod(shape, dtype=np.int64)) < min_shard_elems:
        return P()
    divisible = [(d, i) for i, d in enumerate(shape) if d % n_shards == 0]
    if not divisible:
        return P()
    # largest axis first; ties broken toward the LAST axis (minor dims
    # are contiguous, so the all-gather reassembles contiguous lanes)
    d, i = max(divisible, key=lambda t: (t[0], t[1]))
    spec = [None] * len(shape)
    spec[i] = "data"
    return P(*spec)


def fsdp_param_specs(
    params, n_shards: int, min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS
) -> Any:
    """PartitionSpec tree: every large leaf sharded over 'data'."""
    return jax.tree.map(
        lambda p: _leaf_spec(p.shape, n_shards, min_shard_elems), params
    )


def state_shardings(
    state: TrainState,
    mesh: Mesh,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
):
    """NamedSharding tree for the full TrainState: params get the FSDP
    specs, the param-shaped optax subtrees (adam mu/nu) shard like the
    params (that's the ZeRO part), bookkeeping leaves and BN statistics
    replicate."""
    n_shards = mesh.shape["data"]
    param_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        fsdp_param_specs(state.params, n_shards, min_shard_elems),
    )
    repl = NamedSharding(mesh, P())
    opt_sh = optree.map_param_subtrees(
        state.opt_state,
        jax.tree.structure(state.params),
        lambda _subtree: param_sh,
        lambda _leaf: repl,
    )
    return TrainState(
        params=param_sh,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=opt_sh,
        step=repl,
    )


def _place(state: TrainState, shardings) -> TrainState:
    """device_put on one process; multi-process, host-local arrays
    cannot be placed onto shardings spanning non-addressable devices —
    assemble global arrays from the (identical, same-seed) local copies
    instead (same pattern as mesh.replicate_state)."""
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def put(leaf, sh):
        a = np.asarray(leaf)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    return jax.tree.map(put, state, shardings)


def shard_state(
    state: TrainState,
    mesh: Mesh,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
) -> TrainState:
    return _place(state, state_shardings(state, mesh, min_shard_elems))


def sharded_fraction(state: TrainState, mesh: Mesh,
                     min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS) -> float:
    """Fraction of param ELEMENTS that the rule actually shards — the
    per-device memory saving is ~ this fraction x (1 - 1/n) x 3 (params
    + mu + nu). Exposed so callers/tests can assert the rule bites."""
    specs = fsdp_param_specs(
        state.params, mesh.shape["data"], min_shard_elems
    )
    tot = shd = 0
    for p, s in zip(jax.tree.leaves(state.params), jax.tree.leaves(specs)):
        tot += p.size
        if any(ax is not None for ax in s):
            shd += p.size
    return shd / max(tot, 1)


def merge_tp_fsdp_specs(
    params,
    tp_specs,
    n_data: int,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
) -> Any:
    """Compose Megatron TP specs (parallel/tp.py) with FSDP: each leaf
    keeps its 'model'-axis sharding and additionally shards its largest
    REMAINING axis over 'data' when large enough — the classic 2-D
    weight layout (data x model) for scale-out training. Leaves the TP
    rule replicated and the FSDP rule skipped stay replicated."""

    def merge(p, tspec):
        axes = list(tspec) + [None] * (p.ndim - len(tspec))
        if int(np.prod(p.shape, dtype=np.int64)) < min_shard_elems:
            return P(*axes) if any(a is not None for a in axes) else P()
        free = [
            (d, i) for i, d in enumerate(p.shape)
            if axes[i] is None and d % n_data == 0
        ]
        if free:
            _, i = max(free, key=lambda t: (t[0], t[1]))
            axes[i] = "data"
        return P(*axes)

    return jax.tree.map(merge, params, tp_specs)


def tp_fsdp_state_shardings(
    state: TrainState,
    mesh: Mesh,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
):
    """NamedSharding tree for a ('data', 'model') mesh: attention heads
    / FFN columns on 'model' (parallel/tp.py structural rules) AND large
    leaves' free axes + adam moments on 'data' (ZeRO)."""
    from vae_song_tpu.parallel.tp import setvae_param_specs

    merged = merge_tp_fsdp_specs(
        state.params,
        setvae_param_specs(state.params),
        mesh.shape["data"],
        min_shard_elems,
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), merged)
    repl = NamedSharding(mesh, P())
    opt_sh = optree.map_param_subtrees(
        state.opt_state,
        jax.tree.structure(state.params),
        lambda _subtree: param_sh,
        lambda _leaf: repl,
    )
    return TrainState(
        params=param_sh,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=opt_sh,
        step=repl,
    )


def shard_state_tp_fsdp(
    state: TrainState,
    mesh: Mesh,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
) -> TrainState:
    return _place(state, tp_fsdp_state_shardings(state, mesh, min_shard_elems))


def make_tp_fsdp_train_step(
    model,
    tx,
    mesh: Mesh,
    example_state: TrainState,
    L: int = 1,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
):
    """jit train step on a ('data', 'model') mesh with 2-D-sharded
    weights: batch on 'data', attention/FFN on 'model', everything
    large also on 'data' with ZeRO'd adam moments."""
    from vae_song_tpu.parallel.tp import check_flash_partitionable

    check_flash_partitionable(model, mesh)
    return optree.jit_gspmd_train_step(
        model, tx,
        tp_fsdp_state_shardings(example_state, mesh, min_shard_elems),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
        L=L,
    )


def make_fsdp_train_step(
    model,
    tx,
    mesh: Mesh,
    example_state: TrainState,
    L: int = 1,
    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS,
):
    """jit train step: batch on 'data', large params + adam moments
    sharded on 'data'; XLA inserts all-gather / reduce-scatter. Same
    step math as train/steps.py:make_train_step — grad clip chained in
    tx computes the TRUE global norm (the grads are global arrays under
    GSPMD, not per-device slices)."""
    return optree.jit_gspmd_train_step(
        model, tx,
        state_shardings(example_state, mesh, min_shard_elems),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
        L=L,
    )
