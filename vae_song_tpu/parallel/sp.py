"""Sequence parallelism: training the attention set models with the
POINT axis sharded over ICI.

The reference processes its N=2048 point clouds whole on one device
(SURVEY.md §5 long-context paragraph — `num_points` is a config
constant). This module is the TPU-native scaling path for clouds larger
than one chip's HBM: a ('data', 'seq') mesh where

  * the batch axis is data-parallel as in parallel/mesh.py,
  * the point/sequence axis of every activation is sharded over 'seq':
    self-attention all-gathers k/v over ICI and attends locally
    (ops/attention.py:sequence_sharded_attention), the encoder's
    max-pool finishes with a pmax, the decoder slices its learned query
    embeddings per shard, and the Chamfer loss evaluates each shard's
    query points against the all-gathered opposite cloud
    (ops/chamfer.py:chamfer_sp).

Gradient convention: every per-shard loss term is either an equal-size
shard mean (Chamfer) or computed redundantly-identically on all shards
(KL, latent-recon — their inputs are replicated after the pooling
pmax), so pmean of the per-shard gradients over BOTH mesh axes is
exactly the single-device gradient of the full-batch, full-cloud loss.
tests/test_sp_step.py verifies step-for-step equality against
train.steps.make_train_step on a pure-seq mesh.

Models: attention SetVAE / SetLRVAE (use_attention=True, dropout-free —
the shipped configs). The model is passed UNSHARDED; this module clones
it with seq_axis bound (the clone only changes how apply() traces, not
the parameter tree, so init/checkpoints are interchangeable).
"""

from typing import Callable

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.train.state import TrainState
from vae_song_tpu.train.steps import make_grads_fn

SEQ_AXIS = "seq"


def make_sp_mesh(n_data: int, n_seq: int, devices=None) -> Mesh:
    """('data', 'seq') mesh: batch sharded over 'data', the point axis
    over 'seq'. 'seq' is innermost so point-axis collectives ride
    nearest-neighbour ICI links."""
    devices = devices if devices is not None else jax.devices()
    used = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(used, ("data", SEQ_AXIS))


def shard_points(x, mesh: Mesh):
    """Shard a [B, N, 3] cloud batch: batch over 'data', points over 'seq'."""
    return jax.device_put(x, NamedSharding(mesh, P("data", SEQ_AXIS)))


def _validate(model, mesh: Mesh) -> None:
    n_seq = mesh.shape[SEQ_AXIS]
    if not getattr(model, "use_attention", True):
        raise NotImplementedError(
            "sequence parallelism supports the attention set models only"
        )
    if getattr(model, "use_flash", False):
        raise ValueError(
            "use_flash=True cannot be combined with sequence parallelism: "
            "the SP path is the all-gather XLA attention"
        )
    if model.num_points % n_seq != 0:
        raise ValueError(
            f"num_points={model.num_points} must divide evenly over the "
            f"'seq' axis ({n_seq} shards)"
        )


def make_sp_train_step(model, tx, mesh: Mesh, L: int = 1,
                       ring: bool = False) -> Callable:
    """DP x SP train step on a ('data', 'seq') mesh.

    step(state, x_sharded, wu_alpha, rng) -> (state, metrics)
    `x` sharded P('data', 'seq') via shard_points; state replicated.
    ring=True swaps the all-gather k/v attention for the ppermute ring
    with online softmax (ops/attention.py:ring_attention) — O(N/p)
    peak kv memory for clouds where one full copy won't fit.
    """
    _validate(model, mesh)
    sp_model = model.clone(seq_axis=SEQ_AXIS, seq_ring=ring)
    grads_fn = make_grads_fn(sp_model, L)

    def per_device(state: TrainState, x, wu_alpha, rng):
        # decorrelate sampling across BATCH shards only: seq shards must
        # draw the same eps so the replicated latent z stays consistent
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        axes = ("data", SEQ_AXIS)
        grads = jax.lax.pmean(grads, axes)
        new_bs = jax.lax.pmean(new_bs, axes)  # attention models carry none
        metrics = jax.lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s, "raw_kl": raw_kl},
            axes,
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
        in_specs=(P(), P("data", SEQ_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_sp_eval_step(model, mesh: Mesh, L: int = 1,
                      ring: bool = False) -> Callable:
    """DP x SP eval step (no param mutation)."""
    _validate(model, mesh)
    sp_model = model.clone(seq_axis=SEQ_AXIS, seq_ring=ring)

    def per_device(state: TrainState, x, wu_alpha, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        outs = sp_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            rngs={"sampling": rng},
        )
        total, rec, reg_s, lr_s = sp_model.loss(x, *outs, wu_alpha=wu_alpha)
        return jax.lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s},
            ("data", SEQ_AXIS),
        )

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data", SEQ_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
