"""Pipeline parallelism: GPipe-style microbatched execution of a deep
block stack over a 'stage' mesh axis.

The reference is single-device (SURVEY.md §2.5); this is the TPU-native
scaling primitive for models DEEPER than one chip — the flagship
pinwheel config is already a 12-block residual-MLP stack
(configs/config_pinwheel.yaml), which is the shape this op pipelines:

  * the LAYER axis of a stack of identical blocks is split into S
    contiguous stages, one per device on the 'stage' mesh axis
    (stacked parameters sharded P('stage') on their leading axis),
  * the batch is split into M microbatches; over M + S - 1 ticks each
    device applies its stage and hands the activation to its ICI
    neighbour with `lax.ppermute` (the classic GPipe schedule, bubble
    fraction (S-1)/(M+S-1)),
  * outputs leave the last stage via a masked psum (differentiable;
    its transpose broadcasts the cotangents back into the pipeline, so
    `jax.grad` through this function IS pipelined backprop — each
    device computes exactly its own stage's parameter gradients).

Everything is data-independent control flow (static tick count,
`jnp.where` masking) — one XLA program, no host round-trips.

tests/test_pp.py verifies forward and gradient equality against the
single-device stacked scan.
"""

import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.parallel import optree

STAGE_AXIS = "stage"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _replicate_from_psum(z, axis_name):
    """psum whose TRANSPOSE is identity, not psum.

    Forward: replicate the last stage's (masked) output buffer to every
    stage. Backward: the downstream loss is computed REDUNDANTLY on all
    S stages from this replicated value, so each stage already holds the
    full cotangent of the single logical loss; under check_vma=False the
    raw psum would transpose to another psum and sum the S identical
    cotangents — inflating every pipeline gradient by exactly S (caught
    by tests/test_pp.py::test_pp_grads_match_scan; Adam's scale
    invariance masked it, SGD/clipping would not)."""
    return lax.psum(z, axis_name)


def _rfp_fwd(z, axis_name):
    return lax.psum(z, axis_name), None


def _rfp_bwd(axis_name, _, ct):
    return (ct,)


_replicate_from_psum.defvjp(_rfp_fwd, _rfp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_cotangent(x, axis_name):
    """Identity whose TRANSPOSE is a psum: use on a replicated value
    that feeds the pipeline's stage-0 gate when its gradient must be
    seen by params living on EVERY stage.

    The GPipe feed gate (jnp.where(s == 0, ...) in _pipeline) delivers
    the pipeline-input cotangent only on stage 0; a replicated upstream
    computation (e.g. the set decoder producing the cloud that a second
    pipeline pass re-encodes) would then get a stage-0-only gradient
    contribution that a pmean over stages silently scales by 1/S. This
    op psums the gated cotangent so every stage sees the full value,
    restoring the redundantly-identical-grads convention. Apply it ONLY
    to the branch consumed by the pipeline — other consumers (e.g. the
    Chamfer term) already carry redundant cotangents that a psum would
    overcount S times."""
    return x


def _psc_fwd(x, axis_name):
    return x, None


def _psc_bwd(axis_name, _, ct):
    return (lax.psum(ct, axis_name),)


psum_cotangent.defvjp(_psc_fwd, _psc_bwd)


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[:n_stages]), (STAGE_AXIS,))


def _pipeline(block_fn, local_params, x_micro, axis_name, n_stages):
    """The GPipe schedule, run INSIDE a shard_map binding `axis_name`.

    block_fn(local_params, x_mb) -> y_mb — applies THIS stage's layers
      (local_params is the device-local slice of the stacked params;
      activations keep one shape across stages).
    x_micro: [M, mb, ...] microbatched input, replicated over stages
      (only stage 0 reads it). `n_stages` is the static mesh size.
    Returns [M, mb, ...] outputs, replicated over stages via masked psum.
    """
    s = lax.axis_index(axis_name)
    m = x_micro.shape[0]
    state = jnp.zeros_like(x_micro[0])
    outs = jnp.zeros((m,) + x_micro.shape[1:], x_micro.dtype)
    right = [(i, i + 1) for i in range(n_stages - 1)]

    for t in range(m + n_stages - 1):
        feed_idx = min(t, m - 1)
        inp = jnp.where(s == 0, x_micro[feed_idx], state)
        y = block_fn(local_params, inp)
        out_idx = t - (n_stages - 1)
        if out_idx >= 0:
            # only the LAST stage's y is microbatch out_idx's result
            write = jnp.where(s == n_stages - 1, y, outs[out_idx])
            outs = outs.at[out_idx].set(write)
        if right:
            state = lax.ppermute(y, axis_name, right)

    # replicate the last stage's buffer to every stage; the custom
    # transpose counts the redundantly-computed loss's cotangent ONCE
    # (see _replicate_from_psum)
    mask = (s == n_stages - 1).astype(outs.dtype)
    return _replicate_from_psum(outs * mask, axis_name)


def stack_block_params(init_fn, key, n_layers: int):
    """Stack per-layer param pytrees along a leading axis: the canonical
    layout for both lax.scan single-device application and P('stage')
    pipeline sharding."""
    keys = jax.random.split(key, n_layers)
    per_layer = [init_fn(k) for k in keys]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *per_layer)


def scan_blocks(block_apply: Callable, stacked_params, x):
    """Single-device reference: apply all stacked layers sequentially."""

    def body(carry, layer_params):
        return block_apply(layer_params, carry), None

    y, _ = lax.scan(body, x, stacked_params)
    return y


def make_pp_apply(block_apply: Callable, mesh: Mesh, n_layers: int,
                  n_micro: int):
    """Build a jitted pipelined forward over `mesh`'s 'stage' axis.

    block_apply(layer_params, x) -> y applies ONE layer; layers are
    grouped contiguously onto stages (n_layers % n_stages == 0).

    pp_fn(stacked_params, x) -> y
      stacked_params: leading axis n_layers (sharded onto stages)
      x: [B, ...] with B % n_micro == 0
    """
    n_stages = mesh.shape[STAGE_AXIS]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers do not divide over {n_stages} stages")

    def stage_fn(local_params, x):
        def body(carry, layer_params):
            return block_apply(layer_params, carry), None

        y, _ = lax.scan(body, x, local_params)
        return y

    def per_device(local_params, x):
        xm = x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])
        y = _pipeline(stage_fn, local_params, xm, STAGE_AXIS, n_stages)
        return y.reshape(x.shape[:1] + y.shape[2:])

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def _opt_specs(tx, example_params, n_layers: int):
    """PartitionSpec tree for an optax state over stacked layer params:
    any subtree shaped like the params (adam mu/nu) shards on the
    leading layer axis, everything else replicates. Shared structural
    walk: parallel/optree.py."""
    del n_layers
    pspecs = jax.tree.map(lambda _: P(STAGE_AXIS), example_params)
    return optree.opt_state_specs(tx, example_params, pspecs)


def shard_pp_state(params, opt_state, mesh: Mesh, tx, n_layers: int):
    """Place stacked params + optimizer state onto the 'stage' axis."""
    p_sh = jax.tree.map(
        lambda _: NamedSharding(mesh, P(STAGE_AXIS)), params
    )
    o_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        _opt_specs(tx, params, n_layers),
    )
    return jax.device_put(params, p_sh), jax.device_put(opt_state, o_sh)


def make_pp_train_step(block_apply: Callable, loss_fn: Callable, tx,
                       mesh: Mesh, n_layers: int, n_micro: int,
                       example_params):
    """Pipelined training: grad of loss_fn(y, target) through the GPipe
    schedule. Gradients for each stage's parameters are computed on that
    stage's device (pipelined backprop via the collectives' transposes)
    and stay sharded P('stage'), as does the optimizer state.

    step(stacked_params, opt_state, x, target) -> (params, opt_state, loss)
    """
    n_stages = mesh.shape[STAGE_AXIS]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers do not divide over {n_stages} stages")
    opt_specs = _opt_specs(tx, example_params, n_layers)

    def stage_fn(local_params, x):
        def body(carry, layer_params):
            return block_apply(layer_params, carry), None

        y, _ = lax.scan(body, x, local_params)
        return y

    def per_device(local_params, opt_state, x, target):
        xm = x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])

        def local_loss(p):
            y = _pipeline(stage_fn, p, xm, STAGE_AXIS, n_stages)
            return loss_fn(y.reshape(x.shape[:1] + y.shape[2:]), target)

        loss, grads = jax.value_and_grad(local_loss)(local_params)
        updates, new_opt = tx.update(grads, opt_state, local_params)
        new_params = jax.tree.map(lambda p, u: p + u, local_params, updates)
        return new_params, new_opt, loss

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), opt_specs, P(), P()),
        out_specs=(P(STAGE_AXIS), opt_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
