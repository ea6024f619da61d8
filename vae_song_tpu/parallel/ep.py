"""Expert parallelism: a Switch-style top-1-routed mixture-of-experts
feed-forward, with experts sharded one-per-device over an 'expert' mesh
axis and token exchange via `lax.all_to_all` over ICI.

The reference has no mixture-of-experts (its `LinearModule_EP` is an
unrelated non-convex ICNN ablation twin, module.py:151-182); this is a
first-class TPU scaling op in the same spirit as the sequence-parallel
attention: provided, tested, and exercised by the multichip dryrun, for
scaling the set-transformer FFNs past one chip.

Routing math (Mesh-TensorFlow / Switch convention, static shapes
throughout so XLA can tile everything onto the MXU):

  * router logits [T, E] -> top-1 expert + softmax gate per token,
  * static per-expert capacity C = ceil(T/E * capacity_factor); tokens
    beyond capacity are dropped (their combine weight is zero),
  * dispatch/combine one-hot tensors [T, E, C]; dispatch is an einsum
    (a matmul, not a scatter — TPU-friendly),
  * `all_to_all` swaps the expert axis for the source-device axis, so
    each device FFNs ALL tokens routed to ITS expert, then the inverse
    all_to_all + combine einsum restores token order.

Everything is differentiable end-to-end (the gate multiplies the
output, giving the router its gradient — the argmax itself needs none),
and the all_to_all transposes route the backward pass's cotangents to
the right devices automatically.

Gradient convention (tests/test_ep.py checks exact parity with the
dense single-device evaluation): per-device loss contribution =
local-token loss sum / global token count, so

  * expert-weight gradients are complete WITHOUT any collective (every
    token of expert e is FFN'd on device e; cotangents from other
    devices' loss terms arrive through the all_to_all transpose),
  * replicated params (router) need a psum over the 'expert' axis.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.parallel import optree

EXPERT_AXIS = "expert"


def make_ep_mesh(n_experts: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[:n_experts]), (EXPERT_AXIS,))


class MoEParams(NamedTuple):
    """router: [D, E] replicated; experts stacked [E, ...] (sharded
    P('expert') under EP)."""

    router: jax.Array   # [D, E]
    w1: jax.Array       # [E, D, H]
    b1: jax.Array       # [E, H]
    w2: jax.Array       # [E, H, D]
    b2: jax.Array       # [E, D]


def init_moe(key, d_model: int, hidden: int, n_experts: int) -> MoEParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = 1.0 / np.sqrt(d_model)
    s2 = 1.0 / np.sqrt(hidden)
    return MoEParams(
        router=jax.random.uniform(k1, (d_model, n_experts), minval=-s1, maxval=s1),
        w1=jax.random.uniform(k2, (n_experts, d_model, hidden), minval=-s1, maxval=s1),
        b1=jnp.zeros((n_experts, hidden)),
        w2=jax.random.uniform(k3, (n_experts, hidden, d_model), minval=-s2, maxval=s2),
        b2=jnp.zeros((n_experts, d_model)),
    )


def _capacity(n_tokens: int, n_experts: int, capacity_factor: float) -> int:
    return int(np.ceil(n_tokens / n_experts * capacity_factor))


def _dispatch_combine(x, router, n_experts: int, capacity: int):
    """Top-1 routing tensors for tokens x [T, D].
    Returns (dispatch [T, E, C] 0/1, combine [T, E, C] gated)."""
    logits = x @ router                              # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)              # [T]
    gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]  # [T]

    onehot_e = jax.nn.one_hot(expert, n_experts, dtype=x.dtype)       # [T, E]
    # position of each token within its expert's queue (arrival order)
    pos = jnp.cumsum(onehot_e, axis=0) * onehot_e - onehot_e          # [T, E]
    pos_tok = pos.sum(axis=-1)                                        # [T]
    keep = (pos_tok < capacity).astype(x.dtype)
    onehot_c = jax.nn.one_hot(pos_tok.astype(jnp.int32), capacity, dtype=x.dtype)
    dispatch = onehot_e[:, :, None] * onehot_c[:, None, :] * keep[:, None, None]
    combine = dispatch * gate[:, None, None]
    return dispatch, combine


def _expert_ffn(w1, b1, w2, b2, h):
    return jax.nn.relu(h @ w1 + b1) @ w2 + b2


def moe_ffn_dense(params: MoEParams, x, capacity_factor: float = 1.25):
    """Single-device reference evaluation (all experts local).
    x: [T, D] -> [T, D].

    Capacity caveat: capacity derives from the token count PASSED IN
    (ceil(T/E * cf)), while the EP path applies it per source shard
    (ceil(T_local/E * cf)). Exact parity with moe_ffn_ep therefore
    holds when this reference is evaluated per token shard (as
    tests/test_ep.py does); evaluating it on the full unsharded batch
    diverges whenever capacity binds, because a global queue drops
    different tokens than per-shard queues."""
    t, d = x.shape
    e = params.router.shape[1]
    c = _capacity(t, e, capacity_factor)
    dispatch, combine = _dispatch_combine(x, params.router, e, c)
    expert_in = jnp.einsum("tec,td->ecd", dispatch, x)                # [E, C, D]
    hidden = jax.nn.relu(
        jnp.einsum("ecd,edh->ech", expert_in, params.w1) + params.b1[:, None, :]
    )
    expert_out = (
        jnp.einsum("ech,ehd->ecd", hidden, params.w2) + params.b2[:, None, :]
    )
    return jnp.einsum("tec,ecd->td", combine, expert_out)


def moe_ffn_ep(local_params: MoEParams, x_local, axis_name: str,
               n_experts: int, capacity_factor: float = 1.25):
    """Expert-parallel evaluation INSIDE a shard_map binding `axis_name`
    (one expert per device; expert arrays arrive with a leading local
    axis of 1). x_local: this device's token shard [T_local, D].

    Routing runs locally per token shard; all_to_all exchanges the
    expert axis for the source-device axis so each device FFNs the
    tokens bound for its expert, then the inverse all_to_all + combine
    restores token order. Output [T_local, D]."""
    t, d = x_local.shape
    c = _capacity(t, n_experts, capacity_factor)
    dispatch, combine = _dispatch_combine(x_local, local_params.router, n_experts, c)
    expert_in = jnp.einsum("tec,td->ecd", dispatch, x_local)          # [E, C, D]
    # -> [E(source device), C, D]: every row now belongs to MY expert
    recv = lax.all_to_all(expert_in, axis_name, split_axis=0, concat_axis=0,
                          tiled=True)
    w1 = local_params.w1[0]
    b1 = local_params.b1[0]
    w2 = local_params.w2[0]
    b2 = local_params.b2[0]
    out = _expert_ffn(w1, b1, w2, b2, recv.reshape(n_experts * c, d))
    out = out.reshape(n_experts, c, d)
    # send results back to the source devices, restoring the expert axis
    back = lax.all_to_all(out, axis_name, split_axis=0, concat_axis=0,
                          tiled=True)                                 # [E, C, D]
    return jnp.einsum("tec,ecd->td", combine, back)


def shard_moe(params: MoEParams, mesh: Mesh) -> MoEParams:
    """router replicated, stacked expert arrays on the 'expert' axis."""
    repl = NamedSharding(mesh, P())
    exp = NamedSharding(mesh, P(EXPERT_AXIS))
    return MoEParams(
        router=jax.device_put(params.router, repl),
        w1=jax.device_put(params.w1, exp),
        b1=jax.device_put(params.b1, exp),
        w2=jax.device_put(params.w2, exp),
        b2=jax.device_put(params.b2, exp),
    )


def make_ep_apply(mesh: Mesh, n_experts: int, capacity_factor: float = 1.25):
    """Jitted expert-parallel forward: fn(params, x) -> y.
    x: [T, D] with T % n_experts == 0, token-sharded over 'expert'."""

    def per_device(params, x):
        return moe_ffn_ep(params, x, EXPERT_AXIS, n_experts, capacity_factor)

    specs = MoEParams(router=P(), w1=P(EXPERT_AXIS), b1=P(EXPERT_AXIS),
                      w2=P(EXPERT_AXIS), b2=P(EXPERT_AXIS))
    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(specs, P(EXPERT_AXIS)),
        out_specs=P(EXPERT_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def _opt_specs(tx, example_params, n_experts: int):
    """PartitionSpec tree for the optax state: any subtree shaped like
    the params (adam mu/nu) gets the params' specs — router replicated,
    expert stacks on 'expert' — everything else replicates. Shared
    structural walk: parallel/optree.py."""
    del n_experts
    pspecs = MoEParams(router=P(), w1=P(EXPERT_AXIS), b1=P(EXPERT_AXIS),
                       w2=P(EXPERT_AXIS), b2=P(EXPERT_AXIS))
    return optree.opt_state_specs(tx, example_params, pspecs)


def shard_moe_opt(opt_state, tx, example_params: MoEParams, mesh: Mesh,
                  n_experts: int):
    return jax.device_put(
        opt_state,
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     _opt_specs(tx, example_params, n_experts)),
    )


def make_ep_train_step(tx, mesh: Mesh, n_experts: int, example_params: MoEParams,
                       capacity_factor: float = 1.25):
    """Jitted EP regression train step (MSE): the parity demonstration
    that expert gradients stay device-local while router gradients
    psum over the axis.

    step(params, opt_state, x, target) -> (params, opt_state, loss)
    """

    def per_device(params, opt_state, x, target):
        n_local = x.shape[0]

        def local_loss(p):
            y = moe_ffn_ep(p, x, EXPERT_AXIS, n_experts, capacity_factor)
            # local-sum / global-count: expert grads complete locally
            return ((y - target) ** 2).sum() / (n_local * n_experts * y.shape[-1])

        loss, grads = jax.value_and_grad(local_loss)(params)
        # replicated router: sum partial grads; sharded expert arrays:
        # already complete on their device (all_to_all transposes)
        grads = grads._replace(router=lax.psum(grads.router, EXPERT_AXIS))
        loss = lax.psum(loss, EXPERT_AXIS)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_opt, loss

    specs = MoEParams(router=P(), w1=P(EXPERT_AXIS), b1=P(EXPERT_AXIS),
                      w2=P(EXPERT_AXIS), b2=P(EXPERT_AXIS))
    o_specs = _opt_specs(tx, example_params, n_experts)
    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(specs, o_specs, P(EXPERT_AXIS), P(EXPERT_AXIS)),
        out_specs=(specs, o_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Model-zoo integration: expert-parallel SetVAE / SetLRVAE training.
#
# The attention set models accept `moe_experts=E` (models/setvae.py), which
# swaps every transformer FFN for nn/moe.py's MoEFFN. Single-device the
# experts evaluate via moe_ffn_dense; here the SAME parameter tree trains
# expert-parallel: batch sharded over the 'expert' axis (so the non-MoE
# parts run data-parallel), expert stacks sharded one-per-device, tokens
# exchanged through moe_ffn_ep's all_to_all.
#
# Gradient convention (same as make_ep_train_step above): device e's AD
# gradient for its expert slice already sums every device's per-shard-mean
# loss contribution (cotangents arrive through the all_to_all transpose),
# so expert grads need only the 1/E global-mean scaling and NO collective;
# everything else (attention, LN, router, latent heads) is replicated and
# takes a pmean.
# ---------------------------------------------------------------------------


def _leaf_name(path) -> str:
    for entry in reversed(path):
        n = getattr(entry, "key", None)
        if not isinstance(n, str):
            n = getattr(entry, "name", None)
        if isinstance(n, str):
            return n
    return ""


def _is_expert_leaf(path) -> bool:
    """MoEFFN expert-stack leaves. The names w1/b1/w2/b2 exist only inside
    MoEFFN modules (nn/moe.py) — flax Dense uses kernel/bias, LayerNorm
    scale/bias, and the MoE router is 'router' (replicated)."""
    return _leaf_name(path) in ("w1", "b1", "w2", "b2")


def setvae_ep_specs(tree):
    """PartitionSpec tree for a params / TrainState / grads tree: MoEFFN
    expert stacks on 'expert' (leading [E, ...] dim), all else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: P(EXPERT_AXIS) if _is_expert_leaf(path) else P(), tree
    )


def shard_setvae_ep_state(state, mesh: Mesh):
    """Place a TrainState on the EP mesh per setvae_ep_specs (adam mu/nu
    inherit the params' expert shardings through their leaf names)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x,
            NamedSharding(mesh, P(EXPERT_AXIS) if _is_expert_leaf(path) else P()),
        ),
        state,
    )


def make_setvae_ep_train_step(model, tx, mesh: Mesh, example_state, L: int = 1,
                              grad_clip: dict | None = None):
    """Expert-parallel train step for an attention SetVAE/SetLRVAE with
    moe_experts == mesh.shape['expert'] (one expert per device).

    step(state, x_sharded, wu_alpha, rng) -> (state, metrics)
    `x` sharded P('expert') along the batch axis; state per
    shard_setvae_ep_state. Step-for-step parity with the single-device
    dense step whenever expert capacity does not bind
    (tests/test_moe_setvae.py).

    grad_clip: pass the config dict HERE with a clip-free `tx` — a
    clip chained into tx would compute a different global norm on every
    device (expert grads differ per device) and silently de-replicate
    the replicated params. optree.make_shardmap_clip psums the expert
    leaves' sqnorms so the scale is the true global norm, identical
    everywhere and equal to the dense single-device clip."""
    from vae_song_tpu.train.steps import make_grads_fn

    clip_fn = optree.make_shardmap_clip(grad_clip, _is_expert_leaf, EXPERT_AXIS)
    n_exp = mesh.shape[EXPERT_AXIS]
    if getattr(model, "moe_experts", 0) != n_exp:
        raise ValueError(
            f"model.moe_experts={getattr(model, 'moe_experts', 0)} must equal "
            f"the 'expert' mesh axis size ({n_exp}): one expert per device"
        )
    if not getattr(model, "use_attention", True):
        raise NotImplementedError("expert parallelism needs the attention set models")
    ep_model = model.clone(ep_axis=EXPERT_AXIS, moe_local_experts=1)
    grads_fn = make_grads_fn(ep_model, L)

    def per_device(state, x, wu_alpha, rng):
        # decorrelate the sampling eps across batch shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(EXPERT_AXIS))
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        grads = jax.tree_util.tree_map_with_path(
            lambda path, g: g / n_exp if _is_expert_leaf(path)
            else lax.pmean(g, EXPERT_AXIS),
            grads,
        )
        new_bs = lax.pmean(new_bs, EXPERT_AXIS)
        metrics = lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s,
             "raw_kl": raw_kl},
            EXPERT_AXIS,
        )
        grads = clip_fn(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    state_specs = setvae_ep_specs(example_state)
    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(state_specs, P(EXPERT_AXIS), P(), P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_setvae_ep_eval_step(model, mesh: Mesh, example_state, L: int = 1):
    """Expert-parallel eval step: batch sharded over 'expert', metrics
    pmean'd to the global batch mean."""
    n_exp = mesh.shape[EXPERT_AXIS]
    if getattr(model, "moe_experts", 0) != n_exp:
        raise ValueError("model.moe_experts must equal the 'expert' axis size")
    ep_model = model.clone(ep_axis=EXPERT_AXIS, moe_local_experts=1)

    def per_device(state, x, wu_alpha, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(EXPERT_AXIS))
        outs = ep_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            rngs={"sampling": rng},
        )
        total, rec, reg_s, lr_s = ep_model.loss(x, *outs, wu_alpha=wu_alpha)
        return lax.pmean(
            {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}, EXPERT_AXIS
        )

    state_specs = setvae_ep_specs(example_state)
    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(state_specs, P(EXPERT_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
