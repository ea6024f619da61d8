"""Tensor parallelism for the set-transformer models (pjit/GSPMD style).

Rather than hand-writing collectives, we annotate parameter shardings
over a ('data', 'model') mesh and let XLA's SPMD partitioner insert the
all-reduces (they ride ICI):

  * attention qkv projections  [d_model, heads, head_dim] -> heads on 'model'
  * attention out projection   [heads, head_dim, d_model] -> heads on 'model'
  * FFN up kernel [d_model, ff] -> ff on 'model' (+ its bias)
  * FFN down kernel [ff, d_model] -> ff on 'model'
  * everything else replicated; batch axis on 'data'

This is Megatron-style head/FFN parallelism expressed purely through
shardings — the model code is unchanged.
"""

from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.train.state import TrainState
from vae_song_tpu.train.steps import make_grads_fn


def _spec_for(path: tuple, leaf) -> P:
    """Sharding rule by parameter path/shape."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    shape = leaf.shape

    is_attention = any(
        tok in joined
        for tok in ("MultiHeadDotProductAttention", "MultiHeadAttention",
                    "self_attn", "cross_attn")
    )
    if is_attention:
        if any(k in joined for k in ("query", "key", "value")):
            if "kernel" in joined and len(shape) == 3:
                return P(None, "model", None)   # [d_model, heads, head_dim]
            if "kernel" in joined and len(shape) == 2:
                return P(None, "model")          # [d_model, d_model] cols = heads
            if "bias" in joined and len(shape) == 2:
                return P("model", None)          # [heads, head_dim]
            if "bias" in joined and len(shape) == 1:
                return P("model")
        if "out" in joined:
            if "kernel" in joined and len(shape) == 3:
                return P("model", None, None)    # [heads, head_dim, d_model]
            if "kernel" in joined and len(shape) == 2:
                return P("model", None)          # [d_model, d_model] rows = heads
            return P()                            # out bias [d_model] replicated
    # FFN inside transformer layers. The wrapper Dense modules are named
    # Dense_0 (up, d->ff) and Dense_1 (down, ff->d) at the LAYER level,
    # but each wraps an inner nn.Dense auto-named Dense_0 — so the down
    # path 'Dense_1/Dense_0/kernel' contains BOTH tokens. Check the
    # down-projection first.
    if "TransformerEncoderLayer" in joined or "TransformerDecoderLayer" in joined:
        if "Dense_1/" in joined:
            if "kernel" in joined:
                return P("model", None)   # [ff, d_model] rows sharded
            return P()                     # down bias [d_model] replicated
        if "Dense_0/" in joined:
            if "kernel" in joined:
                return P(None, "model")   # [d_model, ff] cols sharded
            return P("model")              # up bias [ff] sharded
    return P()


def setvae_param_specs(params) -> Any:
    """PartitionSpec pytree for a SetVAE/SetLRVAE params tree."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def state_shardings(state: TrainState, mesh: Mesh):
    """NamedSharding tree for the full TrainState: params get the TP
    specs; optax subtrees that are param-shaped (adam mu/nu) shard like
    params; everything else replicated."""
    param_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), setvae_param_specs(state.params)
    )
    repl = NamedSharding(mesh, P())
    param_structure = jax.tree.structure(state.params)

    def is_param_shaped(tree):
        try:
            return jax.tree.structure(tree) == param_structure
        except Exception:
            return False

    def walk(node):
        if is_param_shaped(node):
            return param_sh
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*[walk(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        return jax.tree.map(lambda _: repl, node)

    return TrainState(
        params=param_sh,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=walk(state.opt_state),
        step=repl,
    )


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, state_shardings(state, mesh))


def make_tp_dp_train_step(model, tx, mesh: Mesh, example_state: TrainState,
                          L: int = 1):
    """jit train step with GSPMD: batch on 'data', attention/FFN params
    on 'model'; XLA inserts the gradient/activation collectives."""
    grads_fn = make_grads_fn(model, L)
    sh = state_shardings(example_state, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def _step(state: TrainState, x, wu_alpha, rng):
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )
        return new_state, {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s, "raw_kl": raw_kl}

    metrics_sh = {"loss": repl, "recon": repl, "reg": repl, "lr": repl, "raw_kl": repl}
    return jax.jit(
        _step,
        in_shardings=(sh, data_sh, repl, repl),
        out_shardings=(sh, metrics_sh),
        donate_argnums=(0,),
    )
