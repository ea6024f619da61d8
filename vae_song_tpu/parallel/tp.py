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


_ATTN_ROLES = ("query", "key", "value")
_LAYER_TOKENS = ("TransformerEncoderLayer", "TransformerDecoderLayer")


def _dense_specs(path: tuple, kernel_shape, in_transformer_layer: bool):
    """Structural sharding rule for one Dense-like module (a dict that
    directly holds a 'kernel'). Primary classification is by attention
    role name and KERNEL SHAPE (up = out>in, down = in>out) so renamed
    submodules cannot silently flip an FFN projection's layout; for the
    shape-ambiguous square case (ff_dim == d_model) the module path
    breaks the tie ('up'/'Dense_0' wrapper vs 'down'/'Dense_1').
    Returns (kernel_spec, bias_spec)."""
    module_name = str(path[-1]) if path else ""
    if module_name in _ATTN_ROLES:
        if len(kernel_shape) == 3:  # DenseGeneral [d_model, heads, head_dim]
            return P(None, "model", None), P("model", None)
        return P(None, "model"), P("model")  # [d_model, d_model] cols = heads
    if module_name == "out":
        if len(kernel_shape) == 3:  # [heads, head_dim, d_model]
            return P("model", None, None), P()
        return P("model", None), P()  # rows = heads; bias [d_model] replicated
    if in_transformer_layer and len(kernel_shape) == 2:
        d_in, d_out = kernel_shape
        if d_out > d_in:  # FFN up [d_model, ff]: cols + bias sharded
            return P(None, "model"), P("model")
        if d_in > d_out:  # FFN down [ff, d_model]: rows sharded, bias replicated
            return P("model", None), P()
        # square kernel (ff_dim == d_model): shape can't distinguish up
        # from down — break the tie on the module/wrapper names. 'down'
        # is checked first because every inner flax Dense is auto-named
        # Dense_0, so the down path 'Dense_1/Dense_0' contains both
        # tokens (the same footgun the old string rules had).
        hint = "/".join(str(p).lower() for p in path[-2:])
        parent = str(path[-2]).lower() if len(path) >= 2 else ""
        if "down" in hint or parent.startswith("dense_1"):
            return P("model", None), P()
        if "up" in hint or parent.startswith("dense_0"):
            return P(None, "model"), P("model")
        # genuinely unidentifiable -> replicate (safe)
    return P(), P()


def _module_specs(tree, path=()):
    in_layer = any(tok in str(k) for k in path for tok in _LAYER_TOKENS)
    if hasattr(tree, "items") and "kernel" in tree and not hasattr(tree["kernel"], "items"):
        kspec, bspec = _dense_specs(path, tree["kernel"].shape, in_layer)
        out = {}
        for k, v in tree.items():
            out[k] = kspec if k == "kernel" else (bspec if k == "bias" else P())
        return type(tree)(out) if not isinstance(tree, dict) else out
    if hasattr(tree, "items"):
        out = {k: _module_specs(v, path + (k,)) for k, v in tree.items()}
        return type(tree)(out) if not isinstance(tree, dict) else out
    return P()


def check_tp_coverage(specs) -> None:
    """Invariant: every transformer layer must hold >=1 'model'-sharded
    param. A refactor that renames submodules out of the structural
    rules fails loudly here instead of silently training replicated."""
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    layers: dict = {}
    for path, spec in flat:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        idx = next(
            (i for i, n in enumerate(names) if any(t in n for t in _LAYER_TOKENS)),
            None,
        )
        if idx is not None:
            key = "/".join(names[: idx + 1])
            layers[key] = layers.get(key, False) or ("model" in str(spec))
    unsharded = sorted(k for k, ok in layers.items() if not ok)
    if unsharded:
        raise ValueError(
            "TP spec mapping produced zero 'model'-sharded params for "
            f"transformer layer(s) {unsharded}; the structural rules in "
            "parallel/tp.py no longer match this parameter tree"
        )


def setvae_param_specs(params, check: bool = True) -> Any:
    """PartitionSpec pytree for a SetVAE/SetLRVAE params tree."""
    specs = _module_specs(params)
    if check:
        check_tp_coverage(specs)
    return specs


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
        if isinstance(node, dict):  # multi_transform/inject_hyperparams
            return {k: walk(v) for k, v in node.items()}
        return jax.tree.map(lambda _: repl, node)

    return TrainState(
        params=param_sh,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=walk(state.opt_state),
        step=repl,
    )


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, state_shardings(state, mesh))


def check_flash_partitionable(model, mesh: Mesh) -> None:
    """Reject use_flash models whose attention would route to the tiled
    flash Pallas kernel on a model-sharded TPU mesh — an opaque custom
    call GSPMD cannot partition. Shared by every 'model'-axis step
    builder (make_tp_dp_train_step, fsdp.make_tp_fsdp_train_step)."""
    if (
        mesh.shape.get("model", 1) > 1
        and getattr(model, "use_flash", False)
        and jax.default_backend() == "tpu"
    ):
        # _dense_default_ok, not dense_ok: it also honors the
        # VST_DISABLE_DENSE_ATTN env opt-out — with that set, an
        # otherwise-eligible model would route to the tiled flash
        # kernel, which does NOT partition under GSPMD. Off-TPU the
        # kernels are bypassed entirely (XLA attention shards fine),
        # so only the TPU backend needs the gate.
        from vae_song_tpu.ops.attention import _dense_default_ok

        n = getattr(model, "num_points", 0)
        head_dim = model.d_model // model.num_heads
        if not _dense_default_ok(n, n, head_dim):
            # the tiled flash kernel is an opaque custom call that GSPMD
            # cannot partition; only the dense whole-row kernel carries
            # a custom_partitioning rule (ops/denseattn.py), and the
            # self-attention routes to it only for dense_ok shapes
            raise ValueError(
                "use_flash=True under tensor parallelism requires "
                "self-attention shapes eligible for the dense Pallas "
                f"kernel (got N={n}, head_dim={head_dim}); construct "
                "the model with use_flash=False for TP meshes (XLA "
                "attention shards transparently)."
            )


def make_tp_dp_train_step(model, tx, mesh: Mesh, example_state: TrainState,
                          L: int = 1):
    """jit train step with GSPMD: batch on 'data', attention/FFN params
    on 'model'; XLA inserts the gradient/activation collectives."""
    check_flash_partitionable(model, mesh)
    from vae_song_tpu.parallel import optree

    return optree.jit_gspmd_train_step(
        model, tx,
        state_shardings(example_state, mesh),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
        L=L,
    )
