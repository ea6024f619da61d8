"""Structural walks over optax optimizer-state trees + shard_map-safe
gradient clipping — shared by every parallel strategy.

An optax state (chain / adam / multi_transform / inject_hyperparams)
nests param-SHAPED subtrees (adam's mu/nu) among bookkeeping leaves
(counts, schedule steps). Each parallel strategy needs the same walk:
find the param-shaped subtrees by tree STRUCTURE (never by leaf shape,
so a stray [n]-shaped schedule leaf can't be misclassified) and apply
the params' sharding/merge/split rule to them, with a default for
everything else. One shared implementation so a new optax container
type is handled once (the round-2 dict gap had to be patched in three
copies; this module replaces four).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def map_param_subtrees(tree, param_structure, on_params, on_other_leaf):
    """Replace every subtree of `tree` whose jax tree structure equals
    `param_structure` with on_params(subtree); map remaining leaves with
    on_other_leaf. Recurses through namedtuples, tuples, lists, and
    dicts/Mappings (optax state containers)."""

    def walk(node):
        try:
            if jax.tree.structure(node) == param_structure:
                return on_params(node)
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[walk(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.tree.map(on_other_leaf, node)

    return walk(tree)


def opt_state_specs(tx, example_params, param_specs):
    """PartitionSpec tree for tx's state over example_params: subtrees
    shaped like the params (adam mu/nu) get `param_specs`, everything
    else replicates (P())."""
    shapes = jax.eval_shape(tx.init, example_params)
    return map_param_subtrees(
        shapes,
        jax.tree.structure(example_params),
        lambda _node: param_specs,
        lambda _leaf: P(),
    )


def map_opt_params(opt_state, example_params, fn):
    """Apply fn to every param-shaped subtree of an optax state, leaving
    bookkeeping leaves untouched (used to merge/split adam moments when
    converting between a model's flat and pipeline-split param formats)."""
    return map_param_subtrees(
        opt_state, jax.tree.structure(example_params), fn, lambda x: x
    )


def jit_gspmd_train_step(model, tx, state_shardings, x_sharding, repl,
                         L: int = 1):
    """The shared GSPMD-style train step: plain single-device step math
    (train/steps.py:make_grads_fn + tx.update) jitted with explicit
    in/out shardings — XLA's SPMD partitioner inserts every collective.
    Used by TP, FSDP, and TPxFSDP, which differ ONLY in the sharding
    trees they pass; the optimizer (incl. a chained global-norm clip)
    operates on global arrays, so its semantics are exactly the
    single-device ones."""
    from vae_song_tpu.train.steps import make_grads_fn

    grads_fn = make_grads_fn(model, L)

    def _step(state, x, wu_alpha, rng):
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )
        metrics = {
            "loss": total, "recon": rec, "reg": reg_s,
            "lr": lr_s, "raw_kl": raw_kl,
        }
        return new_state, metrics

    metrics_sh = {k: repl for k in ("loss", "recon", "reg", "lr", "raw_kl")}
    return jax.jit(
        _step,
        in_shardings=(state_shardings, x_sharding, repl, repl),
        out_shardings=(state_shardings, metrics_sh),
        donate_argnums=(0,),
    )


def make_shardmap_clip(grad_clip, is_sharded_leaf, axis):
    """Gradient clip usable INSIDE shard_map when some grad leaves are
    axis-sharded (each device holds a distinct slice) and the rest are
    replicated (identical on every device after their psum/pmean).

    optax.clip_by_global_norm inside shard_map is silently WRONG for
    such trees: every device computes a different norm from its own
    slice and scales the replicated leaves by a different factor,
    de-replicating them. Here the true global norm is
    sqrt(psum(local sqnorm of sharded leaves) + sqnorm of replicated
    leaves counted once), so the scale is identical on every device and
    matches the single-device optax semantics
    (g * max_norm / maximum(gnorm, max_norm)). Value clip is
    elementwise and safe per device.

    grad_clip: the config dict make_optimizer accepts
    (train/state.py:46-51; reference utils.py:12-38).
    is_sharded_leaf: (tree path) -> True for axis-sharded grad leaves.
    Returns grads -> grads (identity when clipping is disabled).
    """
    if not grad_clip or not grad_clip.get("enabled", False):
        return lambda grads: grads
    clip_type = grad_clip.get("clip_type", "norm")
    if clip_type == "value":
        v = float(grad_clip.get("clip_value", 1.0))
        return lambda grads: jax.tree.map(lambda g: jnp.clip(g, -v, v), grads)
    if clip_type != "norm":
        raise ValueError(f"unknown clip_type {clip_type!r}")
    max_norm = float(grad_clip.get("max_norm", 1.0))
    norm_type = float(grad_clip.get("norm_type", 2.0))

    def clip(grads):
        if norm_type == float("inf"):
            # inf-norm: pmax of sharded leaves' maxima + replicated max
            local_m = jnp.float32(0.0)
            repl_m = jnp.float32(0.0)
            for path, g in jax.tree_util.tree_leaves_with_path(grads):
                m = jnp.max(jnp.abs(g.astype(jnp.float32)))
                if is_sharded_leaf(path):
                    local_m = jnp.maximum(local_m, m)
                else:
                    repl_m = jnp.maximum(repl_m, m)
            gnorm = jnp.maximum(lax.pmax(local_m, axis), repl_m)
        else:
            local_s = jnp.float32(0.0)
            repl_s = jnp.float32(0.0)
            for path, g in jax.tree_util.tree_leaves_with_path(grads):
                gf = g.astype(jnp.float32)
                # keep the p=2 lowering EXACTLY as before (square+sqrt)
                # so existing parity/checkpoint tests stay bitwise
                s = (jnp.sum(jnp.square(gf)) if norm_type == 2.0
                     else jnp.sum(jnp.abs(gf) ** norm_type))
                if is_sharded_leaf(path):
                    local_s = local_s + s
                else:
                    repl_s = repl_s + s
            tot = lax.psum(local_s, axis) + repl_s
            gnorm = (jnp.sqrt(tot) if norm_type == 2.0
                     else tot ** (1.0 / norm_type))
        if norm_type == 2.0:
            # keep the exact optax.clip_by_global_norm scale rule the
            # single-device path uses (no eps) so checkpoint/parity
            # tests see bitwise-matching updates
            scale = max_norm / jnp.maximum(gnorm, max_norm)
        else:
            # torch clip_grad_norm_ rule, matching train/state.py's
            # clip_by_global_pnorm for p != 2
            scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        return jax.tree.map(lambda g: (g * scale.astype(g.dtype)), grads)

    return clip
