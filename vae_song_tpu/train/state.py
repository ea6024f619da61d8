"""Train state: params + BN stats + optimizer state + step counter."""

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def global_pnorm(grads, p: float):
    """Global p-norm over every grad leaf (torch clip_grad_norm_'s
    norm: the p-norm of the vector of ALL grad elements; p=inf is the
    max absolute element)."""
    import jax.numpy as jnp

    leaves = [g.astype(jnp.float32) for g in jax.tree.leaves(grads)]
    if p == float("inf"):
        return jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in leaves]))
    acc = sum(jnp.sum(jnp.abs(g) ** p) for g in leaves)
    return acc ** (1.0 / p)


def clip_by_global_pnorm(max_norm: float, p: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics for p != 2 (reference
    utils.py:12-32 forwards the config's norm_type): scale every grad by
    min(1, max_norm / (global_pnorm + 1e-6))."""
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = global_pnorm(updates, p)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree.map(lambda g: g * scale.astype(g.dtype), updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float = 1e-2,
    total_steps: int | None = None,
    grad_clip: dict | None = None,
    clip_in_step: bool = False,
) -> optax.GradientTransformation:
    """Adam (torch defaults) + optional cosine annealing + grad clip.

    * main.py:200-203: Adam(lr=1e-2) + CosineAnnealingLR(T=epochs*steps)
    * lipschitz.py:25: Adam(lr) with no scheduler
    * clip applied to the combined grads before the update
      (main.py:285 -> utils.py:12-38)

    clip_in_step: the caller applies the clip itself inside its sharded
    train step (parallel/optree.make_shardmap_clip — PP/EP, where a
    chained clip would use per-device norms). The clip slot is filled
    with optax.identity() so the opt_state PYTREE STRUCTURE is identical
    to the chained-clip optimizer: checkpoints stay portable between
    single-device/DP runs and PP/EP runs of the same config.
    (Compat note: PP/EP + grad_clip checkpoints written BEFORE this
    placeholder existed lack the slot and no longer deserialize; no
    such checkpoints were shipped — resume them with the commit that
    wrote them if ever needed.)
    """
    if total_steps is not None:
        schedule = optax.cosine_decay_schedule(lr, total_steps)
    else:
        schedule = lr

    chain = []
    if grad_clip and grad_clip.get("enabled", False):
        clip_type = grad_clip.get("clip_type", "norm")
        if clip_type == "norm":
            max_norm = float(grad_clip.get("max_norm", 1.0))
            norm_type = float(grad_clip.get("norm_type", 2.0))
            if norm_type == 2.0:
                clip = optax.clip_by_global_norm(max_norm)
            else:
                # reference utils.py:12-32 forwards norm_type to
                # torch.nn.utils.clip_grad_norm_: global p-norm over all
                # grads, scale by max_norm/(norm + 1e-6) when norm
                # exceeds max_norm
                clip = clip_by_global_pnorm(max_norm, norm_type)
        elif clip_type == "value":
            clip = optax.clip(float(grad_clip.get("clip_value", 1.0)))
        else:
            # same loud behavior as parallel/optree.make_shardmap_clip —
            # a typo'd clip_type must not silently train unclipped
            raise ValueError(f"unknown clip_type {clip_type!r}")
        chain.append(optax.identity() if clip_in_step else clip)
    chain.append(optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)
