"""Mixture-of-experts feed-forward as a flax module — the model-side
integration of parallel/ep.py's Switch-style top-1 MoE.

The reference has no mixture-of-experts (its `LinearModule_EP`,
module.py:151-182, is an unrelated non-convex ICNN ablation twin); this
is the TPU scaling surface for the set-transformer FFNs: SetVAE /
SetLRVAE accept `moe_experts=E` and their transformer layers swap the
dense two-layer FFN for `MoEFFN`. Single-device the experts evaluate
locally (moe_ffn_dense); under expert parallelism the model is cloned
with `ep_axis` bound (parallel/ep.py:make_setvae_ep_train_step, same
clone pattern as sequence parallelism's seq_axis) and the SAME params
run the all_to_all exchange path (moe_ffn_ep) inside shard_map.

Param tree (matches ep.py's MoEParams layout, stacked [E, ...] so the
'expert' mesh axis shards dim 0):

    router [D, E] (replicated under EP)
    w1 [E, D, H]  b1 [E, H]  w2 [E, H, D]  b2 [E, D]
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vae_song_tpu.parallel.ep import MoEParams, moe_ffn_dense, moe_ffn_ep

EXPERT_PARAM_NAMES = ("w1", "b1", "w2", "b2")  # sharded P('expert', ...)


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


class MoEFFN(nn.Module):
    """Top-1-routed MoE FFN over the token axis.

    x: [B, N, D] -> [B, N, D]. Tokens are flattened to [B*N, D] for
    routing/capacity (C = ceil(B*N/E * capacity_factor) per device —
    under EP each device routes its LOCAL token shard, matching
    moe_ffn_ep's per-shard capacity semantics)."""

    d_model: int
    ff_dim: int
    n_experts: int
    capacity_factor: float = 1.25
    compute_dtype: object = None
    ep_axis: str | None = None  # mesh axis named 'expert' under EP
    local_experts: int | None = None  # EP clone: declared leading dim of
    # the expert stacks (1 per device inside shard_map — flax validates
    # param shapes at apply, so the clone must declare the SLICED shape;
    # routing still uses the global n_experts)

    @nn.compact
    def __call__(self, x):
        d, h, e = self.d_model, self.ff_dim, self.n_experts
        el = self.local_experts if self.local_experts is not None else e
        s1, s2 = 1.0 / np.sqrt(d), 1.0 / np.sqrt(h)
        params = MoEParams(
            router=self.param("router", _uniform_init(s1), (d, e)),
            w1=self.param("w1", _uniform_init(s1), (el, d, h)),
            b1=self.param("b1", nn.initializers.zeros, (el, h)),
            w2=self.param("w2", _uniform_init(s2), (el, h, d)),
            b2=self.param("b2", nn.initializers.zeros, (el, d)),
        )
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            params = MoEParams(*(p.astype(self.compute_dtype) for p in params))
        b, n, _ = x.shape
        tokens = x.reshape(b * n, d)
        if self.ep_axis is not None:
            out = moe_ffn_ep(params, tokens, self.ep_axis, e,
                             self.capacity_factor)
        else:
            out = moe_ffn_dense(params, tokens, self.capacity_factor)
        return out.reshape(b, n, d)
