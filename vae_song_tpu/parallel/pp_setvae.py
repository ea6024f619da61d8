"""Pipeline parallelism for a REAL zoo model: the SetVAE attention
encoder stack as GPipe stages.

Round 2's parallel/pp.py proved the schedule on a generic residual-MLP
toy; this module drives the framework's actual flagship set model
(models/setvae.py, reference model.py:950-969) through it:

  * the `num_encoder_layers` identical TransformerEncoderLayer param
    subtrees are STACKED on a leading layer axis and sharded P('stage')
    — each pipeline stage holds only its contiguous slice of encoder
    layers (the memory-scaling axis for deep encoders),
  * the rest of the model (input projection, pooled latent heads, the
    whole set decoder) is replicated and computed redundantly on every
    stage, the natural design for a bottlenecked VAE where the encoder
    stack carries the depth,
  * one jitted shard_map train step: pipelined encoder forward
    (parallel/pp.py's schedule, microbatched over the batch axis),
    pooling + reparameterization + decode + Chamfer/KL loss, pipelined
    backprop, Adam — gradient conventions below.

Gradient conventions (shard_map with check_vma=False):
  * stacked encoder-layer grads are computed on their own stage by the
    pipelined backprop (no collective needed),
  * the PRE-pipeline input projection's cotangent arrives only via
    stage 0's feed gate -> psum over stages recovers the full gradient
    (other stages contribute zeros),
  * POST-pipeline params (latent heads, decoder) are computed
    redundantly-identically on every stage from the replicated pipeline
    output -> pmean keeps the single-count gradient.
Both conventions are exact (no approximation): verified to 1e-5
against the single-device composite step in tests/test_pp_setvae.py.

Supports SetVAE (composite loss; the reference detaches SetVAE's aux
terms, model.py:1084) and SetLRVAE (model.py:1087-1114): the
latent-reconstruction re-encode runs the SAME pipeline a second time on
the decoded cloud — two GPipe passes per step, each microbatched, with
the stage-local/psum/pmean gradient conventions unchanged (the second
pass's cotangents ride the same collective transposes).

Composes with data parallelism: make_dp_pp_mesh builds a 2-D
('data', 'stage') mesh where each data row pipelines its own batch
shard down its stage column and gradients pmean across rows — the
same composition pattern as the DPxTP and DPxSP meshes.

Config keys `pipeline_parallel: S` (+ `data_parallel: true` for
DP x PP) in model_params route cli.main/train_and_test here
(train/loop.py).
"""

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vae_song_tpu.parallel import optree
from vae_song_tpu.parallel.pp import (
    STAGE_AXIS, _pipeline, make_pp_mesh, psum_cotangent,
)
from vae_song_tpu.nn.blocks import Dense
from vae_song_tpu.models.setvae import TransformerEncoderLayer
from vae_song_tpu.ops import losses

ENC_LAYER = "TransformerEncoderLayer_"
DATA_AXIS = "data"


def make_dp_pp_mesh(n_data: int, n_stages: int, devices=None) -> Mesh:
    """2-D ('data', 'stage') mesh for combined DP x PP: each data row
    runs its own pipeline down its stage column. 'stage' is the MINOR
    (fastest-varying) axis so each pipeline's ppermute hops ride
    adjacent-device ICI links while the less frequent gradient pmean
    crosses rows."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_stages
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {n_data}x{n_stages} "
                         f"data x stage mesh; have {len(devices)}")
    return Mesh(
        np.array(devices[:n]).reshape(n_data, n_stages),
        (DATA_AXIS, STAGE_AXIS),
    )


def split_params(params, n_layers: int):
    """Full SetVAE params -> {'enc_stack': stacked [L, ...] layer tree,
    'pre': input projection, 'post': heads + decoder}."""
    enc = dict(params["encoder"])
    layers = [enc.pop(f"{ENC_LAYER}{i}") for i in range(n_layers)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    pre = {"in_proj": enc.pop("Dense_0")}
    post = {"enc_rest": enc, "decoder": params["decoder"]}
    return {"enc_stack": stacked, "pre": pre, "post": post}


def merge_params(pp_params, n_layers: int):
    """Inverse of split_params — rebuild the flax tree (for eval /
    checkpointing with the standard single-device paths)."""
    stacked = pp_params["enc_stack"]
    enc = {"Dense_0": pp_params["pre"]["in_proj"]}
    for i in range(n_layers):
        enc[f"{ENC_LAYER}{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    enc.update(pp_params["post"]["enc_rest"])
    return {"encoder": enc, "decoder": pp_params["post"]["decoder"]}


def pp_param_specs(pp_params):
    return {
        "enc_stack": jax.tree.map(lambda _: P(STAGE_AXIS), pp_params["enc_stack"]),
        "pre": jax.tree.map(lambda _: P(), pp_params["pre"]),
        "post": jax.tree.map(lambda _: P(), pp_params["post"]),
    }


def _opt_specs(tx, pp_params):
    """Optimizer-state specs: param-shaped subtrees (adam mu/nu) get the
    param specs, everything else replicates. Shared structural walk:
    parallel/optree.py."""
    return optree.opt_state_specs(tx, pp_params, pp_param_specs(pp_params))


def split_opt_state(opt_state, full_params_example, n_layers: int):
    """Full-model optax state -> pipeline-split format: every subtree
    shaped like the flax params (adam mu/nu) goes through split_params,
    bookkeeping leaves (counts) pass through. Inverse of
    merge_opt_state; lets a resumed run restore Adam moments and the
    schedule position into the PP step instead of tx.init-ing fresh."""
    return optree.map_opt_params(
        opt_state, full_params_example, lambda sub: split_params(sub, n_layers)
    )


def merge_opt_state(opt_state, pp_params_example, n_layers: int):
    """Pipeline-split optax state -> full-model format (for
    checkpointing with the standard TrainState paths)."""
    return optree.map_opt_params(
        opt_state, pp_params_example, lambda sub: merge_params(sub, n_layers)
    )


def _is_stage_leaf(path) -> bool:
    """Grad leaves sharded P('stage'): the stacked encoder-layer
    subtree under the top-level 'enc_stack' key."""
    return bool(path) and getattr(path[0], "key", None) == "enc_stack"


def shard_pp_setvae_state(pp_params, opt_state, mesh: Mesh, tx):
    p_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pp_param_specs(pp_params)
    )
    o_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), _opt_specs(tx, pp_params)
    )
    return jax.device_put(pp_params, p_sh), jax.device_put(opt_state, o_sh)


def make_setvae_pp_train_step(model, tx, mesh: Mesh, n_micro: int,
                              latent_rand_sampling: bool = True,
                              grad_clip: dict | None = None) -> Callable:
    """Pipelined SetVAE train step over mesh axis 'stage'.

    step(pp_params, opt_state, x, wu_alpha, rng)
      -> (pp_params, opt_state, metrics)
    x: [B, N, 3]; B % n_micro == 0;
    model.num_encoder_layers % n_stages == 0.

    Combined DP x PP: pass a ('data', 'stage') mesh from
    make_dp_pp_mesh — x is sharded P('data') on the batch axis, each
    data row pipelines its own shard down its stage column, and the
    stage-reduced gradients are pmean'd over 'data' before the
    (replicated) optimizer update. Exact parity with the single-device
    composite step either way (tests/test_pp_setvae.py). With a pure
    ('stage',) mesh x is replicated and nothing crosses rows.

    RNG note: eps is drawn from the replicated `rng` directly (every
    stage draws the same noise; under DP x PP it is fold_in'd with the
    data row index so batch shards decorrelate, like the DP/EP steps) —
    an equally-valid random stream, but not bit-identical to the
    single-device path's flax make_rng derivation; the exact-parity
    test therefore compares with latent_rand_sampling=False (z = mu),
    which removes the only stream-dependent quantity.

    num_mc_samples note: the single eps draw here MATCHES the
    single-device set path — SetVAE.__call__ accepts L but draws one
    sample, mirroring the reference (model.py:1069-1078, which takes
    L=1 and never loops); L only multiplies samples for the Flexible
    families (model.py:418-447), which PP does not drive.
    """
    is_lr = type(model).__name__ == "SetLRVAE"
    if not (model.use_attention and
            type(model).__name__ in ("SetVAE", "SetLRVAE")):
        raise ValueError(
            "pipeline parallelism drives the attention SetVAE/SetLRVAE "
            f"encoder stack; got {type(model).__name__} use_attention="
            f"{model.use_attention}"
        )
    if getattr(model, "attn_dropout", 0.0):
        # dropout layers carry no params, so a silent 0.0 here would
        # train WITHOUT dropout and diverge from the single-device run
        # of the same config with no error — refuse loudly instead
        raise NotImplementedError(
            f"attn_dropout={model.attn_dropout} is not supported under "
            "pipeline parallelism (the PP step rebuilds the layers with "
            "dropout_rate=0.0); set attn_dropout: 0 or drop "
            "pipeline_parallel"
        )
    if getattr(model, "moe_experts", 0):
        # the PP step rebuilds the layers with DENSE FFNs; MoE params
        # (router/experts) would die at apply() with an opaque flax
        # missing-param error — refuse with the real reason instead
        raise NotImplementedError(
            f"moe_experts={model.moe_experts} is not supported under "
            "pipeline parallelism (MoE FFNs train under expert_parallel); "
            "set moe_experts: 0 or drop pipeline_parallel"
        )
    clip_fn = optree.make_shardmap_clip(grad_clip, _is_stage_leaf, STAGE_AXIS)
    has_dp = DATA_AXIS in mesh.axis_names
    n_stages = mesh.shape[STAGE_AXIS]
    n_layers = model.num_encoder_layers
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} encoder layers do not divide over {n_stages} stages"
        )
    cdt = jnp.bfloat16 if model.mixed_precision else None
    enc_layer_mod = TransformerEncoderLayer(
        model.d_model, model.num_heads, model.ff_dim, 0.0, compute_dtype=cdt,
        use_flash=model.use_flash,
    )
    in_proj = Dense(model.d_model)
    mu_head = Dense(model.latent_channel)
    lv_head = Dense(model.latent_channel)
    from vae_song_tpu.models.setvae import SetDecoderAttn

    decoder = SetDecoderAttn(
        latent_dim=model.latent_channel, num_points=model.num_points,
        d_model=model.d_model, num_heads=model.num_heads,
        num_layers=model.num_decoder_layers, ff_dim=model.ff_dim,
        dropout_rate=0.0, compute_dtype=cdt, use_flash=model.use_flash,
        remat=getattr(model, "remat", False),
    )

    def stage_fn(local_stack, h):
        def body(carry, layer_params):
            y = enc_layer_mod.apply({"params": layer_params}, carry, train=True)
            return y, None

        if getattr(model, "remat", False):
            # honor the model's configured memory behavior: recompute
            # each encoder layer's activations in the pipelined backward
            # instead of stashing them per scan step (models/setvae.py
            # SetEncoderAttn.remat does the same on the single-device path)
            body = jax.checkpoint(body)
        y, _ = lax.scan(body, h, local_stack)
        return y

    def per_device(pp_params, opt_state, x, wu_alpha, rng):
        if has_dp and latent_rand_sampling:
            # decorrelate the sampling eps across batch shards (the
            # same convention as the DP and EP steps)
            rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))

        def loss_fn(p):
            def pipelined_encode(pts):
                h = in_proj.apply({"params": p["pre"]["in_proj"]}, pts)
                hm = h.reshape(
                    (n_micro, h.shape[0] // n_micro) + h.shape[1:]
                )
                y = _pipeline(
                    stage_fn, p["enc_stack"], hm, STAGE_AXIS, n_stages
                )
                y = y.reshape(h.shape[:1] + y.shape[2:])
                s = y.max(axis=1)
                mu = mu_head.apply(
                    {"params": p["post"]["enc_rest"]["Dense_1"]}, s
                )
                log_var = lv_head.apply(
                    {"params": p["post"]["enc_rest"]["Dense_2"]}, s
                )
                return mu, log_var

            mu, log_var = pipelined_encode(x)
            if latent_rand_sampling:
                eps = jax.random.normal(rng, mu.shape, mu.dtype)
                z = mu + eps * jnp.exp(0.5 * log_var)
            else:
                z = mu
            if is_lr:
                # SetLRVAE: decode from the DETACHED z, re-encode the
                # cloud through a second pipeline pass (model.py:1094-1114)
                recon = decoder.apply(
                    {"params": p["post"]["decoder"]},
                    lax.stop_gradient(z), train=True,
                )
                # the pipeline's feed gate delivers recon's re-encode
                # cotangent only on stage 0, but the decoder params that
                # produced recon live (replicated) on every stage —
                # psum the gated cotangent so their pmean'd grads keep
                # the full latent-recon term (see pp.psum_cotangent)
                z_recon, _ = pipelined_encode(psum_cotangent(recon, STAGE_AXIS))
                total, rec, reg_s, lr_s = model.loss(
                    x, recon, mu, log_var, z, z_recon, wu_alpha=wu_alpha
                )
            else:
                recon = decoder.apply(
                    {"params": p["post"]["decoder"]}, z, train=True
                )
                total, rec, reg_s, lr_s = model.loss(
                    x, recon, mu, log_var, wu_alpha=wu_alpha
                )
            # unscaled KL for the kl_adaptive warmup channel (SetVAE's
            # reg term is already unscaled; SetLRVAE's is beta-scaled)
            raw_kl = losses.kl_divergence(mu, log_var)
            return total, (rec, reg_s, lr_s, raw_kl)

        (total, (rec, reg_s, lr_s, raw_kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(pp_params)
        grads = {
            "enc_stack": grads["enc_stack"],                       # stage-local
            "pre": lax.psum(grads["pre"], STAGE_AXIS),             # stage-0 gated
            "post": lax.pmean(grads["post"], STAGE_AXIS),          # redundant
        }
        metrics = {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s,
                   "raw_kl": raw_kl}
        if has_dp:
            # per-shard batch-mean grads/metrics -> global batch mean
            # (equal shard sizes); AFTER this, grads differ only across
            # stages, which is what the stage-axis clip assumes
            grads = lax.pmean(grads, DATA_AXIS)
            metrics = lax.pmean(metrics, DATA_AXIS)
        # grad clip (if configured) happens HERE with the true global
        # norm — tx must be clip-free, see make_shardmap_clip
        grads = clip_fn(grads)
        updates, new_opt = tx.update(grads, opt_state, pp_params)
        new_params = jax.tree.map(lambda a, u: a + u, pp_params, updates)
        return new_params, new_opt, metrics

    def build(pp_params_example):
        p_specs = pp_param_specs(pp_params_example)
        o_specs = _opt_specs(tx, pp_params_example)
        x_spec = P(DATA_AXIS) if has_dp else P()
        sharded = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(p_specs, o_specs, x_spec, P(), P()),
            out_specs=(p_specs, o_specs, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    # the step is built on first call (specs depend on the param tree)
    cache = {}

    def step(pp_params, opt_state, x, wu_alpha, rng):
        if "fn" not in cache:
            cache["fn"] = build(pp_params)
        return cache["fn"](pp_params, opt_state, x, wu_alpha, rng)

    return step
