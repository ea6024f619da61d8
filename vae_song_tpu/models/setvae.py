"""SetVAE / SetLRVAE for 3-D point clouds (model.py:889-1114).

Permutation-invariant encoders (DeepSets MLP or transformer), fixed-N
set decoders (query-MLP or cross-attention transformer), Chamfer
reconstruction loss.

The transformer layers reproduce torch's nn.TransformerEncoderLayer /
nn.TransformerDecoderLayer defaults used by the reference
(model.py:950-992): post-LayerNorm residuals, ReLU feed-forward,
batch_first, dropout (0.0 in all shipped configs — we run dropout-free,
matching the configs).

Attention over the N=2048 point axis routes through
ops/attention.MultiHeadAttention: the dense whole-row Pallas kernel by
default on TPU (ops/denseattn.py), tiled flash via `use_flash` for
longer sequences, XLA einsum attention elsewhere.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vae_song_tpu.nn.blocks import Dense, BatchNorm
from vae_song_tpu.nn.moe import MoEFFN
from vae_song_tpu.ops import losses
from vae_song_tpu.ops.chamfer import best_chamfer
from vae_song_tpu.ops.attention import MultiHeadAttention


def _ffn_fused_on() -> bool:
    """Opt-in gate (VST_FUSED_FFN=1) for the fused Pallas FFN
    (ops/ffn.py): the two-Dense ReLU FFN + residual runs as one kernel
    per direction, keeping the [M, ff_dim] hidden activation in VMEM.

    Default OFF: measured STANDALONE on v5e at the set-model shapes
    (M=131072, d=256, f=512, bf16 fwd+bwd, scripts/ab_ffn.py, round 5)
    the fused kernel LOSES at every row block — 1.94 (BM=4096) / 1.96
    (2048) / 1.98 (1024) / 2.04 (512) / 2.14 (8192) vs 1.785 ms for the
    XLA two-matmul path, and 0.94 vs 0.64 ms forward-only. XLA is
    already at the overlapped HBM floor here (its fwd = matmul epilogue
    fusions + h1 round trip fully hidden behind the MXU), while the
    Pallas version pays VMEM round trips for the f32 [BM, f] dot
    intermediates that XLA's epilogue fusion avoids. Kept as a tested
    A/B arm (tests/test_ffn_kernel.py; in-step lever scripts/
    ab_ffn_step.py)."""
    import os

    return os.environ.get("VST_FUSED_FFN", "0").lower() in ("1", "true")


def _use_fused_ffn(x, ff_dim: int, dropout_rate: float, train: bool) -> bool:
    """Route this FFN through ops/ffn.fused_ffn? TPU backend, gate on,
    dropout-free trace, and kernel-eligible shapes."""
    if dropout_rate > 0.0 and train:
        # torch puts dropout on the hidden activation — that needs the
        # materialized [M, ff_dim] tensor, so those configs stay on XLA
        return False
    if jax.default_backend() != "tpu" or not _ffn_fused_on():
        return False
    from vae_song_tpu.ops.ffn import fused_ffn_ok

    m = 1
    for s in x.shape[:-1]:
        m *= s
    return fused_ffn_ok(m, x.shape[-1], ff_dim)


def _apply_fused_ffn(x, w1, b1, w2, b2, compute_dtype):
    from vae_song_tpu.ops.ffn import fused_ffn

    cd = compute_dtype or x.dtype
    return fused_ffn(
        x.astype(cd), w1.astype(cd), b1.astype(cd),
        w2.astype(cd), b2.astype(cd),
    )


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, ReLU FFN, dropout on
    attention weights/outputs and inside the FFN)."""

    d_model: int
    num_heads: int
    ff_dim: int
    dropout_rate: float = 0.0
    compute_dtype: object = None  # bf16 compute, f32 params/LayerNorm
    use_flash: bool = False
    seq_axis: str | None = None  # sequence-parallel self-attention
    seq_ring: bool = False  # SP attention via ring ppermute (ops/attention.py)
    moe_experts: int = 0  # >0: MoE FFN instead of the dense two-layer FFN
    moe_capacity_factor: float = 1.25
    ep_axis: str | None = None  # expert-parallel mesh axis (parallel/ep.py)
    moe_local_experts: int | None = None  # EP clone: sliced expert dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        attn = MultiHeadAttention(
            num_heads=self.num_heads, d_model=self.d_model,
            dropout_rate=self.dropout_rate, compute_dtype=self.compute_dtype,
            use_flash=self.use_flash, seq_axis=self.seq_axis,
            seq_ring=self.seq_ring,
        )(x, x, train)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=det)
        # LN dtype: under mixed precision the whole activation stream
        # stays bf16 (flax upcasts the mean/var computation to f32
        # internally) — measured 6.7 ms per full-batch f32 LayerNorm
        # fwd+bwd at the ShapeNet shapes, the single largest cost in the
        # round-2 step breakdown
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)(x + attn)
        if self.moe_experts > 0:
            ff = MoEFFN(
                d_model=self.d_model, ff_dim=self.ff_dim,
                n_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                compute_dtype=self.compute_dtype, ep_axis=self.ep_axis,
                local_experts=self.moe_local_experts,
            )(x)
            ff = nn.Dropout(self.dropout_rate)(ff, deterministic=det)
        elif _use_fused_ffn(x, self.ff_dim, self.dropout_rate, train):
            # fused Pallas FFN: residual + both matmuls + ReLU in one
            # kernel per direction (ops/ffn.py). Same param subtree as
            # the two Dense calls below (params_only registers it), so
            # checkpoints are interchangeable; dropout is identity on
            # these traces (gate requires det or rate == 0).
            w1, b1 = Dense(self.ff_dim, dtype=self.compute_dtype)(
                x, params_only=True)
            w2, b2 = Dense(self.d_model, dtype=self.compute_dtype)(
                jnp.zeros((1, self.ff_dim), x.dtype), params_only=True)
            y = _apply_fused_ffn(x, w1, b1, w2, b2, self.compute_dtype)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)(y)
        else:
            ff = Dense(self.ff_dim, dtype=self.compute_dtype)(x)
            ff = nn.Dropout(self.dropout_rate)(nn.relu(ff), deterministic=det)
            ff = Dense(self.d_model, dtype=self.compute_dtype)(ff)
            ff = nn.Dropout(self.dropout_rate)(ff, deterministic=det)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)(x + ff)


class TransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer: self-attn, cross-attn, FFN,
    with dropout at the torch positions. The cross-attention to a
    single latent memory token stays on XLA (length-1 kv).

    Exposed as two halves (self_attn_block / cross_ffn_block) so the
    set decoder can run its FIRST layer's self-attention once on the
    batch-constant query embeddings instead of B times.
    """

    d_model: int
    num_heads: int
    ff_dim: int
    dropout_rate: float = 0.0
    compute_dtype: object = None  # bf16 compute, f32 params/LayerNorm
    use_flash: bool = False
    seq_axis: str | None = None  # sequence-parallel SELF-attention only:
    seq_ring: bool = False
    # cross-attention's kv is the replicated length-1 memory token
    moe_experts: int = 0  # >0: MoE FFN instead of the dense two-layer FFN
    moe_capacity_factor: float = 1.25
    ep_axis: str | None = None
    moe_local_experts: int | None = None

    def setup(self):
        self.self_attn = MultiHeadAttention(
            num_heads=self.num_heads, d_model=self.d_model,
            dropout_rate=self.dropout_rate, compute_dtype=self.compute_dtype,
            use_flash=self.use_flash, seq_axis=self.seq_axis,
            seq_ring=self.seq_ring,
        )
        self.cross_attn = MultiHeadAttention(
            num_heads=self.num_heads, d_model=self.d_model,
            dropout_rate=self.dropout_rate, compute_dtype=self.compute_dtype,
            use_flash=self.use_flash,
        )
        # bf16 I/O under mixed precision; stats computed in f32 by flax
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)
        if self.moe_experts > 0:
            self.moe_ffn = MoEFFN(
                d_model=self.d_model, ff_dim=self.ff_dim,
                n_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                compute_dtype=self.compute_dtype, ep_axis=self.ep_axis,
                local_experts=self.moe_local_experts,
            )
        else:
            self.ff_up = Dense(self.ff_dim, dtype=self.compute_dtype)
            self.ff_down = Dense(self.d_model, dtype=self.compute_dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def self_attn_block(self, tgt, train: bool = False):
        det = not train
        sa = self.self_attn(tgt, tgt, train)
        sa = self.drop(sa, deterministic=det)
        return self.norm1(tgt + sa)

    def cross_ffn_block(self, tgt, memory, train: bool = False):
        det = not train
        ca = self.cross_attn(tgt, memory, train)
        ca = self.drop(ca, deterministic=det)
        tgt = self.norm2(tgt + ca)
        if self.moe_experts > 0:
            ff = self.moe_ffn(tgt)
        elif _use_fused_ffn(tgt, self.ff_dim, self.dropout_rate, train):
            # fused Pallas FFN (see TransformerEncoderLayer): identical
            # ff_up/ff_down param subtrees via params_only registration
            w1, b1 = self.ff_up(tgt, params_only=True)
            w2, b2 = self.ff_down(
                jnp.zeros((1, self.ff_dim), tgt.dtype), params_only=True)
            y = _apply_fused_ffn(tgt, w1, b1, w2, b2, self.compute_dtype)
            return self.norm3(y)
        else:
            ff = self.ff_up(tgt)
            ff = self.drop(nn.relu(ff), deterministic=det)
            ff = self.ff_down(ff)
        ff = self.drop(ff, deterministic=det)
        return self.norm3(tgt + ff)

    def __call__(self, tgt, memory, train: bool = False):
        return self.cross_ffn_block(self.self_attn_block(tgt, train), memory, train)


class SetEncoder(nn.Module):
    """DeepSets per-point MLP + pooling -> (mu, logvar) (model.py:915-947)."""

    hidden_dims: Tuple[int, ...] = (128, 256, 512)
    latent_dim: int = 128
    pool_type: str = "max"

    @nn.compact
    def __call__(self, points, train: bool = False):
        x = points  # [B, N, 3]
        for h in self.hidden_dims:
            x = Dense(h)(x)
            x = BatchNorm()(x, train)
            x = nn.relu(x)
        if self.pool_type == "mean":
            s = x.mean(axis=1)
        elif self.pool_type == "sum":
            s = x.sum(axis=1)
        else:
            s = x.max(axis=1)
        return Dense(self.latent_dim)(s), Dense(self.latent_dim)(s)


class SetEncoderAttn(nn.Module):
    """Transformer set encoder + max-pool (model.py:950-969)."""

    latent_dim: int = 128
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 2
    ff_dim: int = 512
    dropout_rate: float = 0.0
    compute_dtype: object = None
    use_flash: bool = False
    seq_axis: str | None = None
    seq_ring: bool = False
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    ep_axis: str | None = None
    moe_local_experts: int | None = None
    remat: bool = False  # jax.checkpoint each layer: recompute its
    # activations in the backward instead of stashing them (trades ~1/3
    # extra FLOPs for O(layers) less HBM — the TPU lever for scaling
    # B x N past what activation stashes allow)

    @nn.compact
    def __call__(self, points, train: bool = False):
        x = Dense(self.d_model)(points)
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.num_layers):
            # explicit name: keeps the param tree (and therefore init
            # RNG splits and checkpoints) identical whether or not the
            # layer is wrapped in nn.remat
            x = layer_cls(
                self.d_model, self.num_heads, self.ff_dim, self.dropout_rate,
                compute_dtype=self.compute_dtype, use_flash=self.use_flash,
                seq_axis=self.seq_axis, seq_ring=self.seq_ring,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis=self.ep_axis,
                moe_local_experts=self.moe_local_experts,
                name=f"TransformerEncoderLayer_{i}",
            )(x, train)
        s = x.max(axis=1)  # AdaptiveMaxPool1d(1) over points
        if self.seq_axis is not None:
            # points are sharded: the pool must span every shard. NOT
            # lax.pmax — it has no differentiation rule; all_gather the
            # tiny [B, d_model] pooled vectors (differentiable, its
            # transpose is psum_scatter) and max over the shard axis, so
            # encoder gradients flow back to the winning shard.
            s = jax.lax.all_gather(s, self.seq_axis).max(axis=0)
        return Dense(self.latent_dim)(s), Dense(self.latent_dim)(s)


class SetDecoder(nn.Module):
    """Learned per-point queries concat latent -> shared MLP
    (model.py:994-1025)."""

    latent_dim: int = 128
    num_points: int = 2048
    hidden_dims: Tuple[int, ...] = (512, 256, 128)
    point_dim: int = 3

    @nn.compact
    def __call__(self, z, train: bool = False):
        b = z.shape[0]
        queries = self.param(
            "point_queries",
            lambda k, s: jax.random.normal(k, s) * 0.02,
            (self.num_points, 64),
        )
        q = jnp.broadcast_to(queries[None], (b, self.num_points, 64))
        ze = jnp.broadcast_to(z[:, None, :], (b, self.num_points, z.shape[-1]))
        x = jnp.concatenate([ze, q], axis=-1)
        for h in self.hidden_dims:
            x = Dense(h)(x)
            x = BatchNorm()(x, train)
            x = nn.relu(x)
        return Dense(self.point_dim)(x)


class SetDecoderAttn(nn.Module):
    """Query embeddings cross-attending to a single latent memory token
    (model.py:972-992)."""

    latent_dim: int = 128
    num_points: int = 2048
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 2
    ff_dim: int = 512
    dropout_rate: float = 0.0
    compute_dtype: object = None
    use_flash: bool = False
    seq_axis: str | None = None
    seq_ring: bool = False
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    ep_axis: str | None = None
    moe_local_experts: int | None = None
    remat: bool = False  # see SetEncoderAttn.remat; forgoes the
    # batch-constant first-self-attention shortcut (its stash is the
    # memory being saved)

    @nn.compact
    def __call__(self, z, train: bool = False):
        b = z.shape[0]
        queries = self.param(
            "query_embed",
            lambda k, s: jax.random.normal(k, s) * 0.02,
            (self.num_points, self.d_model),
        )
        local_n = self.num_points
        if self.seq_axis is not None:
            # params are replicated under shard_map: each shard decodes
            # only its contiguous slice of the learned query embeddings
            n_shards = jax.lax.psum(1, self.seq_axis)
            local_n = self.num_points // n_shards
            shard = jax.lax.axis_index(self.seq_axis)
            queries = jax.lax.dynamic_slice_in_dim(
                queries, shard * local_n, local_n, axis=0
            )
        memory = Dense(self.d_model)(z)[:, None, :]  # [B, 1, d_model]
        layer_cls = TransformerDecoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerDecoderLayer, static_argnums=(3,))
        layers = [
            # explicit name: param tree identical with and without remat
            layer_cls(
                self.d_model, self.num_heads, self.ff_dim, self.dropout_rate,
                compute_dtype=self.compute_dtype, use_flash=self.use_flash,
                seq_axis=self.seq_axis, seq_ring=self.seq_ring,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis=self.ep_axis,
                moe_local_experts=self.moe_local_experts,
                name=f"TransformerDecoderLayer_{i}",
            )
            for i in range(self.num_layers)
        ]
        x = queries[None]  # [1, N, d_model] — batch-constant
        for i, layer in enumerate(layers):
            if i == 0 and self.dropout_rate == 0.0 and not self.remat:
                # the first self-attention sees only the (batch-constant)
                # query embeddings: compute it ONCE and broadcast, saving
                # a full B x N^2 attention (algebraically identical;
                # per-sample dropout masks would differ, hence the gate)
                x = layer.self_attn_block(x, train)
                x = jnp.broadcast_to(x, (b, local_n, self.d_model))
                x = layer.cross_ffn_block(x, memory, train)
            else:
                if x.shape[0] != b:
                    x = jnp.broadcast_to(x, (b, local_n, self.d_model))
                x = layer(x, memory, train)
        return Dense(3)(x)


class SetVAE(nn.Module):
    """Point-cloud VAE (model.py:1028-1084). Chamfer + beta*KL loss;
    trains with the composite gradient (aux terms are detached in the
    reference, model.py:1084)."""

    latent_channel: int = 128
    num_points: int = 2048
    encoder_hidden: Tuple[int, ...] = (128, 256, 512)
    decoder_hidden: Tuple[int, ...] = (512, 256, 128)
    beta: float = 1.0
    is_log_mse: bool = False  # unused for sets; API compat
    pool_type: str = "max"
    use_attention: bool = True
    d_model: int = 256
    num_heads: int = 4
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    ff_dim: int = 512
    attn_dropout: float = 0.0
    data_type: str = "set"
    grad_mode: str = "composite"
    # mixed_precision: bf16 compute in all transformer matmuls
    # (projections, FFN, attention); params, LayerNorm, softmax, latent
    # heads, and the Chamfer loss stay f32. The reference trains f32;
    # config key `mixed_precision: true` opts in.
    mixed_precision: bool = False
    # use_flash: Pallas flash attention with tuned block sizes (measured
    # faster than XLA attention at the shipped shapes once blocks are
    # tuned — ops/attention.py:_pick_block). NOTE: the Pallas call does
    # not auto-partition under GSPMD tensor parallelism; keep it False
    # when sharding heads over a 'model' mesh axis (parallel/tp.py).
    use_flash: bool = False
    # seq_axis: mesh axis name sharding the POINT axis (sequence
    # parallelism, parallel/sp.py). Set via model.clone(seq_axis=...) by
    # make_sp_train_step — the model then only works inside a shard_map
    # binding that axis. Scales clouds past one chip's HBM: attention
    # k/v all-gather over ICI, pooling pmax, per-shard query slices,
    # sharded Chamfer. Attention models only (DeepSets BN stats would
    # need cross-shard sync).
    seq_axis: str | None = None
    seq_ring: bool = False
    # moe_experts: >0 swaps every transformer FFN for a Switch-style
    # top-1 MoE (nn/moe.py). Single-device the experts evaluate locally;
    # under expert parallelism (parallel/ep.py:make_setvae_ep_train_step)
    # the model is cloned with ep_axis='expert' + moe_local_experts=1
    # and expert FFNs exchange tokens via all_to_all over ICI. The
    # reference has no MoE — this is the TPU scaling surface for the
    # set-transformer FFNs.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    ep_axis: str | None = None
    moe_local_experts: int | None = None
    # remat: jax.checkpoint every transformer layer — recompute
    # activations in the backward instead of stashing them. Identity on
    # the computed gradients (tests/test_models.py::test_setvae_remat);
    # opt-in via the `remat` model_params key for B x N scales whose
    # activation stash exceeds HBM. Attention models only.
    remat: bool = False

    def setup(self):
        cdt = jnp.bfloat16 if self.mixed_precision else None
        if self.seq_axis is not None and not self.use_attention:
            raise NotImplementedError(
                "sequence parallelism is implemented for the attention "
                "set models (use_attention=True); the DeepSets encoder's "
                "BatchNorm statistics are not synced across point shards"
            )
        if self.moe_experts > 0 and not self.use_attention:
            raise NotImplementedError(
                "moe_experts applies to the attention set models' "
                "transformer FFNs (use_attention=True)"
            )
        if self.use_attention:
            self.encoder = SetEncoderAttn(
                latent_dim=self.latent_channel,
                d_model=self.d_model,
                num_heads=self.num_heads,
                num_layers=self.num_encoder_layers,
                ff_dim=self.ff_dim,
                dropout_rate=self.attn_dropout,
                compute_dtype=cdt,
                use_flash=self.use_flash,
                seq_axis=self.seq_axis,
                seq_ring=self.seq_ring,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis=self.ep_axis,
                moe_local_experts=self.moe_local_experts,
                remat=self.remat,
            )
            self.decoder = SetDecoderAttn(
                latent_dim=self.latent_channel,
                num_points=self.num_points,
                d_model=self.d_model,
                num_heads=self.num_heads,
                num_layers=self.num_decoder_layers,
                ff_dim=self.ff_dim,
                dropout_rate=self.attn_dropout,
                compute_dtype=cdt,
                use_flash=self.use_flash,
                seq_axis=self.seq_axis,
                seq_ring=self.seq_ring,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis=self.ep_axis,
                moe_local_experts=self.moe_local_experts,
                remat=self.remat,
            )
        else:
            self.encoder = SetEncoder(
                hidden_dims=self.encoder_hidden,
                latent_dim=self.latent_channel,
                pool_type=self.pool_type,
            )
            self.decoder = SetDecoder(
                latent_dim=self.latent_channel,
                num_points=self.num_points,
                hidden_dims=self.decoder_hidden,
            )

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train)

    def __call__(self, x, L: int = 1, latent_rand_sampling: bool = True, train: bool = False):
        mu, log_var = self.encode(x, train)
        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        recon = self.decode(z, train)
        return recon, mu, log_var, z, None

    def _chamfer(self, recon, x):
        if self.seq_axis is not None:
            # per-shard query terms vs the all-gathered full clouds; the
            # SP train step's pmean-of-grads over seq_axis makes the
            # combined gradient exactly the full-cloud Chamfer gradient
            from vae_song_tpu.ops.chamfer import chamfer_sp

            return chamfer_sp(recon, x, self.seq_axis)
        return best_chamfer(recon, x)

    def loss(self, x, recon, mu, log_var, z_input=None, z_recon=None, wu_alpha: float = 0.0):
        loss_recon = self._chamfer(recon, x)
        loss_reg = losses.kl_divergence(mu, log_var)
        total = loss_recon + self.beta * loss_reg
        return total, loss_recon, loss_reg, jnp.zeros(())


class SetLRVAE(SetVAE):
    """SetVAE + latent reconstruction (model.py:1087-1114): decode from
    a detached z, re-encode, add alpha*warmup*MSE(z, z_hat). All loss
    terms are composed into one backward (reference detaches the aux
    terms, model.py:1114)."""

    alpha: float = 0.01

    def __call__(self, x, L: int = 1, latent_rand_sampling: bool = True, train: bool = False):
        mu, log_var = self.encode(x, train)
        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        recon = self.decode(jax.lax.stop_gradient(z), train)
        z_recon, _ = self.encode(recon, train)
        return recon, mu, log_var, z, z_recon

    def loss(self, x, recon, mu, log_var, z_input, z_recon, wu_alpha: float = 0.0):
        loss_recon = self._chamfer(recon, x)
        loss_reg = losses.kl_divergence(mu, log_var)
        loss_lr = losses.latent_recon_loss(z_input, z_recon)
        total = loss_recon + self.beta * loss_reg + self.alpha * wu_alpha * loss_lr
        return total, loss_recon, self.beta * loss_reg, self.alpha * wu_alpha * loss_lr
