"""Multi-head attention with a Pallas flash-attention fast path.

The set models attend over N=2048 points (model.py:950-992). Plain XLA
attention materializes the [B, H, N, N] score tensor in HBM
(64 x 4 x 2048^2 fp32 = 4.3 GB per direction) — the training step is
HBM-bandwidth-bound. The Pallas flash kernel (tiled online-softmax,
jax.experimental.pallas.ops.tpu.flash_attention, with its custom VJP)
keeps the scores in VMEM tiles.

`MultiHeadAttention` here mirrors torch nn.MultiheadAttention semantics
(separate q/k/v/out projections, scale 1/sqrt(head_dim)) and picks the
flash path when the backend is TPU and shapes satisfy the kernel's
tiling constraints; otherwise falls back to XLA einsum attention.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import random as jrandom

from vae_song_tpu.nn.initializers import torch_linear_kernel_init


def _mha_in_proj_init(key, shape, dtype=jnp.float32):
    """torch nn.MultiheadAttention in-proj init: xavier_uniform_ on the
    stacked (3E, E) weight -> bound sqrt(6/(E + 3E)) = sqrt(1.5/fan_in)."""
    fan_in = shape[0]
    bound = float(np.sqrt(1.5 / fan_in))
    return jrandom.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _fused_qkv_on() -> bool:
    """Opt-in (VST_FUSED_QKV=1) fused self-attention in-projection: one
    [d, 3d] matmul instead of three [d, d] Dense calls (torch's own
    nn.MultiheadAttention fuses the same way via in_proj_weight). The
    param tree stays three separate query/key/value leaves (checkpoint
    + log.txt param-count parity); kernels concatenate at apply time.

    Default OFF: measured IN-STEP on v5e at the SetVAE shapes
    (B=64, N=2048, d=256, bf16 scanned multistep,
    scripts/ab_step_split_r5.py, round 5) the fusion LOSES ~1.1 ms —
    52.33 -> 53.41 ms/step at K=32 and 52.20 -> 53.29 at the
    trainer-selected K=117. The three separate 256-wide matmuls are
    already MXU-efficient (M=131k rows; N=256 = 2 lane tiles) and XLA
    has no per-kernel launch cost to amortize, so the fused variant
    only ADDS HBM traffic: lane-slicing the [B, N, 3d] output back
    into the packed attention kernel's three operands, and the pad+add
    transpose of those slices in the backward. Kept as a tested A/B
    arm (tests/test_fused_qkv.py)."""
    import os

    return os.environ.get("VST_FUSED_QKV", "0").lower() in ("1", "true")


class _InProj(nn.Module):
    """Parameter holder for one in-projection leaf of the fused QKV
    path: registers the same {kernel, bias} subtree (names, shapes,
    init, RNG path) as the nn.Dense used on the unfused path, without
    issuing its own matmul."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", _mha_in_proj_init, (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _dense_default_ok(n_q: int, n_kv: int, head_dim: int) -> bool:
    """Default-on gate for the dense whole-row Pallas kernel
    (ops/denseattn.py): TPU backend, dense-eligible shapes, and no
    explicit opt-out via VST_DISABLE_DENSE_ATTN=1."""
    import os

    if jax.default_backend() != "tpu":
        return False
    if os.environ.get("VST_DISABLE_DENSE_ATTN", "").lower() not in ("", "0", "false"):
        return False
    from vae_song_tpu.ops.denseattn import dense_ok

    return dense_ok(n_q, n_kv, head_dim)


def _packed_attn_ok(n_q: int, n_kv: int, num_heads: int,
                    head_dim: int) -> bool:
    """Default-on gate for the lane-packed dense kernel: consumes q/k/v
    in the model's [B, N, H*D] layout, skipping the BNHD <-> BHND HBM
    transposes around the base kernel. Measured on v5e at the SetVAE
    shapes (B=64, N=2048, H=4, D=64): full f32 train step 109.7 ->
    93.6 ms vs the base dense kernel (scripts/ab_packed_attn.py).
    Partitions under GSPMD (batch + whole-head-pair feature sharding,
    ops/denseattn.py:_packed_specs). VST_DENSE_ATTN_PACKED=0 falls back
    to the base BHND kernel for A/B; VST_DISABLE_DENSE_ATTN=1 disables
    both dense kernels."""
    import os

    if os.environ.get("VST_DENSE_ATTN_PACKED", "1").lower() in ("0", "false"):
        return False
    if not _dense_default_ok(n_q, n_kv, head_dim):
        return False
    from vae_song_tpu.ops.denseattn import packed_ok

    return packed_ok(n_q, n_kv, num_heads, head_dim)


def _flash_ok(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # kernel tiling wants seq lengths in multiples of the block size and
    # a lane-aligned head dim; use it only where it's actually profitable
    n_q, n_kv = q.shape[1], k.shape[1]
    head_dim = q.shape[-1]
    return (
        n_q >= 256 and n_kv >= 256
        and n_q % 128 == 0 and n_kv % 128 == 0
        and head_dim % 64 == 0
    )


def _xla_attention(q, k, v, scale, compute_dtype=jnp.bfloat16):
    """q, k, v: [B, N, H, D]. Matmuls run in `compute_dtype` (bf16 feeds
    the MXU at full rate); logits/softmax accumulate in f32."""
    out_dtype = q.dtype
    qc, kc, vc = (a.astype(compute_dtype) for a in (q, k, v))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qc, kc, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(compute_dtype),
        vc,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _pick_block(n: int) -> int:
    """Largest power-of-two block <= 1024 dividing the sequence length.
    Measured on v5e at B=64/H=4/N=2048/D=64: q=kv=1024 gives 10.8 ms
    fwd vs 40.0 ms with the kernel's default blocks and 19.2 ms for XLA
    attention — block tuning is what makes flash win here."""
    for b in (1024, 512, 256, 128):
        if n % b == 0:
            return b
    return n


def _flash_attention(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    n_q, n_kv = q.shape[1], k.shape[1]
    bq, bkv = _pick_block(n_q), _pick_block(n_kv)
    bs = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv,
        block_k_dkv=bkv, block_q_dkv=bq,
        block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )
    # kernel layout is [B, H, N, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)


def sequence_sharded_attention(q, k, v, scale, axis_name: str,
                               compute_dtype=jnp.bfloat16):
    """Sequence-parallel self-attention (Ulysses-style all-gather variant).

    Inside a shard_map whose mesh axis `axis_name` shards the POINT axis:
    each device holds its query chunk [B, N/p, H, D] plus the matching
    k/v chunk; k and v are all-gathered over ICI (cheap: the set models'
    kv is ~2 MB) and attention runs locally against the full keys. This
    is the scaling path for clouds larger than one chip's HBM — not
    required for reference parity (SURVEY.md §2.5), provided as a
    first-class op.
    """
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    return _xla_attention(q, k_full, v_full, scale, compute_dtype)


def ring_attention(q, k, v, scale, axis_name: str,
                   compute_dtype=jnp.bfloat16):
    """Sequence-parallel self-attention, RING variant.

    Instead of all-gathering the full k/v onto every device
    (sequence_sharded_attention — O(N) k/v bytes and [N/p, N] scores
    per device), the k/v CHUNKS rotate around the ICI ring via
    `ppermute` while each device folds them into an online-softmax
    accumulator (the flash recurrence). The scan body is remat'd
    (`jax.checkpoint`), so the backward recomputes each hop's
    [N/p, N/p] score/prob block instead of stashing all p of them —
    the O(N/p x N) score residual that dominates the all-gather
    variant's training memory never materializes. What reverse-mode
    scan does store is the per-hop k/v carries (in aggregate ≈ 2 full
    k/v copies — tiny next to scores: k/v is N·H·D vs N²·H for the
    score stack). Each hop is nearest-neighbour ICI traffic that
    overlaps with the chunk's matmuls. Exact up to fp summation order
    — the recurrence rescales by exp(m_old - m_new) with the true
    running row max (same invariant the dense kernel keeps,
    ops/denseattn.py).

    Gradients flow through `lax.scan` + `ppermute` (its transpose is
    the inverse rotation). SURVEY.md §2.5 names ring attention as the
    idiomatic long-context design; tests/test_sp_step.py checks
    exactness against full attention and the all-gather variant.
    """
    n_shards = jax.lax.axis_size(axis_name)
    b, n_q, h, d = q.shape
    qc = q.astype(compute_dtype)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    m0 = jnp.full((b, h, n_q), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, n_q), jnp.float32)
    acc0 = jnp.zeros((b, n_q, h, d), jnp.float32)

    def fold(m, l, acc, kc, vc):
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qc, kc.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)            # [B, H, Nq]; exp(-inf)=0 first pass
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + p.sum(axis=-1)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(compute_dtype),
            vc.astype(compute_dtype), preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + pv
        return m_new, l_new, acc_new

    @jax.checkpoint
    def body(carry, _):
        m, l, acc, kc, vc = carry
        m, l, acc = fold(m, l, acc, kc, vc)
        # rotate the k/v chunks one ICI hop
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (m, l, acc, kc, vc), None

    carry = (m0, l0, acc0, k, v)
    if n_shards > 1:
        carry, _ = jax.lax.scan(body, carry, None, length=n_shards - 1)
    m, l, acc, kc, vc = carry
    # last chunk folds outside the scan: its rotation would only return
    # the chunks to their origin to be discarded — peeling it saves two
    # dead ppermutes per call (and their transposes in the backward)
    m, l, acc = jax.checkpoint(fold)(m, l, acc, kc, vc)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


class MultiHeadAttention(nn.Module):
    """torch-style MHA: q/k/v/out projections + scaled dot-product.

    Path selection on TPU (in order):
      1. lane-packed dense Pallas kernel (ops/denseattn.py:
         dense_attention_packed) — the DEFAULT for packed_ok shapes
         (dense_ok + 64-wide heads in even count): consumes q/k/v in
         the model's own [B, N, H*D] layout, skipping the BNHD <->
         BHND HBM transposes. Measured at the set models' shapes
         (B=64, N=2048, H=4, D=64): full f32 SetVAE step 109.7 ->
         93.6 ms vs path 2. Partitions under GSPMD (batch + head-pair
         feature sharding). VST_DENSE_ATTN_PACKED=0 reverts to path 2.
      2. dense whole-row BHND Pallas kernel (ops/denseattn.py) for the
         remaining dense_ok shapes (N <= 2048 lane-aligned, n_q ==
         n_kv, no attention dropout, no seq_axis). Never spills
         [B, H, N, N] scores to HBM; partitions under GSPMD
         (custom_partitioning: batch/heads shard, N/D replicate) so it
         composes with tensor parallelism. Opt out of both dense
         kernels with VST_DISABLE_DENSE_ATTN=1 (numerics A/B: the MXU
         rounding differs from XLA attention at the ~1e-3 level).
      3. tuned-block tiled flash kernel (use_flash=True opt-in) for
         longer/unequal sequences — block tuning is the whole game
         (q=kv=1024 is 10.8 ms fwd vs 40 ms with default blocks; round
         1 measured untuned flash and wrongly concluded XLA wins). Does
         NOT auto-partition — parallel/tp.py rejects TP models whose
         shapes would route here.
      4. XLA einsum attention (bf16 matmuls + f32 softmax) — CPU, and
         every remaining case (dropout, cross-attention to the length-1
         memory token, ...).
    """

    num_heads: int
    d_model: int
    use_flash: bool = False
    dropout_rate: float = 0.0
    compute_dtype: object = None  # e.g. jnp.bfloat16: projections run on
    # the MXU at full rate; params stay f32, softmax accumulates f32
    seq_axis: str | None = None  # mesh axis sharding the POINT/sequence
    # dimension of inputs_kv (sequence parallelism): k/v are all-gathered
    # over ICI inside shard_map (sequence_sharded_attention). Only set by
    # SELF-attention call sites — cross-attention to the replicated
    # length-1 latent memory token needs no collective.
    seq_ring: bool = False  # with seq_axis: rotate k/v chunks around the
    # ICI ring + online softmax (ring_attention) instead of all-gather —
    # O(N/p) peak kv memory for clouds where one full k/v copy won't fit

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, train: bool = False):
        h = self.num_heads
        d = self.d_model // h
        scale = 1.0 / float(np.sqrt(d))

        # torch MHA _reset_parameters: in-proj xavier_uniform, in-proj
        # bias zeros, out-proj weight Linear-default, out-proj bias zeros
        def in_proj(name):
            return nn.Dense(
                self.d_model, name=name,
                dtype=self.compute_dtype,
                kernel_init=_mha_in_proj_init,
                bias_init=nn.initializers.zeros,
            )

        b, n_q = inputs_q.shape[0], inputs_q.shape[1]
        n_kv = inputs_kv.shape[1]
        if (n_kv == 1 and self.seq_axis is None
                and not (self.dropout_rate > 0.0 and train)):
            # seq_axis must be None: under sequence parallelism n_kv is
            # the LOCAL shard length — a 1-point-per-shard config would
            # otherwise skip the cross-shard all-gather/ring entirely
            # and silently attend to nothing but the local point.
            # (torch drops attention WEIGHTS — at kv length 1 that
            # zeroes whole rows — so a training dropout config falls
            # through to the materialized-scores branch below)
            # cross-attention to a single memory token (the set
            # decoder's latent, model.py:972-992): softmax over ONE key
            # is identically 1.0, so the output is the value projection
            # broadcast over queries and the q/k paths carry ZERO
            # gradient (softmax jacobian of a constant distribution).
            # Compute only the v projection; register the q/k params on
            # a 1-token slice so the param tree (and log.txt param
            # counts) stay identical.
            in_proj("query")(inputs_q[:, :1])
            in_proj("key")(inputs_kv)
            v1 = in_proj("value")(inputs_kv)          # [B, 1, d_model]
            out = jnp.broadcast_to(v1, (b, n_q, self.d_model))
            return nn.Dense(
                self.d_model, name="out",
                dtype=self.compute_dtype,
                kernel_init=torch_linear_kernel_init,
                bias_init=nn.initializers.zeros,
            )(out)
        if inputs_q is inputs_kv and _fused_qkv_on():
            # SELF-attention: q/k/v all project the same activations, so
            # issue ONE [B, N, d] x [d, 3d] matmul instead of three
            # MXU-narrow [d, d] ones (reads the input once from HBM and
            # fills 3x the output lanes per pass; torch fuses
            # identically via nn.MultiheadAttention.in_proj_weight).
            # Output stays in the model's [B, N, 3*d_model] lane layout
            # — the slices below feed the packed kernel directly, no
            # head-layout permutation (the rejected einsum-to-BHND
            # variant's failure mode).
            f_in = inputs_q.shape[-1]
            wq, bq = _InProj(self.d_model, name="query")(f_in)
            wk, bk = _InProj(self.d_model, name="key")(f_in)
            wv, bv = _InProj(self.d_model, name="value")(f_in)
            w3 = jnp.concatenate([wq, wk, wv], axis=1)
            b3 = jnp.concatenate([bq, bk, bv])
            x_in = inputs_q
            if self.compute_dtype is not None:
                x_in = x_in.astype(self.compute_dtype)
                w3 = w3.astype(self.compute_dtype)
                b3 = b3.astype(self.compute_dtype)
            qkv = x_in @ w3 + b3
            q = qkv[..., : self.d_model]
            k = qkv[..., self.d_model: 2 * self.d_model]
            v = qkv[..., 2 * self.d_model:]
        else:
            q = in_proj("query")(inputs_q)
            k = in_proj("key")(inputs_kv)
            v = in_proj("value")(inputs_kv)
        q_flat, k_flat, v_flat = q, k, v   # [B, N, d_model] — the lane-
        # packed kernel consumes this layout directly (no head reshape)
        q = q.reshape(b, n_q, h, d)
        k = k.reshape(b, n_kv, h, d)
        v = v.reshape(b, n_kv, h, d)

        if self.seq_axis is not None:
            # sequence parallelism: the point axis of inputs_kv is a
            # shard; gather full keys/values over ICI, attend locally.
            # Dropout on attention weights is unsupported here (the
            # shipped configs are dropout-free); flash is bypassed — the
            # all-gathered XLA path is the SP design (ops docstring).
            # Eval traces (train=False) are fine: dropout is identity.
            if self.dropout_rate > 0.0 and train:
                raise NotImplementedError(
                    "attention-weight dropout is not supported under "
                    "sequence parallelism (seq_axis)"
                )
            sp_attn = ring_attention if self.seq_ring else sequence_sharded_attention
            out = sp_attn(
                q, k, v, scale, self.seq_axis,
                compute_dtype=self.compute_dtype or jnp.bfloat16,
            )
        elif self.dropout_rate > 0.0 and train:
            # torch MHA drops attention WEIGHTS — requires materialized
            # scores, so this path is XLA-only (flash keeps them in
            # VMEM). At eval dropout is identity, so train=False falls
            # through to the kernel paths below.
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk",
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scale
            weights = jax.nn.softmax(logits, axis=-1)
            weights = nn.Dropout(self.dropout_rate)(weights, deterministic=not train)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd",
                weights.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)
        elif self.seq_axis is None and _packed_attn_ok(n_q, n_kv, h, d):
            from vae_song_tpu.ops.denseattn import dense_attention_packed

            out = dense_attention_packed(q_flat, k_flat, v_flat, scale)
        elif _dense_default_ok(n_q, n_kv, d):
            from vae_song_tpu.ops.denseattn import dense_attention

            # DEFAULT TPU path for eligible shapes, f32 included: the
            # whole-row kernel never spills [B, H, N, N] scores to HBM
            # (f32 SetVAE step 200 -> 118 ms vs XLA attention) and it
            # partitions under GSPMD, so no use_flash opt-in is needed.
            # Set VST_DISABLE_DENSE_ATTN=1 to force XLA attention for
            # numerics A/B (the kernel's MXU rounding differs from
            # XLA's at the ~1e-3 level on f32 inputs).
            # (An alternative that projects q/k/v straight into the
            # kernel's [B, H, N, D] layout via reshaped-weight einsums
            # was profiled and REJECTED: XLA materializes the einsums'
            # output permutation as MORE copies than the explicit
            # transposes here — 7.6 vs 6.0 ms/step at the SetVAE
            # shapes, 70.1 vs 69.1 ms device step.)
            out = dense_attention(q, k, v, scale)
        elif self.use_flash and _flash_ok(q, k):
            out = _flash_attention(q, k, v, scale)
        else:
            out = _xla_attention(q, k, v, scale)

        out = out.reshape(b, n_q, self.d_model)
        return nn.Dense(
            self.d_model, name="out",
            dtype=self.compute_dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=nn.initializers.zeros,
        )(out)
