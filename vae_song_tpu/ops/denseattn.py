"""Dense (whole-row) Pallas attention for the set models' shapes.

The jax flash-attention kernel streams online-softmax tiles — the right
design when N^2 scores don't fit on chip. At the set models' shapes
(N = 2048, D = 64: model.py:950-992, config_shapenet_setvae.yaml) the
FULL [N, N] f32 score matrix is 16.8 MB — it fits comfortably in a v5e
core's VMEM, so a one-shot kernel that materializes scores on-chip
skips the online-softmax bookkeeping entirely:

  forward  (grid (batch*heads, N/BQ); FWD_BLOCK_Q=2048 == whole row at
  the set shapes — the round-4 in-step re-sweep, see FWD_BLOCK_Q):
      S2 = (q * scale * log2e) k^T           # scale folded on [N, D]
      P  = exp2(S2 - rowmax(S2));  out = P v / rowsum(P)
      also emits LSE2 = rowmax(S2) + log2(rowsum(P))
      ([B, H, N, 1] f32 — 2 MB at the set shapes, kept as a residual)
  backward (score recompute only — no [N, N] residuals in HBM, and
  none of the forward's softmax REDUCTIONS repeat):
      P  = exp2((q * scale * log2e) k^T - LSE2)   # one elementwise pass
      dV = P^T dO
      dP = dO v^T
      delta = rowsum(dO * O)                 # == rowsum(dP * P), the
                                             # flash-attention identity,
                                             # computed on [N, D]
      dS2 = P * (dP - delta)
      dQ = dS2 k * scale                     # base-2 factors cancel:
      dK = dS2^T (q*scale*log2e) * ln2       #   = scale * dS2^T q
  vs the round-2 version this removes: the [N, N] scale-multiply pass
  (folded into q on [N, D]), the exp->exp2 ladder, and in the backward
  the max pass, f32 row-sum pass, normalize pass, and the jacobian
  rowsum over [N, N] (replaced by an [N, D] pass over dO*O). Measured
  per attention at the set shapes (bf16): fwd 8.9 -> 7.7 ms.

Matmuls run on the MXU with f32 accumulation (Mosaic requires 32-bit
accumulators); the softmax passes over [N, N] run in bf16 when the
inputs are bf16 (2x VPU rate), with the normalizer row-sum kept f32.
Only q/k/v/out (and the cotangents) ever touch HBM. Measured on v5e at
B=64/N=2048/H=4/D=64: 16.5 ms fwd+bwd per attention vs 21.7 ms for the
tuned flash kernel (24% faster); full SetVAE train step 117.6 ->
88.6 ms (see PARITY.md round-2 perf table).

Used automatically by MultiHeadAttention's `use_flash` path when the
sequence is short enough for VMEM (ops/attention.py:_flash_attention);
fully tested against XLA attention in interpret mode on CPU
(tests/test_denseattn.py) and on-chip by the bench.
"""

import functools

import jax
import jax.numpy as jnp

# [N, N] f32 scores must fit VMEM alongside q/k/v and P: 2048^2 * 4 B
# = 16.8 MB each; cap where two such buffers + slack stay under ~64 MB
MAX_DENSE_SEQ = 2048

# query-row block for the forward grid. 1024 was tuned before the
# base-2/LSE rework; a round-4 in-step re-sweep (same-session A/B,
# /tmp/setvae_fwdbq.log) measured whole-row 2048 fastest: 52.11 ms/step
# vs 52.4 (1024) / 52.44 (512) on the bf16 scanned SetVAE step. Rows
# fall back to whole-N when n % BQ != 0, so 2048 == whole row at the
# set shapes.
FWD_BLOCK_Q = 2048

# query-row block for the packed BACKWARD grid: halving the [BQ, N]
# intermediates gives Mosaic room to double-buffer the five matmuls;
# dK/dV accumulate across row blocks in f32 VMEM scratch and are
# written once. Round-4 re-sweep with the transposed dK/dV flow:
# STANDALONE the whole row wins (9.02 vs 9.31 ms at BQ=1024, 9.76 at
# 512, scripts/ab_attn_ablate5.py) — but IN the scanned train step the
# ranking inverts (52.34 ms/step at BQ=1024 vs 52.69 at BQ=2048,
# same-session A/B): the whole-row variant's ~46 MB/head VMEM
# footprint squeezes XLA's own scheduling around the call. Block
# choices are decided by the in-step number. A direct-store whole-row
# variant without the accumulator scratch measured worse still
# (10.59 ms standalone, ablate6).
BWD_BLOCK_Q = 1024

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _vpu_dtype(dtype):
    """Elementwise softmax passes run at 2x VPU rate in bf16; keep them
    f32 when the caller computes in f32 (the parity path)."""
    return jnp.float32 if dtype == jnp.float32 else jnp.bfloat16


# Softmax-shift history (round 2): a Cauchy-Schwarz norm bound
# (|q_i|*max|k_j|*scale from the [N, D] operands) was tried in place of
# the exact row max to save the [N, N] max pass (~8% of fwd): REJECTED.
# When training transients blow up activations (the SetVAE KL spike in
# the first epoch at the reference's lr=1e-2), the bound's slack
# exceeds bf16's exp range, the whole row underflows to p=0, l=0, and
# o = 0/0 — measured NaN at step 8 of the shipped ShapeNet config. The
# exact max is unconditionally safe: exp2(s - max) has a guaranteed
# 1.0 entry, so l >= 1.


def _pv_and_rowsum(p, v):
    """o = P V and l = rowsum(P) from ONE matmul: a ones column appended
    to v rides the same MXU pass (v's minor dim lane-pads to 128
    regardless when d % 128 != 0, so the extra column is free) —
    removing the separate f32 [BQ, N] row-sum VPU pass. Each p entry
    times 1.0 is exact and the accumulator is f32, so l matches the
    p.sum() formulation up to f32 reassociation. Falls back to the
    explicit sum when v has no lane-padding slack (d % 128 == 0:
    appending a column would DOUBLE the padded lane count)."""
    n, d = v.shape
    if d % 128 == 0:
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = p.astype(jnp.float32).sum(axis=1, keepdims=True)
        return o, l
    v_aug = jnp.concatenate([v, jnp.ones((n, 1), v.dtype)], axis=1)
    ol = jax.lax.dot_general(
        p, v_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                   # [BQ, d+1] f32
    return ol[:, :d], ol[:, d:]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0]                       # [BQ, D] (query-row block)
    k = k_ref[0]                       # [N, D]
    v = v_ref[0]
    cd = _vpu_dtype(q.dtype)
    # fold scale * log2e into q on [BQ, D] — removes the [N, N] scale
    # pass entirely; exp2 then computes the same softmax in base 2
    qc = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    # Mosaic requires a 32-bit matmul accumulator
    s = jax.lax.dot_general(
        qc, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                   # [BQ, N] base-2 scores, f32
    # the EXACT row max (f32): unconditionally safe shift — exp2 has a
    # guaranteed 1.0 entry, so l >= 1 (a norm-bound shortcut NaN'd
    # under training transients in round 2, see module docstring)
    m = s.max(axis=1, keepdims=True)
    # single fused shift->cast->exp2 chain at the cd VPU rate
    p = jnp.exp2((s - m).astype(cd))
    # PV matmul carries the f32 normalizer row-sum in a free ones
    # column; normalize AFTER it: BQ*D divides instead of BQ*N
    o, l = _pv_and_rowsum(p.astype(q.dtype), v)
    o_ref[0] = (o / l).astype(q.dtype)
    # base-2 LSE residual for the backward ([BQ, 1] — keeps the sublane
    # layout of the row reductions); l >= 1 so log2 is safe
    lse_ref[0] = m + jnp.log2(l)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]                               # [N, 1] f32, base 2
    cd = _vpu_dtype(q.dtype)
    qc = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qc, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # normalized probabilities in ONE elementwise pass: no max/sum
    # recompute, no separate normalize (base-2 LSE saved by the
    # forward). exp2 runs at the compute dtype's VPU rate (bf16 = 2x);
    # same numerics as the round-2 kernel, whose exp also ran on
    # bf16-rounded arguments.
    p = jnp.exp2((s - lse).astype(cd))             # [N, N]
    dv_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), do, (((0,), (0,)), ((), ())),  # P^T dO
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),           # dO V^T  [N, N]
        preferred_element_type=jnp.float32,
    ).astype(cd)
    # flash identity: rowsum(dP * P) == rowsum(dO * O) — an [N, D]
    # reduction instead of a second pass over [N, N]
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=1, keepdims=True
    )
    ds = (p * (dp - delta.astype(cd))).astype(q.dtype)
    # base-2 chain rule: dL/ds_nat = ln2 * P (dP - delta); combined
    # with the q prescale the factors reduce to plain `scale` for dQ
    # and `ln2` against the prescaled q for dK (== scale * dS^T q)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(q.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, qc, (((0,), (0,)), ((), ())),          # dS^T (q*scale*log2e)
        preferred_element_type=jnp.float32,
    ) * LN2).astype(q.dtype)


def _call_fwd(q, k, v, scale, interpret):
    """Raw pallas call over [B, H, N, D] folded to [B*H, N, D]; the
    forward grid row-blocks the query axis at FWD_BLOCK_Q.
    Returns (o [B, H, N, D], lse [B, H, N, 1] f32)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    bq = FWD_BLOCK_Q if n % FWD_BLOCK_Q == 0 else n
    fold = lambda a: a.reshape(b * h, n, d)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b * h, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(b, h, n, d), lse.reshape(b, h, n, 1)


def _call_bwd(q, k, v, do, o, lse, scale, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    fold = lambda a: a.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))
    lse_spec = pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((b * h, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec] * 5 + [lse_spec],
        out_specs=(spec,) * 3,
        out_shape=(shape,) * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fold(q), fold(k), fold(v), fold(do), fold(o), lse.reshape(b * h, n, 1))
    unfold = lambda a: a.reshape(b, h, n, d)
    return unfold(dq), unfold(dk), unfold(dv)


# ---- GSPMD/Shardy partitioning -------------------------------------
#
# A pallas_call is an opaque custom call: under pjit/GSPMD the SPMD
# partitioner would all-gather its operands onto every device. The
# kernel's grid dimension is batch*heads, so batch ('data' mesh axis,
# DP) and heads ('model' mesh axis, Megatron TP — parallel/tp.py shards
# the qkv projections by head) partition trivially: wrap the calls in
# custom_partitioning with "shard dims 0-1 freely, replicate N and D"
# rules. This is what lets use_flash compose with tensor parallelism.

def _bh_sharding(arg_shape, mesh, rank: int = 4):
    """Keep the batch/head dim shardings of the [B, H, N, D]-layout
    `arg_shape`, replicate the trailing dims (N/D — or N/1 for the LSE
    residual)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = arg_shape.sharding
    spec = tuple(sh.spec) + (None,) * (rank - len(sh.spec))
    return NamedSharding(
        getattr(sh, "mesh", mesh), P(spec[0], spec[1], None, None)
    )


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fwd(q, k, v):
        return _call_fwd(q, k, v, scale, interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)
        return (sh, _bh_sharding(arg_shapes[0], mesh, rank=4))

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)

        def lower(q, k, v):
            return _call_fwd(q, k, v, scale, interpret)

        return mesh, lower, (sh, sh), (sh, sh, sh)

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h n d, b h n d, b h n d -> b h n d, b h n e",
        need_replication_factors=("n", "d", "e"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def bwd(q, k, v, do, o, lse):
        return _call_bwd(q, k, v, do, o, lse, scale, interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)
        return (sh, sh, sh)

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)

        def lower(q, k, v, do, o, lse):
            return _call_bwd(q, k, v, do, o, lse, scale, interpret)

        return mesh, lower, (sh, sh, sh), (sh, sh, sh, sh, sh, sh)

    bwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h n d, b h n d, b h n d, b h n d, b h n d, "
                      "b h n e -> b h n d, b h n d, b h n d",
        need_replication_factors=("n", "d", "e"),
    )
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dense_attention_bhnd(q, k, v, scale, interpret):
    o, _lse = _fwd_partitioned(scale, interpret)(q, k, v)
    return o


def _vjp_fwd(q, k, v, scale, interpret):
    o, lse = _fwd_partitioned(scale, interpret)(q, k, v)
    return o, (q, k, v, o, lse)


def _vjp_bwd(scale, interpret, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _bwd_partitioned(scale, interpret)(q, k, v, do, o, lse)
    return dq, dk, dv


_dense_attention_bhnd.defvjp(_vjp_fwd, _vjp_bwd)


def dense_attention(q, k, v, scale, interpret: bool = False):
    """Whole-row Pallas attention. q/k/v: [B, N, H, D] (the framework's
    attention layout); returns [B, N, H, D]. Requires n_q == n_kv <=
    MAX_DENSE_SEQ (shape-checked by the caller). Partitions over batch
    and heads under pjit/GSPMD (custom_partitioning above). The BNHD ->
    BHND transposes here are REAL HBM copies (~6 ms/step over the
    SetVAE's attentions) but every alternative measured worse: a 4-D
    one-plane-per-grid-step Pallas variant is not lowerable (Mosaic
    requires the last two block dims (8, 128)-aligned or full), and
    reshaped-weight einsum projections emitting [B, H, N, D] directly
    made XLA materialize MORE copies (70.1 vs 69.1 ms device step)."""
    b, n, h, d = q.shape
    to_bhnd = lambda a: a.transpose(0, 2, 1, 3)
    out = _dense_attention_bhnd(to_bhnd(q), to_bhnd(k), to_bhnd(v), scale, interpret)
    return out.transpose(0, 2, 1, 3)


def dense_ok(n_q: int, n_kv: int, head_dim: int) -> bool:
    return (
        n_q == n_kv
        and n_q <= MAX_DENSE_SEQ
        and n_q % 128 == 0
        and head_dim % 64 == 0
    )


# ---- lane-packed variant (experimental, VST_DENSE_ATTN_PACKED=1) ----
#
# The BNHD <-> BHND transposes around the kernel above are real HBM
# copies (~6 ms/step over the SetVAE's attentions). This variant skips
# them by consuming q/k/v in the model's own [B, N, H*D] layout: each
# grid step takes a 128-lane window of the feature axis = TWO 64-wide
# heads, and the kernel computes both heads from static lane slices
# (qa = q[:, :64], qb = q[:, 64:]). The trailing block dims stay
# (N, 128) — Mosaic-aligned — which is what the rejected 4-D
# one-plane-per-grid-step variant could not achieve. The per-head LSE
# residuals are emitted as two [B, H/2, N, 1] outputs (full trailing
# axes, same layout trick as the base kernel's [B*H, N, 1]).
#
# Trade: the in-kernel 64-lane slices/concat are sub-tile relayouts in
# VMEM; the transposes they replace are full HBM round trips. The
# on-chip A/B (scripts/ab_packed_attn.py, v5e, B=64/N=2048/H=4/D=64)
# decided for packed: full f32 SetVAE step 109.7 -> 93.6 ms. Default
# TPU path for packed_ok shapes since round 3 (VST_DENSE_ATTN_PACKED=0
# reverts to the base kernel); partitions under GSPMD via the
# custom_partitioning rules below. Interpret-mode parity in
# tests/test_denseattn_packed.py.

def _heads2(x2):
    """Split a [N, 128] two-head window into its [N, 64] halves."""
    return x2[:, :64], x2[:, 64:]


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_a_ref, lse_b_ref,
                       *, scale):
    q2 = q_ref[0]                      # [BQ, 128] = heads (2j, 2j+1)
    k2 = k_ref[0]                      # [N, 128]
    v2 = v_ref[0]
    cd = _vpu_dtype(q2.dtype)
    qc2 = (q2.astype(jnp.float32) * (scale * LOG2E)).astype(q2.dtype)
    outs, lses = [], []
    for qc, k, v in zip(_heads2(qc2), _heads2(k2), _heads2(v2)):
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # [BQ, N] base-2 scores
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(cd))
        # normalizer row-sum rides the PV matmul (free ones column;
        # each head's v is 64-wide, half the 128-lane pad)
        o, l = _pv_and_rowsum(p.astype(q2.dtype), v)
        outs.append((o / l).astype(q2.dtype))
        lses.append(m + jnp.log2(l))
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_a_ref[0, 0] = lses[0]
    lse_b_ref[0, 0] = lses[1]


def _bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref, o_ref,
                       lse_a_ref, lse_b_ref, dq_ref, dk_ref, dv_ref,
                       dkT_acc, dvT_acc, *, scale, nblocks):
    """Query-row-blocked packed backward: grid (B, H/2, N/BWD_BLOCK_Q).

    q/do/o (and dq) stream in [BQ, 128] row blocks; k/v stay whole-N.
    dK/dV are partial sums over query rows, so they accumulate across
    the r grid steps in f32 VMEM scratch (TPU grid steps run
    sequentially) and are cast/written once at the last block.

    dK/dV are computed TRANSPOSED — dvT = dO^T P and dkT = qc^T dS
    ([64, N] outputs, contraction over the query rows) — so the MXU
    consumes the big [BQ, N] p/ds operands in their native layout
    (lhs contract dim 0 only relayouts the tiny [BQ, 64] do/qc); the
    accumulators live as [128, N] f32 scratch and transpose back once
    at the final row block. Bitwise-identical outputs; measured on v5e
    at the set shapes (bf16): 10.5 -> 8.9 ms per backward (round-4
    ablation, scripts/ab_attn_ablate2/3.py — a kT/vT scratch cache and
    a fully-transposed [N, BQ] data flow both measured WORSE)."""
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]   # q2/do2/o2: [BQ, 128]
    do2, o2 = do_ref[0], o_ref[0]               # k2/v2:    [N, 128]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])   # [BQ, 1] f32 each
    cd = _vpu_dtype(q2.dtype)
    qc2 = (q2.astype(jnp.float32) * (scale * LOG2E)).astype(q2.dtype)
    for h, (qc, k, v, do, o, lse) in enumerate(zip(
        _heads2(qc2), _heads2(k2), _heads2(v2),
        _heads2(do2), _heads2(o2), lses,
    )):
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [BQ, N]
        p = jnp.exp2((s - lse).astype(cd))
        dvT = jax.lax.dot_general(
            do, p.astype(q2.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [64, N] f32 partial
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
            axis=1, keepdims=True
        )
        ds = (p * (dp - delta.astype(cd))).astype(q2.dtype)
        dq_ref[0, :, h * 64:(h + 1) * 64] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(q2.dtype)
        dkT = jax.lax.dot_general(
            qc, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * LN2                                  # [64, N] f32 partial

        @pl.when(r == 0)
        def _init():
            dkT_acc[h * 64:(h + 1) * 64, :] = dkT
            dvT_acc[h * 64:(h + 1) * 64, :] = dvT

        @pl.when(r > 0)
        def _acc():
            dkT_acc[h * 64:(h + 1) * 64, :] = (
                dkT_acc[h * 64:(h + 1) * 64, :] + dkT
            )
            dvT_acc[h * 64:(h + 1) * 64, :] = (
                dvT_acc[h * 64:(h + 1) * 64, :] + dvT
            )

    @pl.when(r == nblocks - 1)
    def _emit():
        dk_ref[0] = dkT_acc[:].T.astype(q2.dtype)
        dv_ref[0] = dvT_acc[:].T.astype(q2.dtype)


def _call_fwd_packed(q, k, v, scale, interpret):
    """q/k/v: [B, N, H*D]; grid (B, H/2, N/BQ). Returns
    (o [B, N, H*D], lse_a, lse_b [B, H/2, N, 1] f32)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128                     # head pairs
    bq = FWD_BLOCK_Q if n % FWD_BLOCK_Q == 0 else n
    lse_shape = jax.ShapeDtypeStruct((b, hp, n, 1), jnp.float32)
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    out, lse_a, lse_b = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale),
        grid=(b, hp, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j)),
            pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j)),
            pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j)),
            lse_spec,
            lse_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            lse_shape,
            lse_shape,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out, lse_a, lse_b


def _call_bwd_packed(q, k, v, do, o, lse_a, lse_b, scale, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    bq = BWD_BLOCK_Q if n % BWD_BLOCK_Q == 0 else n
    nblocks = n // bq
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    shape = jax.ShapeDtypeStruct((b, n, hd), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_packed, scale=scale, nblocks=nblocks
        ),
        grid=(b, hp, nblocks),
        in_specs=[rowspec, fullspec, fullspec, rowspec, rowspec,
                  lse_spec, lse_spec],
        out_specs=(rowspec, fullspec, fullspec),
        out_shape=(shape,) * 3,
        scratch_shapes=[
            pltpu.VMEM((128, n), jnp.float32),   # dkT accumulator
            pltpu.VMEM((128, n), jnp.float32),   # dvT accumulator
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, do, o, lse_a, lse_b)
    return dq, dk, dv


# GSPMD partitioning for the packed layout, mirroring the base kernel's
# rules for [B, N, H*D]: batch (dim 0, 'data'/DP) shards freely; the
# feature axis (dim 2, head pairs — 'model'/TP when parallel/tp.py
# head-shards the qkv projections) shards when every shard keeps a
# whole 128-lane head pair; N replicates (each query row attends to all
# keys). The LSE residuals [B, H/2, N, 1] co-shard their head-pair dim
# with the operands' feature axis.

def _axis_size(mesh, names):
    if names is None:
        return 1
    if isinstance(names, (tuple, list)):
        size = 1
        for n in names:
            size *= mesh.shape[n]
        return size
    return mesh.shape[names]


def _packed_specs(arg_shape, mesh):
    """(qkv/o NamedSharding, lse NamedSharding) from a [B, N, F]
    operand's sharding; drops the feature sharding unless each shard
    keeps a multiple of 128 lanes (a whole head pair)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = arg_shape.sharding
    mesh = getattr(sh, "mesh", mesh)
    spec = tuple(sh.spec) + (None,) * (3 - len(sh.spec))
    feat = spec[2]
    if (arg_shape.shape[2] // _axis_size(mesh, feat)) % 128 != 0:
        feat = None
    return (
        NamedSharding(mesh, P(spec[0], None, feat)),
        NamedSharding(mesh, P(spec[0], feat, None, None)),
    )


@functools.lru_cache(maxsize=None)
def _fwd_packed_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fwd(q, k, v):
        return _call_fwd_packed(q, k, v, scale, interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh, lse_sh = _packed_specs(arg_shapes[0], mesh)
        return (sh, lse_sh, lse_sh)

    def partition(mesh, arg_shapes, result_shape):
        sh, lse_sh = _packed_specs(arg_shapes[0], mesh)

        def lower(q, k, v):
            return _call_fwd_packed(q, k, v, scale, interpret)

        return mesh, lower, (sh, lse_sh, lse_sh), (sh, sh, sh)

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        # g (the lse head-pair dim) co-shards with f only via the
        # partition fn above; the rule keeps it replicated for the
        # Shardy propagation pass (the residuals are ~1 MB)
        sharding_rule="b n f, b n f, b n f -> b n f, b g n e, b g n e",
        need_replication_factors=("n", "g", "e"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_packed_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def bwd(q, k, v, do, o, lse_a, lse_b):
        return _call_bwd_packed(q, k, v, do, o, lse_a, lse_b, scale,
                                interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh, _ = _packed_specs(arg_shapes[0], mesh)
        return (sh, sh, sh)

    def partition(mesh, arg_shapes, result_shape):
        sh, lse_sh = _packed_specs(arg_shapes[0], mesh)

        def lower(q, k, v, do, o, lse_a, lse_b):
            return _call_bwd_packed(q, k, v, do, o, lse_a, lse_b, scale,
                                    interpret)

        return (
            mesh, lower, (sh, sh, sh),
            (sh, sh, sh, sh, sh, lse_sh, lse_sh),
        )

    bwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n f, b n f, b n f, b n f, b n f, b g n e, "
                      "b g n e -> b n f, b n f, b n f",
        need_replication_factors=("n", "g", "e"),
    )
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dense_attention_packed(q, k, v, scale, interpret):
    o, _la, _lb = _fwd_packed_partitioned(scale, interpret)(q, k, v)
    return o


def _vjp_fwd_packed(q, k, v, scale, interpret):
    o, lse_a, lse_b = _fwd_packed_partitioned(scale, interpret)(q, k, v)
    return o, (q, k, v, o, lse_a, lse_b)


def _vjp_bwd_packed(scale, interpret, res, do):
    q, k, v, o, lse_a, lse_b = res
    dq, dk, dv = _bwd_packed_partitioned(scale, interpret)(
        q, k, v, do, o, lse_a, lse_b
    )
    return dq, dk, dv


_dense_attention_packed.defvjp(_vjp_fwd_packed, _vjp_bwd_packed)


def dense_attention_packed(q, k, v, scale, interpret: bool = False):
    """Lane-packed dense attention on [B, N, H*D] inputs (no BNHD <->
    BHND HBM transposes). Heads must be 64-wide and even in count
    (packed_ok). Returns [B, N, H*D]."""
    return _dense_attention_packed(q, k, v, scale, interpret)


def packed_ok(n_q: int, n_kv: int, num_heads: int, head_dim: int) -> bool:
    return (
        dense_ok(n_q, n_kv, head_dim)
        and head_dim == 64
        and num_heads % 2 == 0
    )
