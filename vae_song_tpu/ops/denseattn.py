"""Dense (whole-row) Pallas attention for the set models' shapes.

The jax flash-attention kernel streams online-softmax tiles — the right
design when N^2 scores don't fit on chip. At the set models' shapes
(N = 2048, D = 64: model.py:950-992, config_shapenet_setvae.yaml) the
FULL [N, N] f32 score matrix is 16.8 MB — it fits comfortably in a v5e
core's VMEM, so a one-shot kernel that materializes scores on-chip
skips the online-softmax bookkeeping entirely:

  forward  (per batch*head grid step):
      S = (q k^T) * scale;  P = softmax(S);  out = P v
  backward (recompute, no [N, N] residuals in HBM):
      P  = softmax(q k^T * scale)
      dV = P^T dO
      dP = dO v^T
      dS = P * (dP - rowsum(dP * P))
      dQ = dS k * scale;  dK = dS^T q * scale

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


def _vpu_dtype(dtype):
    """Elementwise softmax passes run at 2x VPU rate in bf16; keep them
    f32 when the caller computes in f32 (the parity path)."""
    return jnp.float32 if dtype == jnp.float32 else jnp.bfloat16


def _softmax_shift(q, k, s, scale, cd):
    """Row shift for a stable exp: the exact row max, all dtypes.

    A Cauchy-Schwarz bound (|q_i|*max|k_j|*scale, computed from the
    [N, D] operands) was tried here to save the [N, N] max pass (~8%
    of fwd): REJECTED. When training transients blow up activations
    (e.g. the SetVAE KL spike in the first epoch at the reference's
    lr=1e-2), the bound's slack exceeds bf16's exp range, the whole
    row underflows to p=0, l=0, and o = 0/0 — measured NaN at step 8
    of the shipped ShapeNet config. The exact max is uncondition-
    ally safe: exp(s - max) has a guaranteed 1.0 entry, so l >= 1."""
    del q, k, scale, cd
    return s.max(axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]                       # [N, D]
    k = k_ref[0]
    v = v_ref[0]
    cd = _vpu_dtype(q.dtype)
    # Mosaic requires a 32-bit matmul accumulator; cast down AFTER the
    # dot so the softmax passes over [N, N] run at bf16 VPU rate
    s = (jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(cd)              # [N, N]
    m = _softmax_shift(q, k, s, scale, cd)
    p = jnp.exp(s - m)
    # f32 row-sum: the normalizer accumulates 2048 terms
    l = p.astype(jnp.float32).sum(axis=1, keepdims=True)
    # normalize AFTER the PV matmul: N*D divides instead of N*N
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(q.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    cd = _vpu_dtype(q.dtype)
    s = (jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(cd)
    m = _softmax_shift(q, k, s, scale, cd)
    e = jnp.exp(s - m)
    l = e.astype(jnp.float32).sum(axis=1, keepdims=True)
    p = e * (1.0 / l).astype(cd)                   # [N, N], one VPU pass
    dv_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), do, (((0,), (0,)), ((), ())),  # P^T dO
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),           # dO V^T  [N, N]
        preferred_element_type=jnp.float32,
    ).astype(cd)
    # the rowsum is the softmax-jacobian inner product — f32 accumulate
    prod = dp * p
    row = prod.astype(jnp.float32).sum(axis=1, keepdims=True)
    ds = (p * (dp - row.astype(cd))).astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(q.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),           # dS^T Q
        preferred_element_type=jnp.float32,
    ) * scale).astype(q.dtype)


def _call_fwd(q, k, v, scale, interpret):
    """Raw pallas call over locally-materialized [B, H, N, D] shards."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    fold = lambda a: a.reshape(b * h, n, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(b, h, n, d)


def _call_bwd(q, k, v, do, scale, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    fold = lambda a: a.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((b * h, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 3,
        out_shape=(shape,) * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fold(q), fold(k), fold(v), fold(do))
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

def _bh_sharding(arg_shape, mesh):
    """Keep the batch/head dim shardings of `arg_shape`, replicate N/D."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = arg_shape.sharding
    spec = tuple(sh.spec) + (None,) * (4 - len(sh.spec))
    return NamedSharding(getattr(sh, "mesh", mesh), P(spec[0], spec[1], None, None))


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fwd(q, k, v):
        return _call_fwd(q, k, v, scale, interpret)

    def infer(mesh, arg_shapes, result_shape):
        return _bh_sharding(arg_shapes[0], mesh)

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)

        def lower(q, k, v):
            return _call_fwd(q, k, v, scale, interpret)

        return mesh, lower, sh, (sh, sh, sh)

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h n d, b h n d, b h n d -> b h n d",
        need_replication_factors=("n", "d"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def bwd(q, k, v, do):
        return _call_bwd(q, k, v, do, scale, interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)
        return (sh, sh, sh)

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0], mesh)

        def lower(q, k, v, do):
            return _call_bwd(q, k, v, do, scale, interpret)

        return mesh, lower, (sh, sh, sh), (sh, sh, sh, sh)

    bwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h n d, b h n d, b h n d, b h n d "
                      "-> b h n d, b h n d, b h n d",
        need_replication_factors=("n", "d"),
    )
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dense_attention_bhnd(q, k, v, scale, interpret):
    return _fwd_partitioned(scale, interpret)(q, k, v)


def _vjp_fwd(q, k, v, scale, interpret):
    return _fwd_partitioned(scale, interpret)(q, k, v), (q, k, v)


def _vjp_bwd(scale, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_partitioned(scale, interpret)(q, k, v, do)
    return dq, dk, dv


_dense_attention_bhnd.defvjp(_vjp_fwd, _vjp_bwd)


def dense_attention(q, k, v, scale, interpret: bool = False):
    """Whole-row Pallas attention. q/k/v: [B, N, H, D] (the framework's
    attention layout); returns [B, N, H, D]. Requires n_q == n_kv <=
    MAX_DENSE_SEQ (shape-checked by the caller). Partitions over batch
    and heads under pjit/GSPMD (custom_partitioning above)."""
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
