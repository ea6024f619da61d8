"""Fused transformer-FFN Pallas kernel (residual + 2-layer ReLU MLP).

The set models' FFN (model.py:950-992: torch TransformerEncoderLayer /
TransformerDecoderLayer, d_model=256 -> ff_dim=512 -> 256, ReLU) runs
as two separate XLA matmuls over M = B*N = 131072 rows. XLA cannot fuse
across a matmul boundary, so the [M, 512] hidden activation makes a
full HBM round trip in the forward (134 MB bf16 written + read back),
is saved as a residual for the backward, and is read twice more there
(ReLU mask + dW2 contraction) — the round-5 step split measured the
FFN slice at 9.14 ms of the 52.2 ms SetVAE step against a ~4.2 ms
pure-MXU floor: the slice is HBM-bound on h1 traffic.

This kernel runs the whole residual branch in one pallas_call per
direction, streaming x in row blocks while BOTH weight matrices
(256x512 + 512x256 bf16 = 0.5 MB) stay resident in VMEM:

  forward  (grid (M/BM,)):   y = x + relu(x W1 + b1) W2 + b2
      h1 lives only in VMEM — nothing but x and y touch HBM.
  backward (score-recompute, flash-attention style):
      h   = relu(x W1 + b1)            # recomputed, never stored
      dh  = (dy W2^T) * [h > 0]
      dx  = dy + dh W1^T               # residual grad fused in
      dW1 += x^T dh    dW2 += h^T dy   # f32 VMEM scratch accumulated
      db1 += colsum dh  db2 += colsum dy   # across row blocks,
                                           # written once at the end
  The recompute costs one extra [BM,256]x[256,512] matmul per block
  (+0.2 ms/layer at the set shapes) and removes every h1 HBM transfer
  plus the residual itself from the step.

Numerics match the XLA path's: matmuls accumulate f32 on the MXU
(Mosaic requires 32-bit accumulators) and round to the compute dtype
exactly where flax's Dense(dtype=bf16) does; weight-grad partial sums
accumulate f32 across row blocks (XLA's single big wgrad dot also
accumulates f32 internally) and round to the cotangent dtype once.
Exact-parity tests vs the two-Dense composition run in interpret mode
on CPU (tests/test_ffn_kernel.py).

MEASURED RESULT (round 5, v5e, scripts/ab_ffn.py at M=131072 bf16):
the fusion is a DEAD END at these shapes — 1.94 ms fwd+bwd at the best
row block (4096; 1.96/1.98/2.04/2.14 at 2048/1024/512/8192) vs
1.785 ms for the XLA path, and 0.94 vs 0.64 ms forward-only. XLA's FFN
is already at the overlapped HBM floor: the h1 round trip hides
entirely behind the MXU work and bias/ReLU ride the matmul epilogues,
while the Pallas kernel pays VMEM round trips for its f32 [BM, f] dot
intermediates (Mosaic has no epilogue fusion across dot_general) plus
the backward's recompute matmul. The d=256 contraction is too shallow
to leave HBM slack worth reclaiming.

Wired into the set models' encoder/decoder FFN branches
(models/setvae.py) as an OPT-IN (VST_FUSED_FFN=1) A/B arm for TPU +
dropout-free traces; default stays the XLA path on the numbers above.
"""

import functools

import jax
import jax.numpy as jnp

# Row block for both grids. M = B*N = 131072 at the shipped ShapeNet
# configs; 4096 rows keep the per-block f32 dot outputs ([BM, 512] =
# 8 MB) small enough for Mosaic to double-buffer the five matmuls.
BLOCK_M = 4096


def _pick_bm(m: int) -> int:
    for bm in (BLOCK_M, 2048, 1024, 512, 256, 128):
        if m % bm == 0:
            return bm
    return m


def fused_ffn_ok(m: int, d: int, f: int) -> bool:
    """Shapes the kernel lowers for: lane-aligned widths and a row count
    it can block (everything else falls back to the XLA path)."""
    return (
        d % 128 == 0
        and f % 128 == 0
        and m % 128 == 0
        and m >= 1024
        # both weight matrices + biases must sit in VMEM alongside the
        # row blocks; 2*d*f covers W1 and W2 (bf16/f32 <= 4 B)
        and 2 * d * f * 4 <= 32 * 1024 * 1024
    )


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...]                                 # [BM, d]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [BM, f] f32 accum
    # bias + ReLU in f32 (Mosaic lowers compares/max only for 32-bit
    # operands — the bf16 variant fails "Target does not support this
    # comparison"), then one rounding to the compute dtype
    h = jnp.maximum(h + b1_ref[...].astype(jnp.float32), 0.0)
    h = h.astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[...] = y.astype(x.dtype) + b2_ref[...] + x


def _ffn_bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dw1_acc, db1_acc, dw2_acc, db2_acc,
                    *, nblocks):
    import jax.experimental.pallas as pl

    r = pl.program_id(0)
    x = x_ref[...]                                 # [BM, d]
    dy = dy_ref[...]
    # recompute h exactly as the forward did (same f32 chain + rounding)
    h32 = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h32 = jnp.maximum(h32 + b1_ref[...].astype(jnp.float32), 0.0)
    h = h32.astype(x.dtype)
    dh32 = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),  # dy W2^T  [BM, f]
        preferred_element_type=jnp.float32,
    )
    # ReLU gate as an f32 compare + multiply (same-shape elementwise;
    # bf16 compares don't lower, and i1 broadcast relayouts are a
    # Mosaic limitation)
    dh32 = dh32 * (h32 > 0.0).astype(jnp.float32)
    dh = dh32.astype(x.dtype)
    dx = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),  # dh W1^T  [BM, d]
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(x.dtype) + dy
    # weight/bias grads: partial sums over this row block, accumulated
    # f32 in VMEM scratch across the sequential grid steps
    dw1p = jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())),            # x^T dh  [d, f]
        preferred_element_type=jnp.float32,
    )
    dw2p = jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())),            # h^T dy  [f, d]
        preferred_element_type=jnp.float32,
    )
    db1p = dh32.sum(axis=0, keepdims=True)          # [1, f] f32
    db2p = dy.astype(jnp.float32).sum(axis=0, keepdims=True)

    @pl.when(r == 0)
    def _init():
        dw1_acc[...] = dw1p
        db1_acc[...] = db1p
        dw2_acc[...] = dw2p
        db2_acc[...] = db2p

    @pl.when(r > 0)
    def _acc():
        dw1_acc[...] = dw1_acc[...] + dw1p
        db1_acc[...] = db1_acc[...] + db1p
        dw2_acc[...] = dw2_acc[...] + dw2p
        db2_acc[...] = db2_acc[...] + db2p

    @pl.when(r == nblocks - 1)
    def _emit():
        dw1_ref[...] = dw1_acc[...].astype(x.dtype)
        db1_ref[...] = db1_acc[...].astype(x.dtype)
        dw2_ref[...] = dw2_acc[...].astype(x.dtype)
        db2_ref[...] = db2_acc[...].astype(x.dtype)


def _call_fwd(x2, w1, b1, w2, b2, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x2.shape
    f = w1.shape[1]
    bm = _pick_bm(m)
    row = pl.BlockSpec((bm, d), lambda i: (i, 0))
    return pl.pallas_call(
        _ffn_fwd_kernel,
        grid=(m // bm,),
        in_specs=[
            row,
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)


def _call_bwd(x2, dy, w1, b1, w2, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x2.shape
    f = w1.shape[1]
    bm = _pick_bm(m)
    nblocks = m // bm
    row = pl.BlockSpec((bm, d), lambda i: (i, 0))
    whole = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    dt = x2.dtype
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[row, row, whole(d, f), whole(1, f), whole(f, d)],
        out_specs=(row, whole(d, f), whole(1, f), whole(f, d),
                   whole(1, d)),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), dt),
            jax.ShapeDtypeStruct((d, f), dt),
            jax.ShapeDtypeStruct((1, f), dt),
            jax.ShapeDtypeStruct((f, d), dt),
            jax.ShapeDtypeStruct((1, d), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, dy, w1, b1, w2)
    return dx, dw1, db1, dw2, db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ffn2(x2, w1, b1, w2, b2, interpret):
    return _call_fwd(x2, w1, b1, w2, b2, interpret)


def _vjp_fwd(x2, w1, b1, w2, b2, interpret):
    y = _call_fwd(x2, w1, b1, w2, b2, interpret)
    return y, (x2, w1, b1, w2)


def _vjp_bwd(interpret, res, dy):
    x2, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _call_bwd(x2, dy, w1, b1, w2, interpret)
    # b1/b2 enter the custom_vjp boundary as [1, f]/[1, d] (fused_ffn
    # reshapes them); the outer reshape's own vjp restores [f]/[d]
    return dx, dw1, db1, dw2, db2


_fused_ffn2.defvjp(_vjp_fwd, _vjp_bwd)


# module-level interpret default: CPU tests flip this to run the model
# integration through the kernel without a TPU (tests/test_ffn_kernel.py)
INTERPRET = False


def fused_ffn(x, w1, b1, w2, b2, interpret: bool | None = None):
    """y = x + relu(x @ w1 + b1) @ w2 + b2 in one Pallas call per
    direction (hidden activation never leaves VMEM; backward remats it
    and accumulates weight grads on-chip).

    x: [..., d]; w1: [d, f]; b1: [f]; w2: [f, d]; b2: [d]. All operands
    must share x's dtype (the caller casts params to the compute dtype
    exactly as flax Dense would). Callers gate on fused_ffn_ok."""
    if interpret is None:
        interpret = INTERPRET
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _fused_ffn2(
        x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), interpret
    )
    return y.reshape(x.shape)
