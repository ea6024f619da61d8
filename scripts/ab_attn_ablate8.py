#!/usr/bin/env python
"""Round-4 packed-attention experiments, part 8: fold the backward's
broadcast-subtracts into the matmuls via augmented ones-columns.

The packed backward's remaining VPU passes over [BQ, N] are
  (1) p  = exp2((s - lse).astype(cd))      f32 sub + cast + exp2
  (2) dp = dot(do, v^T).astype(cd)         f32 -> cd cast
  (3) ds = p * (dp - delta.astype(cd))     cd sub + mul
Both subtracts are per-query-row broadcasts ([BQ, 1] against [BQ, N]),
so they can ride the matmuls that PRODUCE s and dp: append the negated
row constants as extra operand columns against ones-columns in k/v
(the contraction dim is 64 and lane-pads to 128 regardless, so the
extra columns cost no MXU work — the output-dim version of this trick
is already production in _pv_and_rowsum).

  delta fold (1 extra column): production already rounds delta to cd
  before subtracting, so a single -delta.astype(dt) column is at least
  as accurate (the subtract lands in the f32 accumulator).
  lse fold (2 columns, hi/lo split): production subtracts lse in f32;
  a single bf16 column would perturb the exp2 argument by up to
  2^-8 * |lse|. hi = bf16(lse), lo = bf16(lse - hi) keeps the folded
  subtract within ~2^-16 * |lse| of f32 — below the existing bf16
  rounding of the argument.

Variants (all parity-checked against the production backward):
  bwd-cur    — production baseline (BWD_BLOCK_Q=1024)
  bwd-dfuse  — delta fold only
  bwd-lfuse  — lse fold only
  bwd-bfuse  — both folds
  bwd-bfuse-2048 — both folds, whole-row

  python scripts/ab_attn_ablate8.py > /tmp/ab_ablate8.log 2>&1
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from vae_song_tpu.ops import denseattn as da

B, N, H, D = 64, 2048, 4, 64
SCALE = 1.0 / np.sqrt(D)


def kern_bwd_fused(q_ref, k_ref, v_ref, do_ref, o_ref,
                   lse_a_ref, lse_b_ref, dq_ref, dk_ref, dv_ref,
                   dkT_acc, dvT_acc, *, scale, nblocks,
                   fuse_lse, fuse_delta):
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    cd = da._vpu_dtype(q2.dtype)
    dt = q2.dtype
    qc2 = (q2.astype(jnp.float32) * (scale * da.LOG2E)).astype(dt)
    for h, (qc, k, v, do, o, lse) in enumerate(zip(
        da._heads2(qc2), da._heads2(k2), da._heads2(v2),
        da._heads2(do2), da._heads2(o2), lses,
    )):
        n = k.shape[0]
        if fuse_lse:
            hi = lse.astype(dt)
            lo = (lse - hi.astype(jnp.float32)).astype(dt)
            qc_aug = jnp.concatenate([qc, -hi, -lo], axis=1)
            k_aug = jnp.concatenate(
                [k, jnp.ones((n, 2), dt)], axis=1)
            s = lax.dot_general(
                qc_aug, k_aug, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # == s - lse
            p = jnp.exp2(s.astype(cd))
        else:
            s = lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2((s - lse).astype(cd))
        dvT = lax.dot_general(
            do, p.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
            axis=1, keepdims=True
        )
        if fuse_delta:
            do_aug = jnp.concatenate([do, -delta.astype(dt)], axis=1)
            v_aug = jnp.concatenate(
                [v, jnp.ones((n, 1), dt)], axis=1)
            dp = lax.dot_general(
                do_aug, v_aug, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                        # == dp - delta
            ds = (p * dp).astype(dt)
        else:
            dp = lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            ds = (p * (dp - delta.astype(cd))).astype(dt)
        dq_ref[0, :, h * 64:(h + 1) * 64] = (lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dt)
        dkT = lax.dot_general(
            qc, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * da.LN2

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


def call_bwd_fused(bq, fuse_lse, fuse_delta, q, k, v, do, o,
                   lse_a, lse_b):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    nblocks = n // bq
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    shape = jax.ShapeDtypeStruct((b, n, hd), q.dtype)
    return pl.pallas_call(
        functools.partial(
            kern_bwd_fused, scale=SCALE, nblocks=nblocks,
            fuse_lse=fuse_lse, fuse_delta=fuse_delta,
        ),
        grid=(b, hp, nblocks),
        in_specs=[rowspec, fullspec, fullspec, rowspec, rowspec,
                  lse_spec, lse_spec],
        out_specs=(rowspec, fullspec, fullspec),
        out_shape=(shape,) * 3,
        scratch_shapes=[
            pltpu.VMEM((128, n), jnp.float32),
            pltpu.VMEM((128, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, do, o, lse_a, lse_b)


def timeit(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    _ = float(out[0].reshape(-1)[0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    inner, best = 10, float("inf")
    for _t in range(4):
        t0 = time.time()
        for _i in range(inner):
            out = fn(*args)
        _ = float(out[0].reshape(-1)[0])
        best = min(best, (time.time() - t0) / inner)
    print(f"RESULT {tag}: {best*1000:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.normal(size=(B, N, H * D)), dt)
    k = jnp.asarray(rng.normal(size=(B, N, H * D)), dt)
    v = jnp.asarray(rng.normal(size=(B, N, H * D)), dt)
    do = jnp.asarray(rng.normal(size=(B, N, H * D)), dt)

    fwd = jax.jit(lambda q, k, v: da._call_fwd_packed(q, k, v, SCALE, False))
    o, lse_a, lse_b = fwd(q, k, v)

    cur = jax.jit(lambda *a: da._call_bwd_packed(*a, SCALE, False))
    ref = cur(q, k, v, do, o, lse_a, lse_b)
    timeit("bwd-cur", cur, q, k, v, do, o, lse_a, lse_b)

    variants = [
        ("bwd-dfuse", 1024, False, True),
        ("bwd-lfuse", 1024, True, False),
        ("bwd-bfuse", 1024, True, True),
        ("bwd-bfuse-2048", 2048, True, True),
    ]
    for tag, bq, fl, fd in variants:
        f = jax.jit(functools.partial(call_bwd_fused, bq, fl, fd))
        got = f(q, k, v, do, o, lse_a, lse_b)
        for name, a, b_ in zip(("dq", "dk", "dv"), ref, got):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
            print(f"  {tag} {name}: max abs diff {err:.3e}", flush=True)
        timeit(tag, f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
