#!/usr/bin/env python
"""Round-4 packed-backward experiments, part 2. The part-1 ablation
attributed ~3 ms/backward above the half-rate matmul floor to
non-matmul work; prime suspect: Mosaic must TRANSPOSE the [BQ, N]
operands p (for dv = p^T do) and ds (for dk = ds^T qc) to stream the
MXU. Variants:

  tpose   — compute dv/dk TRANSPOSED (do^T p, qc^T ds -> [64, N]):
            only the tiny [BQ, 64] operands relayout; dkT/dvT
            accumulate as [128, N] f32 scratch; outputs emitted in
            [B, HD, N] layout (the caller transposes outside, where
            XLA can fold it into the projection-VJP matmuls).
  tpose-emitT — same but transpose back inside the kernel at the last
            row block.
  noconcat — baseline math, but slice-stores instead of lane concats
            for dq and the dk/dv accumulators.
  sem     — dimension_semantics=("parallel","parallel","arbitrary").

  python scripts/ab_attn_ablate2.py > /tmp/ab_ablate2.log 2>&1
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vae_song_tpu.ops import denseattn as da

B, N, H, D = 64, 2048, 4, 64
SCALE = 1.0 / np.sqrt(D)


def _common_head(qc, k, v, do, o, lse, cd, dt):
    s = jax.lax.dot_general(
        qc, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2((s - lse).astype(cd))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=1, keepdims=True
    )
    ds = (p * (dp - delta.astype(cd))).astype(dt)
    dq = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * SCALE).astype(dt)
    return p, ds, dq


def kern_tpose(q_ref, k_ref, v_ref, do_ref, o_ref, lse_a_ref, lse_b_ref,
               dq_ref, dk_ref, dv_ref, dkT_acc, dvT_acc,
               *, nblocks, emit_t):
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)
    for h, (qc, k, v, do, o, lse) in enumerate(zip(
        da._heads2(qc2), da._heads2(k2), da._heads2(v2),
        da._heads2(do2), da._heads2(o2), lses,
    )):
        p, ds, dq = _common_head(qc, k, v, do, o, lse, cd, dt)
        dq_ref[0, :, h * 64:(h + 1) * 64] = dq
        # TRANSPOSED dv/dk: contraction over dim 0 of both operands
        # -> [64, N]; only do/qc ([BQ, 64]) need relayout, not p/ds
        dvT = jax.lax.dot_general(
            do, p.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkT = jax.lax.dot_general(
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
        if emit_t:
            dk_ref[0] = dkT_acc[:].T.astype(dt)
            dv_ref[0] = dvT_acc[:].T.astype(dt)
        else:
            dk_ref[0] = dkT_acc[:].astype(dt)
            dv_ref[0] = dvT_acc[:].astype(dt)


def kern_noconcat(q_ref, k_ref, v_ref, do_ref, o_ref, lse_a_ref, lse_b_ref,
                  dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, nblocks):
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)
    for h, (qc, k, v, do, o, lse) in enumerate(zip(
        da._heads2(qc2), da._heads2(k2), da._heads2(v2),
        da._heads2(do2), da._heads2(o2), lses,
    )):
        p, ds, dq = _common_head(qc, k, v, do, o, lse, cd, dt)
        dq_ref[0, :, h * 64:(h + 1) * 64] = dq
        dv_new = jax.lax.dot_general(
            p.astype(dt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_new = jax.lax.dot_general(
            ds, qc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * da.LN2

        @pl.when(r == 0)
        def _init():
            dk_acc[:, h * 64:(h + 1) * 64] = dk_new
            dv_acc[:, h * 64:(h + 1) * 64] = dv_new

        @pl.when(r > 0)
        def _acc():
            dk_acc[:, h * 64:(h + 1) * 64] = (
                dk_acc[:, h * 64:(h + 1) * 64] + dk_new
            )
            dv_acc[:, h * 64:(h + 1) * 64] = (
                dv_acc[:, h * 64:(h + 1) * 64] + dv_new
            )

    @pl.when(r == nblocks - 1)
    def _emit():
        dk_ref[0] = dk_acc[:].astype(dt)
        dv_ref[0] = dv_acc[:].astype(dt)


def call(kind, q, k, v, do, o, lse_a, lse_b, bq=1024, semantics=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    nblocks = n // bq
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    shape = jax.ShapeDtypeStruct((b, n, hd), q.dtype)
    kw = dict(vmem_limit_bytes=100 * 1024 * 1024)
    if semantics:
        kw["dimension_semantics"] = semantics
    if kind in ("tpose", "tpose-emitT"):
        emit_t = kind == "tpose-emitT"
        if emit_t:
            kvspec, kvshape = fullspec, shape
        else:
            # [B, HD, N] transposed outputs, 128-sublane blocks
            kvspec = pl.BlockSpec((1, 128, n), lambda i, j, r: (i, j, 0))
            kvshape = jax.ShapeDtypeStruct((b, hd, n), q.dtype)
        kernel = functools.partial(kern_tpose, nblocks=nblocks,
                                   emit_t=emit_t)
        out_specs = (rowspec, kvspec, kvspec)
        out_shape = (shape, kvshape, kvshape)
    else:
        kernel = functools.partial(kern_noconcat, nblocks=nblocks)
        out_specs = (rowspec, fullspec, fullspec)
        out_shape = (shape,) * 3
    return pl.pallas_call(
        kernel,
        grid=(b, hp, nblocks),
        in_specs=[rowspec, fullspec, fullspec, rowspec, rowspec,
                  lse_spec, lse_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((128, n) if kind.startswith("tpose") else (n, 128),
                       jnp.float32),
            pltpu.VMEM((128, n) if kind.startswith("tpose") else (n, 128),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(**kw),
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
    timeit("bwd-current", cur, q, k, v, do, o, lse_a, lse_b)

    for kind in ("noconcat", "tpose", "tpose-emitT"):
        f = jax.jit(functools.partial(call, kind))
        got = f(q, k, v, do, o, lse_a, lse_b)
        names = ("dq", "dk", "dv")
        for i, (name, a) in enumerate(zip(names, ref)):
            b_ = got[i]
            if kind == "tpose" and name in ("dk", "dv"):
                b_ = jnp.transpose(b_, (0, 2, 1))
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
            print(f"  {kind} {name}: max abs diff {err:.3e}", flush=True)
        timeit(f"bwd-{kind}", f, q, k, v, do, o, lse_a, lse_b)

    # + outside transpose cost for the tpose variant (what the VJP
    # wrapper would pay if XLA materializes it)
    f = jax.jit(lambda *a: [
        call("tpose", *a)[0],
        jnp.transpose(call("tpose", *a)[1], (0, 2, 1)),
    ][0])
    g = jax.jit(lambda *a: (lambda r: (r[0],
                                       jnp.transpose(r[1], (0, 2, 1)),
                                       jnp.transpose(r[2], (0, 2, 1))))(
        call("tpose", *a)))
    timeit("bwd-tpose+outerT", g, q, k, v, do, o, lse_a, lse_b)

    f = jax.jit(functools.partial(
        call, "noconcat", semantics=("parallel", "parallel", "arbitrary")))
    timeit("bwd-noconcat-sem", f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
