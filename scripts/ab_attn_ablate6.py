#!/usr/bin/env python
"""Round-4 packed-attention experiments, part 6.

(a) Forward part-by-part split at the production grid (where do
6.1 ms go when the matmul floor is ~2.8 ms?): strip the kernel piece
by piece, timing-only (outputs wrong for stripped variants):

  fwd-full    — production structure re-timed
  fwd-noexp   — skip exp2 (p = shifted scores cast)
  fwd-nomax   — skip the row max (shift by 0)
  fwd-nopv    — skip the PV matmul (emit raw p slice)
  fwd-sonly   — s matmul only, emit s slice

(b) Backward at whole-row BQ=N with the r-loop machinery REMOVED:
direct transposed-write of dkT/dvT (no f32 accumulator round trip),
dq written as one concatenated [N, 128] store:

  bwd-cur       — production (BQ=1024, accumulators)
  bwd-wholerow  — exact-checked direct variant

  python scripts/ab_attn_ablate6.py > /tmp/ab_ablate6.log 2>&1
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


def kern_fwd(q_ref, k_ref, v_ref, o_ref, lse_a_ref, lse_b_ref, *, mode):
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)
    outs, lses = [], []
    for qc, k, v in zip(da._heads2(qc2), da._heads2(k2), da._heads2(v2)):
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "sonly":
            outs.append(s[:, :64].astype(dt))
            lses.append(s[:, :1])
            continue
        if mode == "nomax":
            m = jnp.zeros((s.shape[0], 1), jnp.float32)
        else:
            m = s.max(axis=1, keepdims=True)
        if mode == "noexp":
            p = (s - m).astype(cd)
        else:
            p = jnp.exp2((s - m).astype(cd))
        if mode == "nopv":
            outs.append(p[:, :64].astype(dt))
            lses.append(m)
            continue
        o, l = da._pv_and_rowsum(p.astype(dt), v)
        outs.append((o / l).astype(dt))
        lses.append(m + jnp.log2(l))
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_a_ref[0, 0] = lses[0]
    lse_b_ref[0, 0] = lses[1]


def call_fwd(mode, q, k, v, bq=1024):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_shape = jax.ShapeDtypeStruct((b, hp, n, 1), jnp.float32)
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    return pl.pallas_call(
        functools.partial(kern_fwd, mode=mode),
        grid=(b, hp, n // bq),
        in_specs=[rowspec, fullspec, fullspec],
        out_specs=(rowspec, lse_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            lse_shape,
            lse_shape,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def kern_bwd_wholerow(q_ref, k_ref, v_ref, do_ref, o_ref,
                      lse_a_ref, lse_b_ref, dq_ref, dk_ref, dv_ref,
                      *, scale):
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (scale * da.LOG2E)).astype(dt)
    dqs = []
    for h, (qc, k, v, do, o, lse) in enumerate(zip(
        da._heads2(qc2), da._heads2(k2), da._heads2(v2),
        da._heads2(do2), da._heads2(o2), lses,
    )):
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2((s - lse).astype(cd))
        dvT = jax.lax.dot_general(
            do, p.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
            axis=1, keepdims=True
        )
        ds = (p * (dp - delta.astype(cd))).astype(dt)
        dqs.append((jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dt))
        dkT = jax.lax.dot_general(
            qc, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * da.LN2
        dk_ref[0, :, h * 64:(h + 1) * 64] = dkT.T.astype(dt)
        dv_ref[0, :, h * 64:(h + 1) * 64] = dvT.T.astype(dt)
    dq_ref[0] = jnp.concatenate(dqs, axis=1)


def call_bwd_wholerow(q, k, v, do, o, lse_a, lse_b):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j: (i, 0, j))
    lse_spec = pl.BlockSpec((1, 1, n, 1), lambda i, j: (i, j, 0, 0))
    shape = jax.ShapeDtypeStruct((b, n, hd), q.dtype)
    return pl.pallas_call(
        functools.partial(kern_bwd_wholerow, scale=SCALE),
        grid=(b, hp),
        in_specs=[fullspec] * 5 + [lse_spec, lse_spec],
        out_specs=(fullspec,) * 3,
        out_shape=(shape,) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
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

    for mode in ("full", "noexp", "nomax", "nopv", "sonly"):
        f = jax.jit(functools.partial(call_fwd, mode))
        timeit(f"fwd-{mode}", f, q, k, v)

    cur = jax.jit(lambda *a: da._call_bwd_packed(*a, SCALE, False))
    ref = cur(q, k, v, do, o, lse_a, lse_b)
    timeit("bwd-cur", cur, q, k, v, do, o, lse_a, lse_b)

    f = jax.jit(call_bwd_wholerow)
    got = f(q, k, v, do, o, lse_a, lse_b)
    for name, a, b_ in zip(("dq", "dk", "dv"), ref, got):
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))
        print(f"  bwd-wholerow {name}: max abs diff {err:.3e}", flush=True)
    timeit("bwd-wholerow", f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
