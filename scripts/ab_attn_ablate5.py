#!/usr/bin/env python
"""Round-4 packed-attention experiments, part 5.

The emitT backward (production since d1eaa38: dvT = dO^T P, dkT =
qc^T dS with [128, N] f32 accumulators) was only ever timed at
BWD_BLOCK_Q=1024. Block-size sweep:

  bwd-cur-1024  — production baseline
  bwd-2048      — whole-row: no r loop, no accumulator traffic, one
                  k/v relayout per (b, hp); VMEM ~46 MB, should fit
  bwd-512       — more double-buffering room

Forward: the remaining VPU passes are the f32 row max + f32 subtract
over [BQ, N]. Variant casts s to bf16 FIRST (one cast pass), then max
and subtract run at 2x VPU rate. The shift becomes the bf16-rounded
row max: exp2(s_bf16 - m_bf16) keeps a guaranteed entry within one
bf16 ulp of 1.0, so the normalizer l stays >= ~0.996 — the same
unconditional-safety argument as the exact max (no norm-bound slack).
Numerics: p changes by at most one bf16 ulp relative — same order as
the existing bf16 rounding of (s - m).

  fwd-cur       — production baseline
  fwd-bf16max   — cast-then-reduce

  python scripts/ab_attn_ablate5.py > /tmp/ab_ablate5.log 2>&1
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


def call_bwd_bq(bq, q, k, v, do, o, lse_a, lse_b):
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
            da._bwd_kernel_packed, scale=SCALE, nblocks=nblocks
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
            vmem_limit_bytes=120 * 1024 * 1024),
    )(q, k, v, do, o, lse_a, lse_b)


def kern_fwd_bf16max(q_ref, k_ref, v_ref, o_ref, lse_a_ref, lse_b_ref,
                     *, scale):
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (scale * da.LOG2E)).astype(dt)
    outs, lses = [], []
    for qc, k, v in zip(da._heads2(qc2), da._heads2(k2), da._heads2(v2)):
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = s.astype(cd)                       # one cast pass
        m = sc.max(axis=1, keepdims=True)       # bf16-rate max
        p = jnp.exp2(sc - m)                    # bf16-rate sub + exp2
        o, l = da._pv_and_rowsum(p.astype(dt), v)
        outs.append((o / l).astype(dt))
        # lse residual must stay f32-accurate for the backward: rebuild
        # from the f32-accumulated l and the bf16 m (exact in f32)
        lses.append(m.astype(jnp.float32) + jnp.log2(l))
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_a_ref[0, 0] = lses[0]
    lse_b_ref[0, 0] = lses[1]


def call_fwd_bf16max(q, k, v, bq=1024):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_shape = jax.ShapeDtypeStruct((b, hp, n, 1), jnp.float32)
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    return pl.pallas_call(
        functools.partial(kern_fwd_bf16max, scale=SCALE),
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
    timeit("fwd-cur", fwd, q, k, v)

    f2 = jax.jit(call_fwd_bf16max)
    o2, la2, lb2 = f2(q, k, v)
    err_o = float(jnp.max(jnp.abs(
        o.astype(jnp.float32) - o2.astype(jnp.float32))))
    err_l = float(jnp.max(jnp.abs(lse_a - la2)))
    print(f"  fwd-bf16max: o max abs diff {err_o:.3e}, "
          f"lse {err_l:.3e}", flush=True)
    timeit("fwd-bf16max", f2, q, k, v)

    cur = jax.jit(lambda *a: da._call_bwd_packed(*a, SCALE, False))
    ref = cur(q, k, v, do, o, lse_a, lse_b)
    timeit("bwd-cur-1024", cur, q, k, v, do, o, lse_a, lse_b)

    for bq in (2048, 512):
        f = jax.jit(functools.partial(call_bwd_bq, bq))
        got = f(q, k, v, do, o, lse_a, lse_b)
        for name, a, b_ in zip(("dq", "dk", "dv"), ref, got):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
            print(f"  bwd-{bq} {name}: max abs diff {err:.3e}", flush=True)
        timeit(f"bwd-{bq}", f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
