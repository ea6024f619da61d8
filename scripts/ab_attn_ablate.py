#!/usr/bin/env python
"""Ablate the packed attention backward op-by-op on the real chip to
locate the 10.4 ms: which ops carry the time vs the ~7 ms half-rate
matmul floor (D=64 halves MXU utilization on every one of the five
matmuls). Each variant strips or restructures one piece; deltas vs the
full kernel attribute the cost.

  python scripts/ab_attn_ablate.py > /tmp/ab_ablate.log 2>&1
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


def make_kernel(mode):
    def kern(q_ref, k_ref, v_ref, do_ref, o_ref, lse_a_ref, lse_b_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, nblocks):
        import jax.experimental.pallas as pl

        r = pl.program_id(2)
        q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
        do2, o2 = do_ref[0], o_ref[0]
        lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
        dt = q2.dtype
        cd = da._vpu_dtype(dt)
        qc2 = (q2.astype(jnp.float32) * (scale * da.LOG2E)).astype(dt)
        dqs, dks, dvs = [], [], []
        for qc, k, v, do, o, lse in zip(
            da._heads2(qc2), da._heads2(k2), da._heads2(v2),
            da._heads2(do2), da._heads2(o2), lses,
        ):
            s = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode == "noexp":
                p = (s - lse).astype(cd)          # strip the exp2
            else:
                p = jnp.exp2((s - lse).astype(cd))
            dvs.append(jax.lax.dot_general(
                p.astype(dt), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            if mode == "nodp":
                ds = p.astype(dt)                 # strip dp matmul + ds mul
            else:
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)
                delta = (do.astype(jnp.float32) * o.astype(jnp.float32)
                         ).sum(axis=1, keepdims=True)
                if mode == "nodsmul":
                    ds = dp.astype(dt)            # strip only the P*(...) mul
                else:
                    ds = (p * (dp - delta.astype(cd))).astype(dt)
            if mode == "nodq":
                dqs.append(qc * scale)            # strip the dq matmul
            else:
                dqs.append((jax.lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale).astype(dt))
            if mode == "nodk":
                dks.append(qc.astype(jnp.float32))
            else:
                dks.append(jax.lax.dot_general(
                    ds, qc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * da.LN2)
        dq_ref[0] = jnp.concatenate(dqs, axis=1)
        dk_new = jnp.concatenate(dks, axis=1)
        dv_new = jnp.concatenate(dvs, axis=1)

        @pl.when(r == 0)
        def _init():
            dk_acc[:] = dk_new
            dv_acc[:] = dv_new

        @pl.when(r > 0)
        def _acc():
            dk_acc[:] = dk_acc[:] + dk_new
            dv_acc[:] = dv_acc[:] + dv_new

        @pl.when(r == nblocks - 1)
        def _emit():
            dk_ref[0] = dk_acc[:].astype(dt)
            dv_ref[0] = dv_acc[:].astype(dt)

    return kern


def call(mode, q, k, v, do, o, lse_a, lse_b, bq=1024, semantics=None):
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
    return pl.pallas_call(
        functools.partial(make_kernel(mode), scale=SCALE, nblocks=nblocks),
        grid=(b, hp, nblocks),
        in_specs=[rowspec, fullspec, fullspec, rowspec, rowspec,
                  lse_spec, lse_spec],
        out_specs=(rowspec, fullspec, fullspec),
        out_shape=(shape,) * 3,
        scratch_shapes=[
            pltpu.VMEM((n, 128), jnp.float32),
            pltpu.VMEM((n, 128), jnp.float32),
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

    for mode in ("full", "noexp", "nodp", "nodsmul", "nodq", "nodk"):
        f = jax.jit(functools.partial(call, mode))
        timeit(f"ablate-{mode}", f, q, k, v, do, o, lse_a, lse_b)
    # grid-pipelining semantics + a smaller row block
    f = jax.jit(functools.partial(
        call, "full", semantics=("parallel", "parallel", "arbitrary")))
    timeit("full-parallel-sem", f, q, k, v, do, o, lse_a, lse_b)
    f = jax.jit(functools.partial(call, "full", bq=256))
    timeit("full-bq256", f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
