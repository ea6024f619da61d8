#!/usr/bin/env python
"""Round-4 packed-attention experiments, part 3.

Part 2 found: computing dv/dk TRANSPOSED (do^T p, qc^T ds) drops the
backward 10.57 -> 9.27 ms (emitT, exact) because Mosaic no longer
relayouts the big [BQ, N] p/ds operands for the MXU. Remaining
suspects are the k/v relayouts: s = qc k^T and dp = do v^T contract
dim 1 of BOTH operands, so Mosaic transposes each [N, 64] k/v head to
[64, N] per (b, hp, r) grid cell — the same k transpose sits in the
forward. MXU-native orientation is lhs contract dim 1, rhs contract
dim 0. Variants (exact-checked against the current kernels):

  bwd-emitT    — part-2 winner, re-timed as baseline
  bwd-ktcache  — emitT + k2T/v2T computed ONCE per (b, hp) into VMEM
                 scratch at r == 0 and reused across row blocks; dq
                 keeps the original k (already native for contract
                 (1,0))
  bwd-alltpose — fully transposed data flow: sT = k qc^T, pT, dpT =
                 v do^T, dsT all [N, BQ] (lhs k/v native, only the
                 tiny [BQ,64] qc/do transpose); dv = pT do and
                 dk = dsT qc are then NATIVE [N,64] outputs (no
                 accumulator transpose at emit); dq via cached kT.
  fwd-current  — baseline
  fwd-ktcache  — k2T cached in scratch at r == 0
  fwd-ktin     — kT passed in pre-transposed (k only feeds s in the
                 forward); the jit wrapper pays the outside XLA
                 transpose

  python scripts/ab_attn_ablate3.py > /tmp/ab_ablate3.log 2>&1
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


def _headsT(x2):
    """Split a [128, N] two-head TRANSPOSED window into [64, N] halves."""
    return x2[:64], x2[64:]


# ---------------- backward variants ----------------

def kern_bwd(q_ref, k_ref, v_ref, do_ref, o_ref, lse_a_ref, lse_b_ref,
             dq_ref, dk_ref, dv_ref, dkT_acc, dvT_acc, kT_s, vT_s,
             *, nblocks, mode):
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)

    if mode == "ktcache":
        @pl.when(r == 0)
        def _cache():
            kT_s[:] = k2.T
            vT_s[:] = v2.T

    for h in range(2):
        qc = da._heads2(qc2)[h]
        k = da._heads2(k2)[h]
        v = da._heads2(v2)[h]
        do = da._heads2(do2)[h]
        o = da._heads2(o2)[h]
        lse = lses[h]
        if mode == "ktcache":
            kT = _headsT(kT_s[:])[h]
            vT = _headsT(vT_s[:])[h]
            s = jax.lax.dot_general(
                qc, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, vT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
        else:
            s = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
        p = jnp.exp2((s - lse).astype(cd))
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
            axis=1, keepdims=True
        )
        ds = (p * (dp - delta.astype(cd))).astype(dt)
        dq_ref[0, :, h * 64:(h + 1) * 64] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * SCALE).astype(dt)
        dvT = jax.lax.dot_general(
            do, p.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [64, N]
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
        dk_ref[0] = dkT_acc[:].T.astype(dt)
        dv_ref[0] = dvT_acc[:].T.astype(dt)


def kern_bwd_alltpose(q_ref, k_ref, v_ref, do_ref, o_ref,
                      lse_a_ref, lse_b_ref, dq_ref, dk_ref, dv_ref,
                      dk_acc, dv_acc, kT_s, _unused,
                      *, nblocks):
    """Fully transposed flow: all [*, N] big intermediates live as
    [N, BQ] (sT/pT/dpT/dsT), which makes EVERY big matmul operand
    MXU-native; only the tiny [BQ, 64] qc/do and the [BQ, 1] -> [1, BQ]
    row vectors relayout, plus one cached kT for dq."""
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    do2, o2 = do_ref[0], o_ref[0]
    lses = (lse_a_ref[0, 0], lse_b_ref[0, 0])
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)

    @pl.when(r == 0)
    def _cache():
        kT_s[:] = k2.T

    for h in range(2):
        qc = da._heads2(qc2)[h]
        k = da._heads2(k2)[h]
        v = da._heads2(v2)[h]
        do = da._heads2(do2)[h]
        o = da._heads2(o2)[h]
        kT = _headsT(kT_s[:])[h]
        lseT = lses[h].reshape(1, -1)            # [1, BQ] f32
        sT = jax.lax.dot_general(
            k, qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [N, BQ] (rhs qc tiny)
        pT = jnp.exp2((sT - lseT).astype(cd))
        dpT = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)                             # [N, BQ]
        deltaT = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
            axis=1, keepdims=True
        ).reshape(1, -1)                         # [1, BQ]
        dsT = (pT * (dpT - deltaT.astype(cd))).astype(dt)
        # native [N, 64] partials — contract the BQ dim directly
        dv_new = jax.lax.dot_general(
            pT.astype(dt), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_new = jax.lax.dot_general(
            dsT, qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * da.LN2
        # dqT = kT dsT would contract N (dim 1 of kT, dim 0 of dsT —
        # native) but emit [64, BQ]; emitting dq untransposed needs
        # dq = dsT^T k: lhs dsT contract dim 0 = relayout of the big
        # [N, BQ] — so compute dqT and transpose the SMALL result
        dqT = jax.lax.dot_general(
            kT, dsT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [64, BQ]
        dq_ref[0, :, h * 64:(h + 1) * 64] = (dqT.T * SCALE).astype(dt)

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


def call_bwd(mode, q, k, v, do, o, lse_a, lse_b, bq=1024):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    nblocks = n // bq
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    shape = jax.ShapeDtypeStruct((b, n, hd), q.dtype)
    if mode == "alltpose":
        kernel = functools.partial(kern_bwd_alltpose, nblocks=nblocks)
        acc_shape = (n, 128)
    else:
        kernel = functools.partial(kern_bwd, nblocks=nblocks, mode=mode)
        acc_shape = (128, n)
    return pl.pallas_call(
        kernel,
        grid=(b, hp, nblocks),
        in_specs=[rowspec, fullspec, fullspec, rowspec, rowspec,
                  lse_spec, lse_spec],
        out_specs=(rowspec, fullspec, fullspec),
        out_shape=(shape,) * 3,
        scratch_shapes=[
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM((128, n), q.dtype),
            pltpu.VMEM((128, n), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, do, o, lse_a, lse_b)


# ---------------- forward variants ----------------

def kern_fwd(q_ref, k_ref, v_ref, o_ref, lse_a_ref, lse_b_ref, kT_s,
             *, mode):
    import jax.experimental.pallas as pl

    r = pl.program_id(2)
    q2 = q_ref[0]
    v2 = v_ref[0]
    dt = q2.dtype
    cd = da._vpu_dtype(dt)
    qc2 = (q2.astype(jnp.float32) * (SCALE * da.LOG2E)).astype(dt)
    if mode == "ktin":
        kTs = _headsT(k_ref[0])
    elif mode == "ktcache":
        @pl.when(r == 0)
        def _cache():
            kT_s[:] = k_ref[0].T
        kTs = _headsT(kT_s[:])
    else:
        kTs = None
        ks = da._heads2(k_ref[0])
    outs, lses = [], []
    for h in range(2):
        qc = da._heads2(qc2)[h]
        v = da._heads2(v2)[h]
        if kTs is not None:
            s = jax.lax.dot_general(
                qc, kTs[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                qc, ks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(cd))
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
    tspec = pl.BlockSpec((1, 128, n), lambda i, j, r: (i, j, 0))
    lse_shape = jax.ShapeDtypeStruct((b, hp, n, 1), jnp.float32)
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    if mode == "ktin":
        k_in = tspec
        kk = jnp.transpose(k.reshape(b, n, hp, 128), (0, 2, 3, 1)).reshape(
            b, hd, n)
    else:
        k_in = fullspec
        kk = k
    return pl.pallas_call(
        functools.partial(kern_fwd, mode=mode),
        grid=(b, hp, n // bq),
        in_specs=[rowspec, k_in, fullspec],
        out_specs=(rowspec, lse_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            lse_shape,
            lse_shape,
        ),
        scratch_shapes=[pltpu.VMEM((128, n), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, kk, v)


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

    for mode in ("ktcache", "alltpose"):
        f = jax.jit(functools.partial(call_bwd, mode))
        got = f(q, k, v, do, o, lse_a, lse_b)
        for name, a, b_ in zip(("dq", "dk", "dv"), ref, got):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
            print(f"  bwd-{mode} {name}: max abs diff {err:.3e}", flush=True)
        timeit(f"bwd-{mode}", f, q, k, v, do, o, lse_a, lse_b)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
