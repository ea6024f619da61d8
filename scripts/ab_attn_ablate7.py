#!/usr/bin/env python
"""Round-4 packed-attention experiments, part 7: forward block re-sweep.

FWD_BLOCK_Q=1024 was tuned before the base-2/LSE rework and before the
backward went whole-row. Re-time the production forward at BQ 1024 /
2048 (whole row) / 512, exact-checked.

  python scripts/ab_attn_ablate7.py > /tmp/ab_ablate7.log 2>&1
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


def call_fwd_bq(bq, q, k, v):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = q.shape
    hp = hd // 128
    rowspec = pl.BlockSpec((1, bq, 128), lambda i, j, r: (i, r, j))
    fullspec = pl.BlockSpec((1, n, 128), lambda i, j, r: (i, 0, j))
    lse_shape = jax.ShapeDtypeStruct((b, hp, n, 1), jnp.float32)
    lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda i, j, r: (i, j, r, 0))
    return pl.pallas_call(
        functools.partial(da._fwd_kernel_packed, scale=SCALE),
        grid=(b, hp, n // bq),
        in_specs=[rowspec, fullspec, fullspec],
        out_specs=(rowspec, lse_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            lse_shape,
            lse_shape,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
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

    ref = jax.jit(functools.partial(call_fwd_bq, 1024))(q, k, v)
    for bq in (1024, 2048, 512):
        f = jax.jit(functools.partial(call_fwd_bq, bq))
        got = f(q, k, v)
        for name, a, b_ in zip(("o", "lse_a", "lse_b"), ref, got):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
            print(f"  fwd-bq{bq} {name}: max abs diff {err:.3e}", flush=True)
        timeit(f"fwd-bq{bq}", f, q, k, v)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
