#!/usr/bin/env python
"""Standalone A/B: fused Pallas FFN (ops/ffn.py) vs the XLA two-Dense
composition at the set models' shapes (M = B*N = 131072, d=256, f=512,
bf16), fwd+bwd with weight grads, scanned K iterations per dispatch so
the relay tax amortizes like the production step.

  python scripts/ab_ffn.py > /tmp/ab_ffn.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, D, F = 64 * 2048, 256, 512
K = 32
N_DISP = 4
TRIALS = 4


def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, M, D)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(D, F)) * 0.05).astype(np.float32))
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray((rng.normal(size=(F, D)) * 0.05).astype(np.float32))
    b2 = jnp.zeros((D,), jnp.float32)
    return x, {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def make_step(kind):
    from vae_song_tpu.ops.ffn import fused_ffn

    def apply(params, xb):
        cd = jnp.bfloat16
        w1, b1 = params["w1"].astype(cd), params["b1"].astype(cd)
        w2, b2 = params["w2"].astype(cd), params["b2"].astype(cd)
        xb = xb.astype(cd)
        if kind == "fused":
            y = fused_ffn(xb, w1, b1, w2, b2)
        else:
            h = jnp.maximum(xb @ w1 + b1, 0)
            y = xb + h @ w2 + b2
        return (y.astype(jnp.float32) ** 2).mean()

    @jax.jit
    def step(params, x):
        def body(p, i):
            loss, grads = jax.value_and_grad(apply)(p, x[i % 8])
            p = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
            return p, loss
        params, losses = jax.lax.scan(body, params, jnp.arange(K))
        return params, losses.mean()

    return step


def run(kind):
    x, params = inputs()
    step = make_step(kind)
    t0 = time.time()
    params, l = step(params, x)
    _ = float(l)
    print(f"{kind}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _c in range(N_DISP):
            params, l = step(params, x)
        _ = float(l)
        best = min(best, (time.time() - t0) / (N_DISP * K))
    print(f"RESULT {kind}: {best*1000:.3f} ms/iter", flush=True)
    return best * 1000


def main():
    print("devices:", jax.devices(), flush=True)
    import vae_song_tpu.ops.ffn as ffn_mod
    r = {}
    r["xla"] = run("xla")
    for bm in (2048, 4096, 8192):
        ffn_mod.BLOCK_M = bm
        r[f"fused@{bm}"] = run("fused")
    print("\n==== summary (ms per fwd+bwd iter) ====")
    for k, v in r.items():
        print(f"  {k:12s} {v:7.3f}")




def run_fwd(kind):
    """Forward-only arm: the fused fwd never round-trips h1."""
    from vae_song_tpu.ops.ffn import fused_ffn
    x, params = inputs()

    def apply(params, xb):
        cd = jnp.bfloat16
        w1, b1 = params["w1"].astype(cd), params["b1"].astype(cd)
        w2, b2 = params["w2"].astype(cd), params["b2"].astype(cd)
        xb = xb.astype(cd)
        if kind == "fused":
            y = fused_ffn(xb, w1, b1, w2, b2)
        else:
            h = jnp.maximum(xb @ w1 + b1, 0)
            y = xb + h @ w2 + b2
        return (y.astype(jnp.float32) ** 2).mean()

    @jax.jit
    def step(params, x):
        def body(c, i):
            return c + apply(params, x[i % 8]), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return tot

    t0 = time.time()
    _ = float(step(params, x))
    print(f"{kind}-fwd: compile+first {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _c in range(N_DISP):
            l = step(params, x)
        _ = float(l)
        best = min(best, (time.time() - t0) / (N_DISP * K))
    print(f"RESULT {kind}-fwd: {best*1000:.3f} ms/iter", flush=True)
    return best * 1000


def main2():
    print("devices:", jax.devices(), flush=True)
    import vae_song_tpu.ops.ffn as ffn_mod
    r = {}
    for bm in (512, 1024):
        ffn_mod.BLOCK_M = bm
        r[f"fused@{bm}"] = run("fused")
    r["xla-fwd"] = run_fwd("xla")
    ffn_mod.BLOCK_M = 4096
    r["fused-fwd@4096"] = run_fwd("fused")
    ffn_mod.BLOCK_M = 1024
    r["fused-fwd@1024"] = run_fwd("fused")
    print("\n==== summary2 (ms/iter) ====")
    for k, v in r.items():
        print(f"  {k:16s} {v:7.3f}")


if __name__ == "__main__":
    main()
    main2()
