#!/usr/bin/env python
"""A/B the int8 serving path (serving/quant.py) against float decode on
the real chip: SetVAE attention decoder at the reference scale (B=64,
N=2048, bf16 compute) and the MLP decoder family.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_quant_serving.py
Prints float vs int8 clouds/sec plus the max relative output delta.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu.models import SetVAE
from vae_song_tpu.serving import quantize_dense_params
from vae_song_tpu.serving.quant import quantized_coverage
from vae_song_tpu.train.loop import init_model


def time_fn(fn, *args, trials=4, inner=10, tag=""):
    t0 = time.time()
    out = fn(*args)
    _ = float(out)
    print(f"{tag} compile+first: {time.time()-t0:.1f}s")
    best = float("inf")
    for _t in range(trials):
        t0 = time.time()
        s = None
        for _i in range(inner):
            s = fn(*args)
        _ = float(s)
        best = min(best, (time.time() - t0) / inner)
    return best


def run_ab(model, bs):
    params, bstats = init_model(model, np.zeros((2, 2048, 3), np.float32), seed=0)
    table = quantize_dense_params(params)
    covered, total = quantized_coverage(table, params)
    print(f"quantized {len(table)} dense layers, "
          f"{covered}/{total} kernel elements ({covered/total:.1%})")

    z = jax.random.normal(jax.random.PRNGKey(7), (bs, 128))

    @jax.jit
    def dec_f(params, z):
        out = model.apply({"params": params, "batch_stats": bstats}, z,
                          train=False, method="decode")
        return out.astype(jnp.float32).sum()

    from vae_song_tpu.serving.quant import _make_interceptor
    import flax.linen as nn

    @jax.jit
    def dec_q(table, params, z):
        with nn.intercept_methods(_make_interceptor(table)):
            out = model.apply({"params": params, "batch_stats": bstats}, z,
                              train=False, method="decode")
        return out.astype(jnp.float32).sum()

    # output delta (full tensors once, before timing)
    of = model.apply({"params": params, "batch_stats": bstats}, z,
                     train=False, method="decode")
    with nn.intercept_methods(_make_interceptor(table)):
        oq = model.apply({"params": params, "batch_stats": bstats}, z,
                         train=False, method="decode")
    rel = float(jnp.max(jnp.abs(of - oq)) / jnp.max(jnp.abs(of)))
    print(f"max relative output delta: {rel:.4f}")

    tf = time_fn(dec_f, params, z, tag="float decode")
    tq = time_fn(dec_q, table, params, z, tag="int8 decode")
    print(f"float: {tf*1e3:.2f} ms/batch = {bs/tf:.0f} clouds/sec")
    print(f"int8:  {tq*1e3:.2f} ms/batch = {bs/tq:.0f} clouds/sec "
          f"({tf/tq:.2f}x)")


def main():
    print("== reference scale (d_model 256, B=64, N=2048, bf16) ==")
    run_ab(SetVAE(latent_channel=128, num_points=2048, d_model=256,
                  num_heads=4, ff_dim=512, beta=0.001,
                  mixed_precision=True), bs=64)
    # where int8 targets: d_model >= 1024 puts the dense matmuls past
    # the v5e roofline knee (arithmetic intensity ~ F vs the 240
    # flops/byte bf16 ridge), so the MXU's 2x int8 rate can show
    print("== large-d serving scale (d_model 1024, B=64, N=2048) ==")
    run_ab(SetVAE(latent_channel=128, num_points=2048, d_model=1024,
                  num_heads=16, ff_dim=2048, beta=0.001,
                  mixed_precision=True), bs=64)


if __name__ == "__main__":
    main()
