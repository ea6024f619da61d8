#!/usr/bin/env python
"""Round-4 chamfer closeout: production fwd+bwd total at the set
shapes (VERDICT r3 item 8's <= 6 ms target), after the packed int32
min+argmin forward landed.

  python scripts/ab_chamfer_total.py > /tmp/ab_chamfer_total.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vae_song_tpu.ops.chamfer import best_chamfer

B, N = 64, 2048


def timeit(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    inner, best = 10, float("inf")
    for _t in range(4):
        t0 = time.time()
        for _i in range(inner):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.time() - t0) / inner)
    print(f"RESULT {tag}: {best*1000:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)

    fwd = jax.jit(lambda p, g: best_chamfer(p, g).sum())
    timeit("fwd", fwd, pred, gt)

    vg = jax.jit(jax.value_and_grad(lambda p, g: best_chamfer(p, g).sum()))
    timeit("fwd+bwd", vg, pred, gt)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
