#!/usr/bin/env python
"""Chamfer kernel part-by-part ablation (VERDICT r4 stretch item):
where do the forward's ~5 ms go at B=64/N=2048? Strip the kernel piece
by piece (same BlockSpecs, same grid) and time each variant:

  full      — production kernel timing reference (minp/argp/ming/argg)
  noarg     — both mins, no argmins
  minp-only — d2 + pred-side min only (axis 2, lane reduction)
  ming-only — d2 + gt-side accumulated min only (axis 1, sublane red.)
  d2-only   — d2 materialized, emit d2[:, :, 0] (no reductions)

Also times the fwd+bwd pair before/after for the record.

  python scripts/ab_chamfer_parts.py > /tmp/ab_chamfer.log 2>&1
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vae_song_tpu.ops import chamfer as ch

B, N = 64, 2048
TILE = 512
_BB = 8


def kern(pred_ref, gt_ref, minp_ref, argp_ref, ming_ref, argg_ref,
         *, mode):
    import jax.experimental.pallas as pl

    pred = pred_ref[:]
    gt = gt_ref[:]
    t = pred.shape[1]
    d2 = None
    for c in range(3):
        diff = pred[:, :, c][:, :, None] - gt[:, :, c][:, None, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff

    if mode == "d2":
        minp_ref[:] = d2[:, :, 0]
        argp_ref[:] = jnp.zeros(argp_ref.shape, jnp.int32)
        ming_ref[:] = jnp.zeros(ming_ref.shape, jnp.float32)
        argg_ref[:] = jnp.zeros(argg_ref.shape, jnp.int32)
        return

    j = pl.program_id(1)
    if mode in ("full", "noarg", "minp"):
        minp_ref[:] = d2.min(axis=2)
    else:
        minp_ref[:] = d2[:, :, 0]
    if mode == "full":
        argp_ref[:] = jnp.argmin(d2, axis=2).astype(jnp.int32)
    else:
        argp_ref[:] = jnp.zeros(argp_ref.shape, jnp.int32)

    if mode in ("full", "noarg", "ming"):
        local_min = d2.min(axis=1)
        if mode == "full":
            local_arg = (jnp.argmin(d2, axis=1) + j * t).astype(jnp.int32)
        else:
            local_arg = jnp.zeros_like(local_min, jnp.int32)

        @pl.when(j == 0)
        def _init():
            ming_ref[:] = local_min
            argg_ref[:] = local_arg

        @pl.when(j > 0)
        def _acc():
            prev = ming_ref[:]
            take_new = local_min < prev
            ming_ref[:] = jnp.where(take_new, local_min, prev)
            if mode == "full":
                argg_ref[:] = jnp.where(take_new, local_arg, argg_ref[:])
    else:
        ming_ref[:] = jnp.zeros(ming_ref.shape, jnp.float32)
        argg_ref[:] = jnp.zeros(argg_ref.shape, jnp.int32)


def call(mode, pred, gt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, np_, _ = pred.shape
    ng = gt.shape[1]
    return pl.pallas_call(
        functools.partial(kern, mode=mode),
        grid=(b // _BB, np_ // TILE),
        in_specs=[
            pl.BlockSpec((_BB, TILE, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((_BB, ng, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((_BB, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((_BB, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((_BB, ng), lambda i, j: (i, 0)),
            pl.BlockSpec((_BB, ng), lambda i, j: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, np_), jnp.int32),
            jax.ShapeDtypeStruct((b, ng), jnp.float32),
            jax.ShapeDtypeStruct((b, ng), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pred.astype(jnp.float32), gt.astype(jnp.float32))


def timeit(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(leaf.reshape(-1)[0]) if hasattr(leaf, "reshape") else float(leaf)
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    inner, best = 10, float("inf")
    for _t in range(4):
        t0 = time.time()
        for _i in range(inner):
            out = fn(*args)
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        _ = float(leaf.reshape(-1)[0]) if hasattr(leaf, "reshape") else float(leaf)
        best = min(best, (time.time() - t0) / inner)
    print(f"RESULT {tag}: {best*1000:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    fwd = jax.jit(lambda p, g: ch.chamfer_distance_pallas(p, g, 512))
    timeit("prod-fwd", fwd, pred, gt)

    vg = jax.jit(jax.value_and_grad(
        lambda p, g: ch.chamfer_distance_pallas(p, g, 512), argnums=(0, 1)))
    timeit("prod-fwd+bwd", lambda p, g: vg(p, g)[0], pred, gt)

    for mode in ("full", "noarg", "minp", "ming", "d2"):
        f = jax.jit(functools.partial(call, mode))
        timeit(f"parts-{mode}", f, pred, gt)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
