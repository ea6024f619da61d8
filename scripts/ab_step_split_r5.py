#!/usr/bin/env python
"""Round-5 SetVAE step work (VERDICT r4 item 1).

Part A — FRESH component split of the shipped bf16 scanned-multistep
step (52.1 ms at round-4 close): removal probes, each a K-step
lax.scan timed over several dispatches so the relay tax is amortized
exactly like production (train/loop.py routes set models through
make_scanned_multistep_train_step).

  base     production step, fused QKV off (round-4 configuration)
  fwd      loss forward only (no grad, no Adam)
  noadam   grads only (optimizer update removed)
  nocham   chamfer swapped for a pointwise MSE probe
  noattn   packed attention kernel swapped for identity-on-v

Part B — fused QKV in-projection A/B (ops/attention.py:_fused_qkv_on):
one [d, 3d] self-attention in-projection matmul vs three [d, d] Dense
calls, in-step at probe K and at the trainer-selected K=117.

  python scripts/ab_step_split_r5.py > /tmp/ab_step_split_r5.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 64, 2048
K_PROBE = 32
N_DISP = 4          # timed dispatches per trial
TRIALS = 4


def build_inputs(K, n_disp):
    rng_np = np.random.default_rng(1)
    n_pool = 2048
    X = jnp.asarray(rng_np.normal(size=(n_pool, N, 3)).astype(np.float32))
    idx = jnp.asarray(
        rng_np.integers(0, n_pool, size=(n_disp + 1, K, B)).astype(np.int32)
    )
    mk = jax.random.split(jax.random.PRNGKey(2), (n_disp + 1) * K)
    mk = mk.reshape(n_disp + 1, K, *mk.shape[1:])
    return X, idx, mk


def make_model():
    from vae_song_tpu.models import SetVAE

    return SetVAE(latent_channel=128, num_points=N, d_model=256,
                  num_heads=4, ff_dim=512, beta=0.001, mixed_precision=True)


def fresh_state(model):
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer

    x_host = np.random.default_rng(0).normal(size=(2, N, 3)).astype(np.float32)
    params, bs = init_model(model, x_host, seed=0)
    tx = make_optimizer(lr=1e-3)
    return TrainState.create(params, bs, tx), tx


def time_scan_step(tag, step, K, n_disp=N_DISP):
    """Compile + best-of-TRIALS ms/step for a (state, X, idx, wu, rngs,
    aug_keys) scan step."""
    model = make_model()
    state, _ = fresh_state(model)
    X, idx, mk = build_inputs(K, n_disp)
    zero = jnp.float32(0.0)

    t0 = time.time()
    state, m = step(state, X, idx[0], zero, mk[0], mk[0])
    _ = float(jax.tree.leaves(m)[0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)

    best = float("inf")
    for _t in range(TRIALS):
        t0 = time.time()
        for c in range(1, n_disp + 1):
            state, m = step(state, X, idx[c], zero, mk[c], mk[c])
        _ = float(jax.tree.leaves(m)[0])
        best = min(best, (time.time() - t0) / (n_disp * K))
    print(f"RESULT {tag}: {best*1000:.2f} ms/step", flush=True)
    return best * 1000


def production_step(K):
    from vae_song_tpu.train.state import make_optimizer
    from vae_song_tpu.train.steps import make_scanned_multistep_train_step

    model = make_model()
    tx = make_optimizer(lr=1e-3)
    return make_scanned_multistep_train_step(model, tx, K)


def fwd_only_step(K):
    """Loss forward only, scanned: the forward slice of the step."""
    import functools

    from vae_song_tpu.train.steps import make_grads_fn  # noqa: F401 (parity of imports)

    model = make_model()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, X, idx, wu_alpha, rngs, aug_keys):
        def body(st, per_step):
            ix, rng, _ak = per_step
            x = X[ix]
            k_sample, k_drop = jax.random.split(rng)
            outs, _mut = model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                x, L=1, train=True,
                rngs={"sampling": k_sample, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
            return st, {"loss": total}

        state, ms = jax.lax.scan(body, state, (idx, rngs, aug_keys))
        return state, {"loss": ms["loss"].mean()}

    return step


def grads_only_step(K):
    """Grads but no optimizer update: step minus Adam/params write."""
    import functools

    from vae_song_tpu.train.steps import make_grads_fn

    model = make_model()
    grads_fn = make_grads_fn(model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, X, idx, wu_alpha, rngs, aug_keys):
        def body(st, per_step):
            ix, rng, _ak = per_step
            grads, (total, *_rest) = grads_fn(
                st.params, st.batch_stats, X[ix], wu_alpha, rng
            )
            # keep every gradient leaf live without a param write —
            # emit the reduction as its own metric (a 0.0*gsum term
            # could be algebraically folded away, DCE'ing the backward)
            gsum = sum(g.sum() for g in jax.tree.leaves(grads))
            return st, {"loss": total, "gsum": gsum}

        state, ms = jax.lax.scan(body, state, (idx, rngs, aug_keys))
        return state, {"loss": ms["loss"].mean(), "gsum": ms["gsum"].mean()}

    return step


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}

    # ---- Part A: fresh split at probe K (fused OFF = round-4 config)
    os.environ["VST_FUSED_QKV"] = "0"
    results["base"] = time_scan_step("base", production_step(K_PROBE), K_PROBE)
    results["fwd"] = time_scan_step("fwd", fwd_only_step(K_PROBE), K_PROBE)
    results["noadam"] = time_scan_step("noadam", grads_only_step(K_PROBE), K_PROBE)

    import vae_song_tpu.models.setvae as setvae_mod
    real_chamfer = setvae_mod.best_chamfer
    setvae_mod.best_chamfer = lambda a, b: ((a - b) ** 2).mean()
    try:
        results["nocham"] = time_scan_step(
            "nocham", production_step(K_PROBE), K_PROBE)
    finally:
        setvae_mod.best_chamfer = real_chamfer

    import vae_song_tpu.ops.denseattn as da
    real_packed = da.dense_attention_packed
    da.dense_attention_packed = lambda q, k, v, scale: v
    try:
        results["noattn"] = time_scan_step(
            "noattn", production_step(K_PROBE), K_PROBE)
    finally:
        da.dense_attention_packed = real_packed

    # ---- Part B: fused QKV A/B
    os.environ["VST_FUSED_QKV"] = "1"
    results["fused"] = time_scan_step("fused", production_step(K_PROBE), K_PROBE)

    # confirm at the trainer-selected K (the bench headline configuration)
    os.environ["VST_FUSED_QKV"] = "0"
    results["base@117"] = time_scan_step(
        "base@117", production_step(117), 117, n_disp=2)
    os.environ["VST_FUSED_QKV"] = "1"
    results["fused@117"] = time_scan_step(
        "fused@117", production_step(117), 117, n_disp=2)

    print("\n==== summary (ms/step) ====")
    for k, v in results.items():
        print(f"  {k:10s} {v:7.2f}")
    base = results["base"]
    print("\n==== component split at base ====")
    print(f"  forward slice        {results['fwd']:.2f}")
    print(f"  backward slice       {results['noadam'] - results['fwd']:.2f}")
    print(f"  Adam/param write     {base - results['noadam']:.2f}")
    print(f"  chamfer fwd+bwd      {base - results['nocham']:.2f}")
    print(f"  attention fwd+bwd    {base - results['noattn']:.2f}")
    print(f"  fused QKV in-step    {base - results['fused']:+.2f} "
          f"({results['fused']:.2f} ms)")
    print(f"  fused QKV @K=117     {results['base@117'] - results['fused@117']:+.2f} "
          f"({results['fused@117']:.2f} ms)")


if __name__ == "__main__":
    main()
