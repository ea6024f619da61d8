#!/usr/bin/env python
"""Round-5 SetLRVAE step component split (follow-up to the new
setlrvae_ms_per_step bench row — the second set flagship had never been
decomposed).

Shipped config_shapenet_setlrvae.yaml shapes: B=16, N=2048, d_model 256,
2+2 layers, ff 512, latent 128, bf16, trainer-selected K=117 at 936
steps/epoch. The step is encode -> decode(stop_gradient(z)) ->
re-encode(recon) -> chamfer + beta*KL + alpha*wu*MSE(z, z_hat)
(model.py:1087-1114 semantics; one composed backward — the staged
LRVAE backward is the MLP family's path, set models compose).

Probes (each a K-step lax.scan, relay amortized like production):

  base        production scanned step (train/steps.py)
  fwd         loss forward only (no grad, no Adam)
  noadam      grads only (optimizer update removed)
  nocham      chamfer swapped for a pointwise MSE probe
  noattn      packed attention kernel swapped for identity-on-v
  setvae_b16  plain SetVAE, same arch/batch -> LR-pipeline overhead
              (re-encode fwd+bwd + latent MSE + detached-z decode delta)
  base@117    confirm at the trainer-selected K

  python scripts/ab_setlrvae_split_r5.py > /tmp/ab_setlrvae_split_r5.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 16, 2048
K_PROBE = 32
N_DISP = 4
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


def make_model(lr_variant=True):
    from vae_song_tpu.models import SetLRVAE, SetVAE

    cls = SetLRVAE if lr_variant else SetVAE
    kw = dict(latent_channel=128, num_points=N, d_model=256, num_heads=4,
              ff_dim=512, beta=0.2, mixed_precision=True)
    if lr_variant:
        kw["alpha"] = 0.1
    return cls(**kw)


def fresh_state(model):
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer

    x_host = np.random.default_rng(0).normal(size=(2, N, 3)).astype(np.float32)
    params, bs = init_model(model, x_host, seed=0)
    tx = make_optimizer(lr=1e-3)
    return TrainState.create(params, bs, tx), tx


def time_scan_step(tag, model, step, K, n_disp=N_DISP):
    state, _ = fresh_state(model)
    X, idx, mk = build_inputs(K, n_disp)
    # wu=1.0: trained steady state, the latent-recon term is live
    wu = jnp.float32(1.0)

    t0 = time.time()
    state, m = step(state, X, idx[0], wu, mk[0], mk[0])
    _ = float(jax.tree.leaves(m)[0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)

    best = float("inf")
    for _t in range(TRIALS):
        t0 = time.time()
        for c in range(1, n_disp + 1):
            state, m = step(state, X, idx[c], wu, mk[c], mk[c])
        _ = float(jax.tree.leaves(m)[0])
        best = min(best, (time.time() - t0) / (n_disp * K))
    print(f"RESULT {tag}: {best*1000:.2f} ms/step", flush=True)
    return best * 1000


def production_step(model, K):
    from vae_song_tpu.train.state import make_optimizer
    from vae_song_tpu.train.steps import make_scanned_multistep_train_step

    tx = make_optimizer(lr=1e-3)
    return make_scanned_multistep_train_step(model, tx, K)


def fwd_only_step(model):
    import functools

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
            total, *_rest = model.loss(x, *outs, wu_alpha=wu_alpha)
            return st, {"loss": total}

        state, ms = jax.lax.scan(body, state, (idx, rngs, aug_keys))
        return state, {"loss": ms["loss"].mean()}

    return step


def grads_only_step(model):
    import functools

    from vae_song_tpu.train.steps import make_grads_fn

    grads_fn = make_grads_fn(model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, X, idx, wu_alpha, rngs, aug_keys):
        def body(st, per_step):
            ix, rng, _ak = per_step
            grads, (total, *_rest) = grads_fn(
                st.params, st.batch_stats, X[ix], wu_alpha, rng
            )
            gsum = sum(g.sum() for g in jax.tree.leaves(grads))
            return st, {"loss": total, "gsum": gsum}

        state, ms = jax.lax.scan(body, state, (idx, rngs, aug_keys))
        return state, {"loss": ms["loss"].mean(), "gsum": ms["gsum"].mean()}

    return step


def main():
    print("devices:", jax.devices(), flush=True)
    os.environ["VST_FUSED_QKV"] = "0"
    results = {}

    lr = make_model()
    results["base"] = time_scan_step(
        "base", lr, production_step(lr, K_PROBE), K_PROBE)
    results["fwd"] = time_scan_step("fwd", lr, fwd_only_step(lr), K_PROBE)
    results["noadam"] = time_scan_step(
        "noadam", lr, grads_only_step(lr), K_PROBE)

    import vae_song_tpu.models.setvae as setvae_mod
    real_chamfer = setvae_mod.best_chamfer
    setvae_mod.best_chamfer = lambda a, b: ((a - b) ** 2).mean()
    try:
        m = make_model()
        results["nocham"] = time_scan_step(
            "nocham", m, production_step(m, K_PROBE), K_PROBE)
    finally:
        setvae_mod.best_chamfer = real_chamfer

    import vae_song_tpu.ops.denseattn as da
    real_packed = da.dense_attention_packed
    da.dense_attention_packed = lambda q, k, v, scale: v
    try:
        m = make_model()
        results["noattn"] = time_scan_step(
            "noattn", m, production_step(m, K_PROBE), K_PROBE)
    finally:
        da.dense_attention_packed = real_packed

    plain = make_model(lr_variant=False)
    results["setvae_b16"] = time_scan_step(
        "setvae_b16", plain, production_step(plain, K_PROBE), K_PROBE)

    results["base@117"] = time_scan_step(
        "base@117", lr, production_step(lr, 117), 117, n_disp=2)

    print("\n==== summary (ms/step) ====")
    for k, v in results.items():
        print(f"  {k:12s} {v:7.2f}")
    base = results["base"]
    print("\n==== component split at base ====")
    print(f"  forward slice        {results['fwd']:.2f}")
    print(f"  backward slice       {results['noadam'] - results['fwd']:.2f}")
    print(f"  Adam/param write     {base - results['noadam']:.2f}")
    print(f"  chamfer fwd+bwd      {base - results['nocham']:.2f}")
    print(f"  attention fwd+bwd    {base - results['noattn']:.2f}")
    print(f"  LR-pipeline overhead {base - results['setvae_b16']:.2f} "
          f"(vs plain SetVAE at B={B})")


if __name__ == "__main__":
    main()
