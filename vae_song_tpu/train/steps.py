"""Jitted train / eval steps, including the staged multi-term gradient.

The reference's staged backward (main.py:262-287) does, for LRVAE-like
models whose loss terms carry grad (model.py:616):

    1. loss_lr.backward(retain_graph=True)
    2. encoder .grad *= lambda (= 1e-4)
    3. loss_reg.backward(retain_graph=True)   # already beta-scaled
    4. loss_recon.backward()

so the final gradients are
    g_enc = lambda * dL_lr/d_enc + d(L_rec + L_reg)/d_enc
    g_dec =          dL_lr/d_dec + d(L_rec + L_reg)/d_dec

Here that is ONE forward (jax.vjp) + TWO cotangent pulls — strictly
cheaper than torch's one forward + three backwards — followed by the
per-subtree lambda scaling. Models whose aux terms are detached in the
reference (VanillaVAE model.py:553, SetVAE model.py:1084, LIDVAE
model.py:886, NaiveAE) fall through to a single composite gradient,
matching main.py:282-283.
"""

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from vae_song_tpu.train.state import TrainState

ENCODER_LR_LAMBDA = 1e-4  # main.py:269


def _scale_encoder_subtree(grads: dict, lam: float) -> dict:
    """Scale gradients of every parameter under the 'encoder' submodule."""
    out = {}
    for k, v in grads.items():
        if k == "encoder":
            out[k] = jax.tree.map(lambda g: g * lam, v)
        else:
            out[k] = v
    return out


def make_grads_fn(model, L: int = 1, grad_mode: str | None = None) -> Callable:
    """Gradient function for `model`:
    grads_fn(params, batch_stats, x, wu_alpha, rng)
      -> (grads, (total, rec, reg_s, lr_s, new_batch_stats)).

    Staged models (LRVAE) use one jax.vjp + two cotangent pulls; others
    a single composite jax.grad. Reused verbatim by the data-parallel
    shard_map step (parallel/mesh.py).

    `grad_mode` overrides the model's default — e.g. the lipschitz
    analysis CLI trains LRVAE with a plain composite backward
    (lipschitz.py:40-43), not the staged one.
    """
    staged = (grad_mode or getattr(model, "grad_mode", "composite")) == "staged"

    def forward_losses(params, batch_stats, x, wu_alpha, rng):
        from vae_song_tpu.ops import losses as loss_lib

        k_sample, k_drop = jax.random.split(rng)
        outs, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            L=L,
            train=True,
            rngs={"sampling": k_sample, "dropout": k_drop},
            mutable=["batch_stats"],
        )
        total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
        # the UNSCALED regularizer the reference stashes as last_kl_loss
        # (model.py:614, incl. the pwise mix) — beta-independent so
        # kl_adaptive warmup works even at beta=0
        mu, log_var = outs[1], outs[2]
        raw_kl = loss_lib.kl_divergence(mu, log_var)
        if getattr(model, "pwise_reg", False) and outs[3] is not None:
            raw_kl = loss_lib.pairwise_reg(raw_kl, outs[3])
        return total, rec, reg_s, lr_s, raw_kl, mut["batch_stats"]

    if staged:

        def grads_fn(params, batch_stats, x, wu_alpha, rng):
            def two_losses(p):
                total, rec, reg_s, lr_s, raw_kl, bs = forward_losses(p, batch_stats, x, wu_alpha, rng)
                return (rec + reg_s, lr_s), (total, rec, reg_s, lr_s, raw_kl, bs)

            _, vjp_fn, aux = jax.vjp(two_losses, params, has_aux=True)
            (g_main,) = vjp_fn((jnp.ones(()), jnp.zeros(())))
            (g_lr,) = vjp_fn((jnp.zeros(()), jnp.ones(())))
            g_lr = _scale_encoder_subtree(g_lr, ENCODER_LR_LAMBDA)
            grads = jax.tree.map(lambda a, b: a + b, g_main, g_lr)
            return grads, aux

    else:

        def grads_fn(params, batch_stats, x, wu_alpha, rng):
            def total_loss(p):
                total, rec, reg_s, lr_s, raw_kl, bs = forward_losses(p, batch_stats, x, wu_alpha, rng)
                return total, (total, rec, reg_s, lr_s, raw_kl, bs)

            grads, aux = jax.grad(total_loss, has_aux=True)(params)
            return grads, aux

    return grads_fn


def make_train_step(model, tx, L: int = 1, grad_mode: str | None = None) -> Callable:
    """Build a jitted train step for `model` with optimizer `tx`.

    step(state, x, wu_alpha, rng) -> (state, metrics_dict)
    """
    grads_fn = make_grads_fn(model, L, grad_mode)

    # donate the incoming state: params/opt_state buffers are dead after
    # the update, so XLA reuses them in place (halves HBM traffic on the
    # weight update)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, wu_alpha, rng):
        grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
            state.params, state.batch_stats, x, wu_alpha, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s, "raw_kl": raw_kl}
        return new_state, metrics

    return train_step


def make_accum_train_step(model, tx, n_micro: int, L: int = 1,
                          grad_mode: str | None = None) -> Callable:
    """Gradient accumulation: one optimizer step from `n_micro`
    sequential microbatches — train at batch sizes whose activations
    exceed HBM without touching the learning-rate recipe. The reference
    has no equivalent (greenfield, like the parallel layer).

    TPU-idiomatic: a `lax.scan` over the [n_micro, B/n_micro, ...]
    reshaped batch accumulates the MEAN of per-microbatch gradients in
    one XLA program, with activations alive for one microbatch at a
    time. Gradient convention matches the DP shard mean
    (parallel/mesh.py): exactly the full-batch gradient for batch-MEAN
    loss terms, and for the reference's batch-SUMMED latent-recon term
    it equals DP-with-n_micro-shards (the sum rescaled by 1/n_micro) —
    the same quirk DP training carries. BatchNorm stats update
    sequentially per microbatch (torch grad-accum semantics).

    step(state, x, wu_alpha, rng) -> (state, metrics); x's leading axis
    must divide by n_micro. Each microbatch folds its index into `rng`
    (the same decorrelation convention as the DP/EP shard steps) so all
    B latent eps draws are distinct — the step equals the full-batch
    step in distribution (i.i.d. sampling), and equals the explicit
    mean-of-microbatch-gradients EXACTLY (tests/test_train_steps.py).
    """
    grads_fn = make_grads_fn(model, L, grad_mode)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, wu_alpha, rng):
        xm = x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

        def body(carry, inp):
            xi, i = inp
            g_acc, bs, m_acc = carry
            grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
                state.params, bs, xi, wu_alpha, jax.random.fold_in(rng, i)
            )
            g_acc = jax.tree.map(
                lambda a, g: a + g / n_micro, g_acc, grads
            )
            m = jnp.stack([total, rec, reg_s, lr_s, raw_kl])
            return (g_acc, new_bs, m_acc + m / n_micro), None

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        (grads, new_bs, m), _ = jax.lax.scan(
            body,
            (g0, state.batch_stats, jnp.zeros(5, jnp.float32)),
            (xm, jnp.arange(n_micro, dtype=jnp.uint32)),
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": m[0], "recon": m[1], "reg": m[2], "lr": m[3],
                   "raw_kl": m[4]}
        return new_state, metrics

    return train_step


def pick_multistep_k(steps_per_epoch: int, is_set: bool) -> int:
    """The K the trainer uses for the multi-step dispatch path: the
    largest divisor of steps_per_epoch within the cap. Shared by
    train_and_test (train/loop.py) and bench.py so the benched
    configuration IS the shipped configuration.

    Cap 24 for dense models: throughput ~ 1/(step_ms + relay_ms/K)
    keeps growing past 16 (measured: K=6 77k, K=15 136k, K=24 171k
    samples/sec on the bench model) while compile cost grows ~7 s/step
    remote — 24 balances one-time compile vs steady state for
    100-epoch runs. Set models route through the lax.scan multistep
    (make_scanned_multistep_train_step — compile cost flat in K), so
    their cap is 128: on congested relays the per-dispatch tax reaches
    ~45 ms, so amortizing over the largest divisor of the epoch that
    keeps a couple of host metric fetches per epoch is free win (the
    ShapeNet config's 234 steps/epoch picks K=117 = 2 dispatches)."""
    k_hi = 128 if is_set else 24
    return max(
        (k for k in range(2, k_hi + 1) if steps_per_epoch % k == 0),
        default=1,
    )


def make_multistep_train_step(model, tx, n_steps: int, L: int = 1,
                              grad_mode: str | None = None,
                              augment=None) -> Callable:
    """K optimizer steps per dispatch, UNROLLED inside one jit program,
    gathering batches from a device-resident dataset by index.

    Rationale: on remote/tunneled TPU deployments each dispatch costs
    ~10-20 ms of relay latency while a conv-VAE step is ~1 ms of chip
    time; batching K steps amortizes the dispatch AND the H2D traffic
    (only a [K, B] int32 index array crosses the wire per call). The
    loop is a static Python unroll — NOT lax.scan/fori_loop — because
    convolution layouts inside loop carries de-optimize on TPU (~20x,
    see train/scan.py note); unrolled bodies keep XLA's preferred
    layouts. Augmentation (the pipeline's jitted key,x -> x callables)
    is fused into the same program.

    step(state, X, idx, wu_alpha, rngs, aug_keys) -> (state, metrics)
      X: [N, ...] full device-resident training array
      idx: [K, B] int32 batch indices; rngs/aug_keys: [K] PRNG keys
    Metrics are K-step means; raw_kl is the LAST step's (model.py:614
    last-batch semantics for kl_adaptive warmup).
    """
    grads_fn = make_grads_fn(model, L, grad_mode)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, X, idx, wu_alpha, rngs, aug_keys):
        acc = None
        for i in range(n_steps):
            x = X[idx[i]]
            if augment is not None:
                x = augment(aug_keys[i], x)
            grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
                state.params, state.batch_stats, x, wu_alpha, rngs[i]
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            state = state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
                step=state.step + 1,
            )
            m = {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}
            acc = m if acc is None else jax.tree.map(jnp.add, acc, m)
        metrics = {k: v / n_steps for k, v in acc.items()}
        metrics["raw_kl"] = raw_kl
        return state, metrics

    return multi_step


def make_scanned_multistep_train_step(model, tx, n_steps: int, L: int = 1,
                                      grad_mode: str | None = None,
                                      augment=None) -> Callable:
    """K optimizer steps per dispatch via lax.scan — the set-model
    variant of make_multistep_train_step.

    The unrolled multistep pays ~compile-time x K (it re-lowers the
    whole transformer K times), which caps set models at K<=4
    (pick_multistep_k). A lax.scan body compiles ONCE regardless of K,
    so set models can amortize the relay dispatch tax over K=16+ steps:
    measured on v5e at the ShapeNet config (B=64, N=2048, bf16), K=9
    scan: 69.8 ms/step wall vs 74.4 single-dispatch, compile 105 s
    (same as K=1). Conv models must NOT use this (conv-inside-scan
    de-optimizes ~20x on TPU, see train/scan.py note) — the Pallas
    attention/chamfer custom calls and Dense matmuls carry no such
    penalty (same per-step device time as unrolled, profiled).

    Same signature/semantics as make_multistep_train_step:
    step(state, X, idx, wu_alpha, rngs, aug_keys) -> (state, metrics),
    metrics are K-step means except raw_kl (last step's, model.py:614
    last-batch semantics for kl_adaptive warmup).
    """
    grads_fn = make_grads_fn(model, L, grad_mode)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, X, idx, wu_alpha, rngs, aug_keys):
        def body(st, per_step):
            ix, rng, ak = per_step
            x = X[ix]
            if augment is not None:
                x = augment(ak, x)
            grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
                st.params, st.batch_stats, x, wu_alpha, rng
            )
            updates, new_opt_state = tx.update(grads, st.opt_state, st.params)
            new_params = jax.tree.map(lambda p, u: p + u, st.params, updates)
            st = st.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
                step=st.step + 1,
            )
            return st, {"loss": total, "recon": rec, "reg": reg_s,
                        "lr": lr_s, "raw_kl": raw_kl}

        state, ms = jax.lax.scan(body, state, (idx, rngs, aug_keys))
        metrics = {k: v.mean() for k, v in ms.items() if k != "raw_kl"}
        metrics["raw_kl"] = ms["raw_kl"][-1]
        return state, metrics

    return multi_step


def make_eval_step(model, L: int = 1) -> Callable:
    """Eval step: running BN stats, no param mutation. Mirrors
    main.eval (main.py:91-172) loss accumulation semantics.

    Note: the reference calls `model(x)` in eval — i.e. WITH latent
    sampling and L=1 (main.py:103); we keep that.
    """

    @jax.jit
    def eval_step(state: TrainState, x, wu_alpha, rng):
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            rngs={"sampling": rng},
        )
        total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
        return {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}

    return eval_step


def make_scanned_eval_epoch(model) -> Callable:
    """Whole-eval-epoch-in-one-dispatch for SET models: lax.scan over a
    device-resident [nb, B, N, 3] test batch stack. Per-epoch eval paid
    one relay dispatch per test batch before (train/loop.py eval loop —
    ~0.6 s/epoch of pure relay tax at MNIST scale); this is the same
    amortization the scanned trainer already does for training. Set
    models carry no conv-in-scan penalty (train/scan.py note), so scan
    is the right body here; conv models take the unrolled chunk below.
    Metric semantics match the dispatched loop exactly: per-batch mean
    loss dicts, averaged over the nb full (drop_last) batches, with the
    identical per-batch key split (main.py:91-172 accumulation)."""

    def body(state, wu_alpha, x, k):
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            rngs={"sampling": k},
        )
        total, rec, reg_s, lr_s = model.loss(x, *outs, wu_alpha=wu_alpha)
        return {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}

    @jax.jit
    def eval_epoch(state: TrainState, xb, wu_alpha, rng):
        keys = jax.random.split(rng, xb.shape[0])
        _, ms = jax.lax.scan(
            lambda _c, inp: (None, body(state, wu_alpha, *inp)),
            None,
            (xb, keys),
        )
        return jax.tree.map(lambda v: v.mean(), ms)

    return eval_epoch


def make_unrolled_eval_chunk(model, k: int) -> Callable:
    """K eval batches per dispatch for CONV models, statically unrolled
    (conv inside lax.scan is ~20x slower on TPU — train/scan.py note;
    the same reason make_multistep_train_step unrolls). Takes a
    [K, B, ...] slice of the device-resident test stack plus its K keys
    and returns the mean metric dict over the K batches."""

    @jax.jit
    def eval_chunk(state: TrainState, xb, wu_alpha, keys):
        acc = None
        for i in range(k):
            outs = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                xb[i],
                train=False,
                rngs={"sampling": keys[i]},
            )
            total, rec, reg_s, lr_s = model.loss(
                xb[i], *outs, wu_alpha=wu_alpha
            )
            m = {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s}
            acc = m if acc is None else jax.tree.map(jnp.add, acc, m)
        return jax.tree.map(lambda v: v / k, acc)

    return eval_chunk


def make_apply_fns(model):
    """Jitted encode / decode / forward for analysis & generation."""

    @jax.jit
    def encode(state, x):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
            method="encode",
        )

    @jax.jit
    def decode(state, z):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            z,
            train=False,
            method="decode",
        )

    @functools.partial(jax.jit, static_argnames=("latent_rand_sampling",))
    def forward(state, x, rng, latent_rand_sampling=True):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            latent_rand_sampling=latent_rand_sampling,
            train=False,
            rngs={"sampling": rng},
        )

    return encode, decode, forward
