"""Fully on-device training via lax.scan — the TPU-idiomatic fast path.

The reference's training loops dispatch one optimizer step per Python
iteration (main.py:255-287, lipschitz.py:36-43). For datasets that fit
in HBM (every synthetic set, MNIST-class images, typical ShapeNet
splits) we instead compile the WHOLE training run into one XLA program:

    scan over epochs
      └ scan over steps: gather shuffled batch -> grads -> adam update

Per-epoch shuffling uses jax.random.permutation inside the scan; the
alpha-warmup schedule is precomputed as an [epochs] array (kl_adaptive,
which feeds back the running KL, is computed in-carry). A 1000-epoch
LR-VAE sweep cell collapses from ~40k kernel dispatches to one call.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu.ops.warmup import warmup_alpha
from vae_song_tpu.train.steps import make_grads_fn
from vae_song_tpu.train.state import TrainState


def precompute_alphas(epochs, wu_strat="linear", up_amount=None, start_epoch=0,
                      repeat_interval=10, initial_alpha=0.0):
    """[epochs] warmup-alpha array for the host-precomputable strategies.
    Returns None for kl_adaptive (must be computed in-carry)."""
    if wu_strat == "kl_adaptive":
        return None
    alpha = initial_alpha
    out = []
    for e in range(epochs):
        alpha = warmup_alpha(alpha, e, epochs, wu_strat, up_amount=up_amount,
                             start_epoch=start_epoch, repeat_interval=repeat_interval)
        out.append(alpha)
    return jnp.asarray(np.array(out, np.float32))


def make_scanned_trainer(model, tx, batch_size: int, epochs: int,
                         grad_mode: str | None = None, L: int = 1,
                         kl_adaptive: bool = False):
    """Returns fit(state, X, alphas, rng) -> (state, last_epoch_metrics),
    a single jitted program running the full training.

    X: [N, ...] device-resident dataset; alphas: [epochs] warmup array
    (ignored when kl_adaptive=True — then alpha_t = sigmoid(5 - KL_{t-1})).
    """
    grads_fn = make_grads_fn(model, L, grad_mode)

    @partial(jax.jit, donate_argnums=(0,))
    def fit(state: TrainState, X, alphas, rng):
        n = X.shape[0]
        steps = n // batch_size

        def epoch_body(carry, einputs):
            state, last_kl = carry
            epoch_key, alpha_e = einputs
            if kl_adaptive:
                wu_alpha = jax.nn.sigmoid(5.0 - last_kl)
            else:
                wu_alpha = alpha_e
            perm_key, step_key = jax.random.split(epoch_key)
            perm = jax.random.permutation(perm_key, n)[: steps * batch_size]
            perm = perm.reshape(steps, batch_size)
            step_keys = jax.random.split(step_key, steps)

            def step_body(state, sinputs):
                idx, key = sinputs
                x = jnp.take(X, idx, axis=0)
                grads, (total, rec, reg_s, lr_s, raw_kl, new_bs) = grads_fn(
                    state.params, state.batch_stats, x, wu_alpha, key
                )
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
                state = state.replace(
                    params=new_params, batch_stats=new_bs,
                    opt_state=new_opt, step=state.step + 1,
                )
                return state, {"loss": total, "recon": rec, "reg": reg_s, "lr": lr_s, "raw_kl": raw_kl}

            state, metrics = jax.lax.scan(step_body, state, (perm, step_keys))
            epoch_metrics = jax.tree.map(lambda v: v.mean(), metrics)
            # kl_adaptive keys off the LAST batch's raw (unscaled) KL —
            # the reference overwrites last_kl_loss every loss() call
            # (model.py:614); beta plays no role here
            epoch_metrics["last_raw_kl"] = metrics["raw_kl"][-1]
            new_last_kl = metrics["raw_kl"][-1]
            return (state, new_last_kl), epoch_metrics

        epoch_keys = jax.random.split(rng, epochs)
        if alphas is None:
            alphas = jnp.zeros((epochs,), jnp.float32)
        (state, _), per_epoch = jax.lax.scan(
            epoch_body, (state, jnp.float32(0.0)), (epoch_keys, alphas)
        )
        last = jax.tree.map(lambda v: v[-1], per_epoch)
        return state, last

    return fit
