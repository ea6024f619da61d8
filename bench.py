#!/usr/bin/env python
"""Headline benchmark: MNIST conv-VAE training throughput
(samples/sec/chip) on TPU vs. the torch-CPU reference.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

* value      — our jitted train-step throughput on the one real chip
               (VanillaVAE, conv encoder + MLP decoder, MNIST shapes,
               batch 256 — the reference's default model family,
               main.py:445-467 / complexity_benchmark.py:199-207).
* vs_baseline — value / (reference torch implementation on this host's
               CPU, same model family/shapes). The reference publishes
               no numbers (BASELINE.md), so the baseline is measured by
               importing the reference from /root/reference and timing
               its own training step. The measurement is cached in
               .bench_baseline.json.

All diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

BATCH = 256
BENCH_STEPS = 48
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
RESULT_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last_result.json")
REFERENCE_PATH = "/root/reference"
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip. MFU below is
# analytic-FLOPs / wall-clock / this peak; the conv-VAE step is tiny and
# dispatch-latency-bound (expected MFU << 1%), the B=64/N=2048 SetVAE
# attention step is the compute-bound entry. FLOPs come from XLA's own
# cost analysis of the compiled train step (fwd+bwd+optimizer), which
# excludes the Pallas chamfer custom call (~3 GFLOP, <1% of the step).
V5E_PEAK_FLOPS = 197e12


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _aot(jitted, *args):
    """AOT-compile once; return (compiled callable, analytic FLOPs from
    XLA's cost analysis of that same executable — no second compile)."""
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        flops = None
    return compiled, flops


def measure_tpu_throughput(mixed_precision=False, multistep_only=False):
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vae_song_tpu.models import VanillaVAE
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.steps import make_train_step
    from vae_song_tpu.train.loop import init_model

    arm = "bf16" if mixed_precision else "f32"
    model = VanillaVAE.for_dataset("mnist", encoder_type="conv", decoder_type="mlp",
                                   beta=1.0, mixed_precision=mixed_precision)
    rng = np.random.default_rng(0)
    x_host = rng.uniform(size=(BATCH, 28, 28, 1)).astype(np.float32)

    params, batch_stats = init_model(model, x_host, seed=0)
    tx = make_optimizer(lr=1e-2, total_steps=10_000)
    state = TrainState.create(params, batch_stats, tx)

    x = jnp.asarray(x_host)
    # precompute ALL per-step device constants: on tunneled TPUs every
    # synchronous tiny transfer/dispatch inside the loop costs ~10-20 ms
    keys = jax.random.split(jax.random.PRNGKey(0), BENCH_STEPS + 8)
    zero = jnp.float32(0.0)

    sps, flops = 0.0, None
    if not multistep_only:
        step = make_train_step(model, tx)
        t0 = time.time()
        step, flops = _aot(step, state, x, zero, keys[-1])
        state, m = step(state, x, zero, keys[-1])
        _ = float(m["loss"])
        log(f"compile+first step: {time.time()-t0:.1f}s on {jax.devices()[0]}")
        for i in range(4):
            state, m = step(state, x, zero, keys[-2 - i])
        _ = float(m["loss"])

        # IMPORTANT measurement note: on this tunneled backend,
        # block_until_ready() returns before chained work completes, so each
        # trial is closed by ACTUALLY FETCHING the final loss value (D2H of
        # real bytes cannot lie). Best-of-N smooths relay jitter.
        best = float("inf")
        for trial in range(5):
            t0 = time.time()
            for i in range(BENCH_STEPS):
                state, m = step(state, x, zero, keys[i])
            final_loss = float(m["loss"])
            dt = time.time() - t0
            log(f"trial {trial}: {BENCH_STEPS} steps in {dt:.3f}s (loss {final_loss:.3f})")
            best = min(best, dt)
        sps = BATCH * BENCH_STEPS / best
        log(f"tpu single-step path[{arm}]: {BENCH_STEPS} steps in {best:.3f}s -> {sps:.0f} samples/sec")

    # the multi-step path train_and_test actually uses for HBM-resident
    # datasets (K unrolled optimizer steps per dispatch, batches gathered
    # on device) — benched at the IDENTICAL configuration the trainer
    # selects for the MNIST config: 60000-sample dataset, 234
    # steps/epoch, K = pick_multistep_k(234) (train/loop.py picks the
    # same K through the same function)
    from vae_song_tpu.train.steps import make_multistep_train_step, pick_multistep_k

    n_train = 60_000
    steps_per_epoch = n_train // BATCH            # 234, as in the MNIST config
    K = pick_multistep_k(steps_per_epoch, is_set=False)
    bench_steps = (BENCH_STEPS // K + 1) * K       # whole dispatches
    n_disp = bench_steps // K
    log(f"multistep: trainer-selected K={K} for {steps_per_epoch} steps/epoch")
    mstep = make_multistep_train_step(model, tx, K)
    X = jnp.asarray(rng.uniform(size=(n_train, 28, 28, 1)).astype(np.float32))
    params2, bs2 = init_model(model, x_host, seed=0)
    state = TrainState.create(params2, bs2, tx)
    perm = rng.permutation(n_train)[: bench_steps * BATCH].astype(np.int32)
    idx = jnp.asarray(perm.reshape(n_disp, K, BATCH))
    mk = jax.random.split(jax.random.PRNGKey(1), (5 + 1) * n_disp * K)
    mkeys = mk.reshape((5 + 1, n_disp, K) + mk.shape[1:])
    t0 = time.time()
    state, m = mstep(state, X, idx[0], zero, mkeys[-1][0], mkeys[-1][0])
    _ = float(m["loss"])
    log(f"multistep K={K} compile+first dispatch: {time.time()-t0:.1f}s")
    # pre-dispatch the chunk slices: each indexing op is its own relay
    # dispatch, and the trainer hoists them out of its hot loop too
    # (train/loop.py multistep branch) — time only the mstep dispatches
    chunk_args = [
        [(idx[c], mkeys[trial][c]) for c in range(n_disp)] for trial in range(5)
    ]
    for trial in chunk_args:
        for cx, ck in trial:
            cx.block_until_ready()
    best_m = float("inf")
    for trial in range(5):
        t0 = time.time()
        for cx, ck in chunk_args[trial]:
            state, m = mstep(state, X, cx, zero, ck, ck)
        _ = float(m["loss"])  # close with a real D2H fetch
        best_m = min(best_m, time.time() - t0)
    sps_multi = BATCH * bench_steps / best_m
    log(f"tpu multistep path[{arm}]: {bench_steps} steps in {best_m:.3f}s -> {sps_multi:.0f} samples/sec")

    # ---- relay vs chip decomposition (VERDICT r4 item 5) ----
    # wall_per_dispatch(K) = K * chip_ms + relay_ms, so a second arm at
    # a smaller K gives both unknowns: chip-only step time (what the
    # chip actually spends, for an honest MFU) and the per-dispatch
    # relay tax (which the K=cap wall-MFU silently amortizes).
    K2 = 9  # divisor of 234, half the structure of K=18
    mstep2 = make_multistep_train_step(model, tx, K2)
    n_disp2 = max(2, bench_steps // K2 // 2)
    idx2 = jnp.asarray(
        perm[: n_disp2 * K2 * BATCH].reshape(n_disp2, K2, BATCH)
    )
    mk2 = jax.random.split(jax.random.PRNGKey(3), n_disp2 * K2)
    mk2 = mk2.reshape(n_disp2, K2, *mk2.shape[1:])
    t0 = time.time()
    state, m = mstep2(state, X, idx2[0], zero, mk2[0], mk2[0])
    _ = float(m["loss"])
    log(f"multistep K={K2} decomposition arm compile+first: {time.time()-t0:.1f}s")
    best_m2 = float("inf")
    for trial in range(5):
        t0 = time.time()
        for c in range(n_disp2):
            state, m = mstep2(state, X, idx2[c], zero, mk2[c], mk2[c])
        _ = float(m["loss"])
        best_m2 = min(best_m2, (time.time() - t0) / n_disp2)
    disp_ms_k = best_m / n_disp * 1000            # wall per K-step dispatch
    disp_ms_k2 = best_m2 * 1000                   # wall per K2-step dispatch
    chip_ms = (disp_ms_k - disp_ms_k2) / (K - K2)
    relay_ms = disp_ms_k2 - K2 * chip_ms
    log(f"conv-VAE[{arm}] decomposition: chip {chip_ms:.3f} ms/step, "
        f"relay {relay_ms:.1f} ms/dispatch "
        f"(wall/dispatch {disp_ms_k:.1f} @K={K}, {disp_ms_k2:.1f} @K={K2})")

    if sps_multi > sps:
        value, wall, n_steps_timed = sps_multi, best_m, bench_steps
    else:
        value, wall, n_steps_timed = sps, best, BENCH_STEPS
    mfu = (flops * n_steps_timed / wall / V5E_PEAK_FLOPS) if flops else -1.0
    mfu_chip = (flops / (chip_ms / 1000) / V5E_PEAK_FLOPS) if flops and chip_ms > 0 else -1.0
    if flops:
        log(f"conv-VAE step: {flops/1e9:.2f} GFLOP -> wall MFU {mfu*100:.3f}%, "
            f"chip MFU {mfu_chip*100:.3f}% of 197 TFLOP/s bf16 peak")
    extras = {"chip_ms_per_step": chip_ms, "relay_ms_per_dispatch": relay_ms,
              "mfu_chip": mfu_chip}
    return value, mfu, extras


def measure_setvae_step(mixed_precision=False, use_flash=False,
                        multistep=False):
    """Compute-bound entry: SetVAE attention train step at the shipped
    ShapeNet config shapes (config_shapenet_setvae.yaml: B=64, N=2048,
    d_model=256, 4 heads, 2+2 layers, ff 512, latent 128).

    multistep=True times the path train_and_test actually selects for
    the ShapeNet config: the lax.scan multistep at
    K = pick_multistep_k(234 steps/epoch, is_set=True)
    (train/loop.py routes set models there; same program, same K)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vae_song_tpu.models import SetVAE
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.steps import make_train_step
    from vae_song_tpu.train.loop import init_model

    B, N = 64, 2048
    SHAPENET_STEPS_PER_EPOCH = 14976 // 64  # 234 (reference scale)
    model = SetVAE(latent_channel=128, num_points=N, d_model=256,
                   num_heads=4, ff_dim=512, beta=0.001,
                   mixed_precision=mixed_precision, use_flash=use_flash)
    x_host = np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)
    params, bs = init_model(model, x_host[:2], seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    step = make_train_step(model, tx)

    x = jnp.asarray(x_host)
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    zero = jnp.float32(0.0)

    t0 = time.time()
    flops = None
    if not use_flash and not multistep:
        # analytic FLOPs come from cost analysis of the pure-XLA
        # program (Pallas custom calls are counted as 0, and dense
        # attention is now the DEFAULT TPU path) — lower a throwaway
        # XLA-attention trace just for the numbers, then time the
        # default-path step
        import os as _os

        _prev = _os.environ.get("VST_DISABLE_DENSE_ATTN")
        _os.environ["VST_DISABLE_DENSE_ATTN"] = "1"
        try:
            from vae_song_tpu.train.steps import make_train_step as _mts

            _, flops = _aot(_mts(model, tx), state, x, zero, keys[-1])
        finally:
            # restore, don't delete: the user may have set the documented
            # numerics A/B opt-out deliberately for the timed step
            if _prev is None:
                del _os.environ["VST_DISABLE_DENSE_ATTN"]
            else:
                _os.environ["VST_DISABLE_DENSE_ATTN"] = _prev
    if multistep:
        from vae_song_tpu.train.steps import (
            make_scanned_multistep_train_step,
            pick_multistep_k,
        )

        K = pick_multistep_k(SHAPENET_STEPS_PER_EPOCH, is_set=True)
        log(f"setvae multistep: trainer-selected K={K} "
            f"for {SHAPENET_STEPS_PER_EPOCH} steps/epoch")
        mstep = make_scanned_multistep_train_step(model, tx, K)
        # resident pool smaller than the full split (gather cost per
        # step is identical; the full 368 MB upload is not the metric)
        n_pool = 2048
        rng_np = np.random.default_rng(1)
        X = jnp.asarray(rng_np.normal(size=(n_pool, N, 3)).astype(np.float32))
        n_disp = 6
        idx = jnp.asarray(
            rng_np.integers(0, n_pool, size=(n_disp, K, B)).astype(np.int32)
        )
        mk = jax.random.split(jax.random.PRNGKey(2), n_disp * K)
        mk = mk.reshape(n_disp, K, *mk.shape[1:])
        t0 = time.time()
        state, m = mstep(state, X, idx[0], zero, mk[0], mk[0])
        _ = float(m["loss"])
        log(f"setvae scanned multistep K={K} compile+first: {time.time()-t0:.1f}s")
        # pre-dispatch chunk slices (mirrors the trainer's hoisting)
        chunk_args = [(idx[c], mk[c]) for c in range(1, n_disp)]
        for cx, ck in chunk_args:
            cx.block_until_ready()
        best = float("inf")
        for trial in range(4):
            t0 = time.time()
            for cx, ck in chunk_args:
                state, m = mstep(state, X, cx, zero, ck, ck)
            _ = float(m["loss"])  # close with a real D2H fetch
            best = min(best, (time.time() - t0) / ((n_disp - 1) * K))
        ms = best * 1000
        tag = ("bf16" if mixed_precision else "f32") + "+multistep"
        log(f"setvae[{tag}] B={B} N={N} K={K}: {ms:.1f} ms/step")
        return ms, flops

    state, m = step(state, x, zero, keys[-1])
    _ = float(m["loss"])
    log(f"setvae compile+first step: {time.time()-t0:.1f}s")

    inner = 5
    best = float("inf")
    for trial in range(4):
        t0 = time.time()
        for i in range(inner):
            state, m = step(state, x, zero, keys[trial * inner + i])
        _ = float(m["loss"])  # close the measurement with a real D2H fetch
        best = min(best, time.time() - t0)
    ms = best / inner * 1000
    tag = ("bf16" if mixed_precision else "f32") + ("+fast" if use_flash else "+default")
    log(f"setvae[{tag}] B={B} N={N}: {ms:.1f} ms/step, "
        f"{(flops or 0)/1e12:.3f} TFLOP/step by cost analysis")
    return ms, flops


def measure_setlrvae_step():
    """SetLRVAE shipped-config row (VERDICT r4 item 4): the SECOND set
    flagship — decode from detached z + re-encode latent-recon pipeline
    (model.py:1087-1114) — at config_shapenet_setlrvae.yaml shapes
    (B=16, N=2048, d_model 256, 2+2 layers, ff 512, latent 128,
    mixed_precision: true, beta 0.2, alpha 0.1), timed on the scanned
    multistep path the trainer selects for its 936 steps/epoch
    (14976-shape ShapeNet at batch 16 -> K = pick_multistep_k = 117).
    Returns (ms_per_step, flops_per_step)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vae_song_tpu.models import SetLRVAE
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.steps import (
        make_scanned_multistep_train_step,
        make_train_step,
        pick_multistep_k,
    )
    from vae_song_tpu.train.loop import init_model

    B, N = 16, 2048
    steps_per_epoch = 14976 // B                   # 936 (reference scale)
    model = SetLRVAE(latent_channel=128, num_points=N, d_model=256,
                     num_heads=4, ff_dim=512, beta=0.2, alpha=0.1,
                     mixed_precision=True)
    x_host = np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)
    params, bs = init_model(model, x_host[:2], seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    # warmup at 1.0 so the latent-recon term is live (trained steady
    # state of the linear wu_strat)
    wu = jnp.float32(1.0)

    # analytic FLOPs: cost analysis of the XLA-attention trace (Pallas
    # custom calls count as 0; op counts are dtype-independent)
    _prev = os.environ.get("VST_DISABLE_DENSE_ATTN")
    os.environ["VST_DISABLE_DENSE_ATTN"] = "1"
    try:
        _, flops = _aot(
            make_train_step(model, tx), state, jnp.asarray(x_host), wu,
            jax.random.PRNGKey(9),
        )
    finally:
        if _prev is None:
            del os.environ["VST_DISABLE_DENSE_ATTN"]
        else:
            os.environ["VST_DISABLE_DENSE_ATTN"] = _prev

    K = pick_multistep_k(steps_per_epoch, is_set=True)
    log(f"setlrvae multistep: trainer-selected K={K} "
        f"for {steps_per_epoch} steps/epoch")
    mstep = make_scanned_multistep_train_step(model, tx, K)
    n_pool = 2048
    rng_np = np.random.default_rng(1)
    X = jnp.asarray(rng_np.normal(size=(n_pool, N, 3)).astype(np.float32))
    n_disp = 4
    idx = jnp.asarray(
        rng_np.integers(0, n_pool, size=(n_disp, K, B)).astype(np.int32)
    )
    mk = jax.random.split(jax.random.PRNGKey(2), n_disp * K)
    mk = mk.reshape(n_disp, K, *mk.shape[1:])
    t0 = time.time()
    state, m = mstep(state, X, idx[0], wu, mk[0], mk[0])
    _ = float(m["loss"])
    log(f"setlrvae scanned multistep K={K} compile+first: {time.time()-t0:.1f}s")
    best = float("inf")
    for trial in range(4):
        t0 = time.time()
        for c in range(1, n_disp):
            state, m = mstep(state, X, idx[c], wu, mk[c], mk[c])
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / ((n_disp - 1) * K))
    ms = best * 1000
    log(f"setlrvae[bf16+multistep] B={B} N={N} K={K}: {ms:.1f} ms/step")
    return ms, flops


def measure_generation():
    """Serving-path throughput: z ~ N(0, I) -> decode, the program
    cli/generate.py dispatches (test.py:113-140 equivalent). Times the
    conv-VAE image decoder (MNIST config, batch 1024) and the SetVAE
    attention set decoder (ShapeNet config, batch 64, bf16) —
    sampling-included, closed by a device-scalar fetch."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vae_song_tpu.models import VanillaVAE, SetVAE
    from vae_song_tpu.train.state import TrainState, make_optimizer
    from vae_song_tpu.train.loop import init_model

    results = {}
    tx = make_optimizer(lr=1e-3)

    # batches decoded per dispatch: one relay dispatch costs ~10-20 ms
    # on this tunneled backend — at ~5 ms/batch device time a
    # per-batch dispatch loop measures the RELAY, not the decoder
    # (generation readings swung 227k -> 143k samples/sec with relay
    # weather in round 4). Unrolling CHUNK decodes per jitted call is
    # the same program a throughput-serving deployment runs: keys are
    # precomputed, outputs reduced on device, fetched once.
    CHUNK = 8

    def time_decode(model, x_init, bs, z_dim, tag):
        params, bstats = init_model(model, x_init, seed=0)
        state = TrainState.create(params, bstats, tx)

        def decode_one(state, key):
            z = jax.random.normal(key, (bs, z_dim))
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                z, train=False, method="decode",
            )
            return out.astype(jnp.float32).sum()

        def decode_chunk(state, keys):     # [CHUNK, 2] keys, unrolled
            s = jnp.float32(0.0)
            for i in range(CHUNK):
                s = s + decode_one(state, keys[i])
            return s

        keys = jax.random.split(jax.random.PRNGKey(7), 64 * CHUNK)
        kchunks = keys.reshape(64, CHUNK, -1)
        t0 = time.time()
        compiled, _ = _aot(jax.jit(decode_chunk), state, kchunks[0])
        _ = float(compiled(state, kchunks[0]))
        log(f"{tag} decode compile+first: {time.time()-t0:.1f}s")
        inner, best = 4, float("inf")
        for trial in range(4):
            t0 = time.time()
            s = None
            for i in range(inner):
                s = compiled(state, kchunks[trial * inner + i])
            _ = float(s)
            best = min(best, (time.time() - t0) / (inner * CHUNK))
        sps = bs / best
        log(f"{tag} generation: {sps:.0f} samples/sec "
            f"(batch {bs}, {CHUNK} batches/dispatch)")
        return sps

    conv = VanillaVAE.for_dataset("mnist", encoder_type="conv",
                                  decoder_type="conv", beta=1.0)
    x0 = np.zeros((2, 28, 28, 1), np.float32)
    results["generation_samples_per_sec"] = time_decode(
        conv, x0, 1024, conv.latent_channel, "conv-VAE")

    setvae = SetVAE(latent_channel=128, num_points=2048, d_model=256,
                    num_heads=4, ff_dim=512, beta=0.001,
                    mixed_precision=True)
    xs0 = np.zeros((2, 2048, 3), np.float32)
    results["setvae_generation_clouds_per_sec"] = time_decode(
        setvae, xs0, 64, 128, "setvae")
    return results


def _mfu(flops, ms):
    return (flops / (ms / 1000) / V5E_PEAK_FLOPS) if flops else -1.0


def measure_torch_baseline():
    """Time the reference's own VanillaVAE train step on CPU torch.
    Imported from /root/reference (measurement only — no code copied)."""
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cached = json.load(f)
            if cached.get("batch") != BATCH:
                log(
                    f"cached torch baseline batch {cached.get('batch')} != "
                    f"current BATCH {BATCH}; re-measuring"
                )
            else:
                log(f"using cached torch baseline: {cached['samples_per_sec']:.1f} samples/sec")
                return cached["samples_per_sec"]
        except Exception:
            pass
    try:
        import torch

        sys.path.insert(0, REFERENCE_PATH)
        import model as RefModel  # noqa: the reference's model.py

        torch.manual_seed(0)
        torch.set_num_threads(os.cpu_count() or 1)
        m = RefModel.VanillaVAE(
            beta=1.0, dataset="mnist", hidden_channels=None,
            encoder_type="conv", decoder_type="mlp",
            fixed_var=False, residual_connection=False,
        )
        opt = torch.optim.Adam(m.parameters(), lr=1e-2)
        x = torch.rand(BATCH, 1, 28, 28)
        steps = 4
        # warmup
        result = m(x, L=1)
        loss, *_ = m.loss(x, *result)
        opt.zero_grad(); loss.backward(); opt.step()
        t0 = time.time()
        for _ in range(steps):
            result = m(x, L=1)
            loss, *_ = m.loss(x, *result)
            opt.zero_grad(); loss.backward(); opt.step()
        dt = time.time() - t0
        sps = BATCH * steps / dt
        log(f"torch-cpu reference: {steps} steps in {dt:.3f}s -> {sps:.1f} samples/sec")
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"samples_per_sec": sps, "batch": BATCH, "host_cpus": os.cpu_count()}, f)
        return sps
    except Exception as e:  # reference unavailable -> no ratio
        log(f"torch baseline unavailable: {e}")
        return None


def wait_for_backend() -> bool:
    """The tunneled TPU relay has transient outages (observed: hours).
    A hung backend init cannot be timed out in-process, so probe it in
    a SUBPROCESS and wait out short outages instead of recording a
    bogus failure. Bounded by VST_BENCH_WAIT_TPU_S (default 30 min,
    0 disables the wait AND the stale fallback). Returns True when the
    backend answered (or waiting is disabled), False when the probe was
    still failing at the deadline — main() then replays the cached last
    good result marked stale instead of hanging in backend init."""
    import subprocess

    budget = float(os.environ.get("VST_BENCH_WAIT_TPU_S", 1800))
    if budget <= 0:
        return True
    deadline = time.time() + budget
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 8)); "
             "assert float((x @ x).sum()) == 512.0")
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            log("backend probe still failing at deadline; proceeding")
            return False
        log("backend unavailable; retrying in 60s")
        time.sleep(60)


def main():
    backend_ok = wait_for_backend()
    if not backend_ok and os.path.exists(RESULT_CACHE):
        # STALE FALLBACK — only when the backend probe itself failed
        # (relay outages here last hours, and an in-process backend init
        # against a dead relay HANGS rather than raising): replay the
        # last GOOD result, explicitly marked, rather than record
        # nothing. A measurement failure on a HEALTHY backend is a real
        # regression and still crashes loudly — old numbers never paper
        # over it.
        with open(RESULT_CACHE) as f:
            cached = json.load(f)
        cached["stale"] = True
        cached["stale_reason"] = (
            "TPU relay unreachable through the wait budget "
            f"(VST_BENCH_WAIT_TPU_S); replaying the last good result"
        )
        log("backend down; replaying cached result marked stale")
        print(json.dumps(cached))
        return
    result = measure_all()
    with open(RESULT_CACHE, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


def measure_all() -> dict:
    value, mfu, conv_dec = measure_tpu_throughput()
    # conv-VAE mixed_precision A/B (VERDICT r3 #5): the flag exists on
    # the model (models/flexible.py); measure whether bf16 conv moves
    # the multistep headline before deciding what the MNIST config
    # ships. The f32 arm above stays the headline while the shipped
    # config_mnist.yaml is f32. The A/B is judged on CHIP time (the
    # wall ratio is dispatch-diluted — VERDICT r4 item 5).
    value_bf16, _, conv_dec_bf16 = measure_tpu_throughput(
        mixed_precision=True, multistep_only=True)
    log(f"conv-VAE multistep A/B: f32 {value:.0f} vs bf16 {value_bf16:.0f} "
        f"samples/sec ({value_bf16/value:.2f}x wall); chip "
        f"{conv_dec['chip_ms_per_step']:.3f} vs "
        f"{conv_dec_bf16['chip_ms_per_step']:.3f} ms/step")
    setvae_ms, setvae_flops = measure_setvae_step()
    fast_ms, _partial = measure_setvae_step(mixed_precision=True,
                                            multistep=True)
    setlrvae_ms, setlrvae_flops = measure_setlrvae_step()
    gen = measure_generation()
    baseline = measure_torch_baseline()
    vs = (value / baseline) if baseline else -1.0
    # the flash program's cost analysis omits the Pallas custom call's
    # FLOPs; the model FLOPs are identical, so use the XLA variant's
    return ({
        "metric": "mnist_conv_vae_train_throughput",
        "value": round(value, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2),
        "mfu": round(mfu, 5),
        # chip/relay decomposition of the conv multistep path (two-K
        # arm): chip-only step time, per-dispatch relay tax, chip MFU
        "conv_chip_ms_per_step": round(conv_dec["chip_ms_per_step"], 4),
        "conv_relay_ms_per_dispatch": round(conv_dec["relay_ms_per_dispatch"], 2),
        "mfu_chip": round(conv_dec["mfu_chip"], 5),
        "conv_bf16_samples_per_sec": round(value_bf16, 1),  # mixed_precision A/B arm (multistep path)
        "conv_bf16_chip_ms_per_step": round(conv_dec_bf16["chip_ms_per_step"], 4),
        "setvae_ms_per_step": round(setvae_ms, 1),       # f32 parity opt-out (mixed_precision: false), single-dispatch path
        "setvae_mfu": round(_mfu(setvae_flops, setvae_ms), 4),
        # SHIPPED-CONFIG row: config_shapenet_setvae.yaml ships
        # mixed_precision: true and the trainer routes set models
        # through the scanned multistep — this row times exactly that
        "setvae_fast_ms_per_step": round(fast_ms, 1),
        "setvae_fast_mfu": round(_mfu(setvae_flops, fast_ms), 4),
        # SECOND set flagship: config_shapenet_setlrvae.yaml verbatim
        # (B=16, double decode + re-encode, trainer-selected K)
        "setlrvae_ms_per_step": round(setlrvae_ms, 1),
        "setlrvae_mfu": round(_mfu(setlrvae_flops, setlrvae_ms), 4),
        "generation_samples_per_sec": round(gen["generation_samples_per_sec"], 1),       # serving path: z -> conv decode, batch 1024
        "setvae_generation_clouds_per_sec": round(gen["setvae_generation_clouds_per_sec"], 1),  # z -> set decode, N=2048, bf16
        "v5e_peak_tflops_bf16": 197,
    })


if __name__ == "__main__":
    main()
