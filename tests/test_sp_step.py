"""Sequence-parallel training (parallel/sp.py): a full SetVAE/SetLRVAE
train step with the point axis sharded must reproduce the single-device
step — params, metrics, and the Chamfer loss itself."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vae_song_tpu.models import SetVAE, SetLRVAE
from vae_song_tpu.ops.chamfer import chamfer_distance, chamfer_sp
from vae_song_tpu.parallel.sp import (
    SEQ_AXIS,
    make_sp_mesh,
    shard_points,
    make_sp_train_step,
    make_sp_eval_step,
)
from vae_song_tpu.train.loop import init_model
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import make_train_step


def _tiny_model(cls, **kw):
    return cls(latent_channel=4, num_points=32, d_model=16, num_heads=2,
               num_encoder_layers=2, num_decoder_layers=2, ff_dim=32, beta=0.1, **kw)


def _clouds(b=4, n=32):
    return np.random.default_rng(0).normal(size=(b, n, 3)).astype(np.float32)


def test_chamfer_sp_matches_full():
    mesh = make_sp_mesh(n_data=1, n_seq=8)
    pred = jnp.asarray(_clouds(2, 64))
    gt = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 3)).astype(np.float32))
    full = chamfer_distance(pred, gt)

    def per_device(p, g):
        # shard-mean of the per-shard values = full-cloud Chamfer
        return jax.lax.pmean(chamfer_sp(p, g, SEQ_AXIS), SEQ_AXIS)

    got = jax.jit(
        jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
            out_specs=P(), check_vma=False,
        )
    )(pred, gt)
    np.testing.assert_allclose(float(got), float(full), rtol=1e-5)


@pytest.mark.parametrize("cls", [SetVAE, SetLRVAE])
def test_sp_step_matches_single_device(cls):
    """Pure-seq mesh (1 x 8): the data axis has one shard, so the rng
    fold_in matches the single-device step exactly and the SP step must
    produce the same metrics and GRADIENTS. SGD(lr=1) makes the param
    delta equal minus the gradient — Adam would amplify the float noise
    of mathematically-zero gradients (the attention key biases: softmax
    is invariant to a constant logit shift, so their true grad is 0 and
    both paths compute ~1e-6 noise against a ~10 gradient scale) into
    arbitrary sign flips."""
    import optax

    model = _tiny_model(cls)
    x = _clouds()
    tx = optax.sgd(1.0)
    rng0 = jax.random.PRNGKey(7)

    params, bs = init_model(model, x[:2], seed=0)
    params0 = jax.tree.map(np.asarray, params)  # host copy survives donation
    ref_step = make_train_step(model, tx)
    # the single-device step folds nothing; the SP step folds in
    # axis_index('data') == 0 — replicate that here for key equality
    ref_state, ref_metrics = ref_step(
        TrainState.create(params, bs, tx), jnp.asarray(x),
        jnp.float32(1.0), jax.random.fold_in(rng0, 0),
    )

    mesh = make_sp_mesh(n_data=1, n_seq=8)
    sp_step = make_sp_train_step(model, tx, mesh)
    # re-init: the reference step donates (deletes) its input state
    params, bs = init_model(model, x[:2], seed=0)
    state = jax.device_put(
        TrainState.create(params, bs, tx),
        jax.sharding.NamedSharding(mesh, P()),
    )
    xs = shard_points(jnp.asarray(x), mesh)
    sp_state, sp_metrics = sp_step(state, xs, jnp.float32(1.0), rng0)

    # bf16 attention matmuls reduce in different tile orders between the
    # sharded and unsharded programs — tolerances sized for that
    for k in ("loss", "recon", "reg", "lr"):
        np.testing.assert_allclose(
            float(sp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=1e-5
        )
    for p0, a, b in zip(
        jax.tree.leaves(params0),
        jax.tree.leaves(ref_state.params),
        jax.tree.leaves(sp_state.params),
    ):
        g_ref = p0 - np.asarray(a)  # = gradient under SGD(lr=1)
        g_sp = p0 - np.asarray(b)
        # bf16 noise is absolute at the scale of each leaf's LARGEST
        # gradient (matmul accumulations), so near-zero elements of a
        # large-scale leaf carry that absolute noise too
        atol = 3e-4 + 2e-3 * float(np.abs(g_ref).max())
        np.testing.assert_allclose(g_sp, g_ref, rtol=2e-2, atol=atol)


def test_sp_dp_combined_finite_and_decreasing():
    """2 x 4 mesh (data x seq): batch AND points sharded; two steps run
    and the loss stays finite (value differs from single-device because
    batch-shard rng decorrelation changes the sampled eps)."""
    model = _tiny_model(SetLRVAE)
    x = _clouds(b=4)
    params, bs = init_model(model, x[:2], seed=0)
    tx = make_optimizer(lr=1e-3)

    mesh = make_sp_mesh(n_data=2, n_seq=4)
    step = make_sp_train_step(model, tx, mesh)
    eval_step = make_sp_eval_step(model, mesh)
    state = jax.device_put(
        TrainState.create(params, bs, tx),
        jax.sharding.NamedSharding(mesh, P()),
    )
    xs = shard_points(jnp.asarray(x), mesh)
    state, m1 = step(state, xs, jnp.float32(1.0), jax.random.PRNGKey(0))
    state, m2 = step(state, xs, jnp.float32(1.0), jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    ev = eval_step(state, xs, jnp.float32(1.0), jax.random.PRNGKey(2))
    assert np.isfinite(float(ev["loss"]))


def test_sp_guards():
    mesh = make_sp_mesh(n_data=1, n_seq=8)
    tx = make_optimizer(lr=1e-3)
    with pytest.raises(NotImplementedError):
        make_sp_train_step(_tiny_model(SetVAE, use_attention=False), tx, mesh)
    with pytest.raises(ValueError):
        make_sp_train_step(_tiny_model(SetVAE, use_flash=True), tx, mesh)
    with pytest.raises(ValueError):
        # 30 points don't divide over 8 shards
        bad = SetVAE(latent_channel=4, num_points=30, d_model=16,
                     num_heads=2, ff_dim=32)
        make_sp_train_step(bad, tx, mesh)


def test_ring_attention_matches_full_attention():
    """ring_attention's online-softmax over rotating k/v chunks must
    equal full (unsharded) softmax attention exactly in f32."""
    from vae_song_tpu.ops.attention import ring_attention

    B, N, H, D = 2, 64, 2, 8
    n_seq = 8
    rng = np.random.default_rng(5)
    q = rng.normal(size=(B, N, H, D)).astype(np.float32)
    k = rng.normal(size=(B, N, H, D)).astype(np.float32)
    v = rng.normal(size=(B, N, H, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    # full softmax attention reference
    s = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = np.exp(s - s.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", w, v)

    mesh = make_sp_mesh(n_data=1, n_seq=n_seq)

    def per_device(qc, kc, vc):
        return ring_attention(qc, kc, vc, scale, SEQ_AXIS,
                              compute_dtype=jnp.float32)

    got = jax.jit(
        jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(None, SEQ_AXIS), P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
            out_specs=P(None, SEQ_AXIS), check_vma=False,
        )
    )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cls", [SetVAE, SetLRVAE])
def test_sp_ring_step_matches_allgather_step(cls):
    """The ring SP step must train identically to the all-gather SP
    step (same mesh, same keys): the attention math is the same, only
    the collective schedule differs. bf16-tolerance like the
    single-device comparison above."""
    import optax

    model = _tiny_model(cls)
    x = _clouds()
    tx = optax.sgd(1.0)
    rng0 = jax.random.PRNGKey(7)
    mesh = make_sp_mesh(n_data=1, n_seq=8)

    def run(ring):
        params, bs = init_model(model, x[:2], seed=0)
        state = jax.device_put(
            TrainState.create(params, bs, tx),
            jax.sharding.NamedSharding(mesh, P()),
        )
        step = make_sp_train_step(model, tx, mesh, ring=ring)
        st, m = step(state, shard_points(jnp.asarray(x), mesh),
                     jnp.float32(1.0), rng0)
        return jax.device_get(st.params), jax.device_get(m)

    p_ag, m_ag = run(ring=False)
    p_ring, m_ring = run(ring=True)
    for key in ("loss", "recon", "reg", "lr"):
        np.testing.assert_allclose(
            float(m_ring[key]), float(m_ag[key]), rtol=2e-3, atol=1e-5
        )
    # ring computes the softmax CHUNKED (per-hop bf16 p / pv matmuls +
    # online rescale) vs the all-gather's whole-row pass, so bf16
    # rounding differs between the two — and near-tie chamfer argmin
    # picks can flip DISCRETELY on that noise (the known bf16 chamfer
    # effect, ops/chamfer.py), legitimately moving a few gradient
    # elements. Bound the tail instead of every element; algorithmic
    # exactness (fwd AND bwd, 4e-7) is pinned in f32 by the two ring
    # tests above/below.
    total = bad = 0
    for a, b in zip(jax.tree.leaves(p_ag), jax.tree.leaves(p_ring)):
        a, b = np.asarray(a), np.asarray(b)
        viol = np.abs(b - a) > (1.5e-2 + 3e-2 * np.abs(a))
        total += a.size
        bad += int(viol.sum())
    assert bad <= max(2, total // 1000), (bad, total)


def test_ring_attention_gradients_match_full_attention():
    """Backward through the scan + ppermute ring must reproduce the
    full-attention q/k/v gradients exactly in f32 (the ppermute
    transpose is the inverse rotation; the online-softmax recurrence
    is algebraically the softmax)."""
    from vae_song_tpu.ops.attention import ring_attention

    B, N, H, D = 2, 64, 2, 8
    rng = np.random.default_rng(5)
    q = rng.normal(size=(B, N, H, D)).astype(np.float32)
    k = rng.normal(size=(B, N, H, D)).astype(np.float32)
    v = rng.normal(size=(B, N, H, D)).astype(np.float32)
    ct = rng.normal(size=(B, N, H, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    def full_loss(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        w = jax.nn.softmax(s, axis=-1)
        return (jnp.einsum("bhqk,bkhd->bqhd", w, v) * ct).sum()

    g_full = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)

    mesh = make_sp_mesh(1, 8)

    def ring_loss(q, k, v):
        def per(qc, kc, vc, cc):
            out = ring_attention(qc, kc, vc, scale, SEQ_AXIS,
                                 compute_dtype=jnp.float32)
            return jax.lax.psum((out * cc).sum(), SEQ_AXIS)

        f = jax.shard_map(
            per, mesh=mesh,
            in_specs=(P(None, SEQ_AXIS),) * 4,
            out_specs=P(), check_vma=False,
        )
        return f(q, k, v, ct)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(g_full, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_sp_local_kv_length_one_still_attends_globally():
    """Regression: with n_seq == num_points each device's LOCAL kv shard
    is length 1. The kv==1 value-broadcast shortcut in
    MultiHeadAttention must NOT fire under seq_axis (it would skip the
    cross-shard all-gather and attend to nothing but the local point) —
    the SP eval metrics must still match the single-device step."""
    model = SetVAE(latent_channel=4, num_points=8, d_model=16,
                   num_heads=2, num_encoder_layers=1,
                   num_decoder_layers=1, ff_dim=16, beta=0.1)
    x = _clouds(b=2, n=8)
    params, bs = init_model(model, x, seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)

    from vae_song_tpu.train.steps import make_eval_step

    ref = make_eval_step(model)(state, jnp.asarray(x), jnp.float32(1.0),
                                jax.random.fold_in(jax.random.PRNGKey(3), 0))

    mesh = make_sp_mesh(n_data=1, n_seq=8)
    state_sp = jax.device_put(
        TrainState.create(params, bs, tx),
        jax.sharding.NamedSharding(mesh, P()),
    )
    xs = shard_points(jnp.asarray(x), mesh)
    got = make_sp_eval_step(model, mesh)(
        state_sp, xs, jnp.float32(1.0), jax.random.PRNGKey(3)
    )
    for k in ("loss", "recon", "reg"):
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=2e-3, atol=1e-5,
            err_msg=k,
        )
