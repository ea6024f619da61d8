"""Oracle tests importing the reference's own torch code (skipped when
/root/reference isn't mounted): warmup schedule trajectories and
chamfer gradients must match."""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, REFERENCE)
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from vae_song_tpu.ops.warmup import warmup_alpha  # noqa: E402
from vae_song_tpu.ops.chamfer import chamfer_distance  # noqa: E402


def _ref_lrvae():
    import model as ref_model

    return ref_model.LRVAE(
        dataset="pinwheel", hidden_channels=[4, 4],
        encoder_type="mlp", decoder_type="mlp",
    )


@pytest.mark.parametrize("strategy,kwargs", [
    ("linear", {}),
    ("linear", {"up_amount": 0.07}),
    ("exponential", {}),
    ("repeat_linear", {"repeat_interval": 7}),
])
def test_warmup_trajectories_match_reference(strategy, kwargs):
    m = _ref_lrvae()
    m.wu_alpha = 0.0
    ours = 0.0
    epochs = 25
    for e in range(epochs):
        m.warmup(epoch=e, max_epoch=epochs, wu_strat=strategy, **kwargs)
        ours = warmup_alpha(ours, e, epochs, strategy, **kwargs)
        assert ours == pytest.approx(m.wu_alpha, rel=1e-6), (strategy, e)


def test_kl_adaptive_matches_reference():
    m = _ref_lrvae()
    for kl in (0.0, 3.0, 5.0, 12.0):
        m.last_kl_loss = kl
        m.warmup(epoch=1, max_epoch=10, wu_strat="kl_adaptive")
        ours = warmup_alpha(0.0, 1, 10, "kl_adaptive", last_kl_loss=kl)
        assert ours == pytest.approx(m.wu_alpha, rel=1e-6)


def test_chamfer_gradients_match_reference():
    import model as ref_model

    rng = np.random.default_rng(5)
    a = rng.normal(size=(2, 20, 3)).astype(np.float32)
    b = rng.normal(size=(2, 24, 3)).astype(np.float32)

    ta = torch.tensor(a, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)
    ref = ref_model.chamfer_distance(ta, tb)
    ref.backward()

    ours_val = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    ga = jax.grad(lambda x: chamfer_distance(x, jnp.asarray(b)))(jnp.asarray(a))
    gb = jax.grad(lambda y: chamfer_distance(jnp.asarray(a), y))(jnp.asarray(b))

    assert ours_val == pytest.approx(float(ref), rel=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), rtol=1e-3, atol=1e-5)
