"""Warmup schedule parity with model.py:37-63."""

import math

import pytest

from vae_song_tpu.ops.warmup import warmup_alpha


def _simulate(strategy, epochs, **kw):
    """Run the stateful update loop exactly like the reference does
    (warmup called once per epoch starting at 0)."""
    alpha = 0.0
    history = []
    for e in range(epochs):
        alpha = warmup_alpha(alpha, e, epochs, strategy, **kw)
        history.append(alpha)
    return history


def test_linear_reaches_one_and_clips():
    h = _simulate("linear", 10)
    # step = 1/(10-0+1) = 1/11 each epoch
    assert h[0] == pytest.approx(1 / 11)
    assert h[4] == pytest.approx(5 / 11)
    assert max(h) <= 1.0


def test_linear_with_up_amount():
    h = _simulate("linear", 5, up_amount=0.5)
    assert h == pytest.approx([0.5, 1.0, 1.0, 1.0, 1.0])


def test_exponential_endpoints():
    epochs = 10
    h = _simulate("exponential", epochs)
    # at epoch 0: exp(0)-1 = 0; at epoch=max_epoch the formula hits 1.0
    assert h[0] == pytest.approx(0.0)
    x = (epochs - 1) * math.log(2) / epochs
    assert h[-1] == pytest.approx(math.exp(x) - 1.0)


def test_repeat_linear_cycles():
    h = _simulate("repeat_linear", 12, repeat_interval=4)
    assert h[:4] == pytest.approx([1.0, 0.5, 1 / 3, 0.25])
    assert h[4] == pytest.approx(1.0)


def test_kl_adaptive_sigmoid():
    a = warmup_alpha(0.0, 3, 10, "kl_adaptive", last_kl_loss=5.0)
    assert a == pytest.approx(0.5)
    a_low_kl = warmup_alpha(0.0, 3, 10, "kl_adaptive", last_kl_loss=0.0)
    assert a_low_kl > 0.99


def test_start_epoch_gates():
    a = warmup_alpha(0.3, 2, 10, "linear", start_epoch=5)
    assert a == 0.3
