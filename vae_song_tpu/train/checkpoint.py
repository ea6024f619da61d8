"""Checkpointing: full pytree snapshots of (params, batch_stats,
opt_state, step, epoch, rng) — a strict superset of the reference's
final-epoch `torch.save(state_dict)` (main.py:307-310): we add periodic
saves and true mid-run resume, which the reference lacks
(SURVEY.md §5 checkpoint/resume)."""

import os
import pickle

import jax
import numpy as np
from flax import serialization

from vae_song_tpu.train.state import TrainState


def save_checkpoint(path, state: TrainState, epoch: int = 0, extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": serialization.to_bytes(state),
        "epoch": epoch,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path, template_state: TrainState):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template_state, payload["state"])
    return state, payload["epoch"], payload.get("extra", {})


def save_checkpoint_orbax(path, state: TrainState, epoch: int = 0):
    """Orbax-backed snapshot (directory-based, TPU-native layout).
    Optional alternative to the pickle format — same contents."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": state, "epoch": epoch}, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path, template_state: TrainState):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, {"state": template_state, "epoch": 0})
    return restored["state"], restored["epoch"]


def save_params_only(path, params, batch_stats=None):
    """State-dict-shaped export for parity tooling (test.py:162-163
    analogue): just the model variables, no optimizer."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": serialization.to_state_dict(params),
        "batch_stats": serialization.to_state_dict(batch_stats)
        if batch_stats is not None
        else None,
    }
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, payload), f)


def load_params_only(path, params_template, batch_stats_template=None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_state_dict(params_template, payload["params"])
    bs = None
    if batch_stats_template is not None and payload.get("batch_stats") is not None:
        bs = serialization.from_state_dict(batch_stats_template, payload["batch_stats"])
    return params, bs
