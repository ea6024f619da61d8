"""Checkpointing: full pytree snapshots of (params, batch_stats,
opt_state, step, epoch, rng) — a strict superset of the reference's
final-epoch `torch.save(state_dict)` (main.py:307-310): we add periodic
saves and true mid-run resume, which the reference lacks
(SURVEY.md §5 checkpoint/resume)."""

import os
import pickle
import queue
import sys
import threading

import jax
import jax.numpy as jnp
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


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training.

    `submit()` snapshots the state with an ON-DEVICE copy (a
    non-blocking dispatch — the caller's next train step donates its
    state buffers, so the worker cannot read the live tree) and a
    single worker thread performs the device→host fetch + serialize +
    atomic write. On a relay-tunneled TPU the fetch drains at
    ~30 MB/s, so a synchronous save stalls the step stream for seconds
    per checkpoint; async, the fetch overlaps the already-enqueued
    training dispatches.

    Saves complete in submission order. `wait()` blocks until the
    queue drains and re-raises the first worker error — call it before
    reading the files, resuming from them, or exiting. `submit()` never
    raises for a PRIOR write failure: a missing periodic snapshot must
    not abort the multi-hour training run it was meant to protect — it
    warns (once per error) and keeps submitting, since transient causes
    (full disk, fs hiccup) may clear.
    """

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._err: list[BaseException] = []
        self._warned = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, path, state: TrainState, epoch: int = 0,
               extra: dict | None = None) -> None:
        while self._warned < len(self._err):
            print(
                "WARNING: async checkpoint write failed: "
                f"{self._err[self._warned]!r} (training continues; that "
                "periodic snapshot is missing)",
                file=sys.stderr, flush=True,
            )
            self._warned += 1
        snap = jax.tree.map(jnp.copy, state)
        self._q.put((path, snap, epoch, extra))

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, snap, epoch, extra = item
                save_checkpoint(path, snap, epoch, extra=extra)
            except BaseException as e:  # surfaced on wait()/submit()
                self._err.append(e)
            finally:
                self._q.task_done()

    def wait(self) -> None:
        self._q.join()
        if self._err:
            raise self._err[0]

    def close(self) -> None:
        """Drain the queue and stop the worker UNCONDITIONALLY (the
        shutdown sentinel goes in before any error is re-raised, so a
        failed write never leaks the thread); then surface the first
        worker error. A crash that skips close() abandons queued writes
        — the worker is a daemon thread."""
        self._q.join()
        self._q.put(None)
        self._worker.join()
        if self._err:
            raise self._err[0]


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
