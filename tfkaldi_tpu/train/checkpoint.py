"""Checkpointing via Orbax.

Replaces the reference's two-tier ``tf.train.Saver`` checkpoints (model
weights + 'train_variables'; trainer.py:443-486) with a single Orbax save
of the whole :class:`TrainState` pytree — params, Adam state, BN stats,
step, lr_fact — so resume is bit-exact.

Saves are asynchronous: Orbax stages device arrays to host synchronously
(safe against the training step's donated buffers) and commits to disk in
the background, so periodic ``check_freq`` checkpoints don't stall the
step loop. ``wait()`` (called before restores and at the end of training)
joins the in-flight write.
"""

from __future__ import annotations

import os
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

_lock = threading.Lock()
_ckptr: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _ckptr
    with _lock:
        if _ckptr is None:
            _ckptr = ocp.StandardCheckpointer()
        return _ckptr


def save_state(path: str, state: Any, block: bool = False) -> None:
    c = _checkpointer()
    c.save(os.path.abspath(path), state, force=True)
    if block:
        c.wait_until_finished()


def restore_state(path: str, template: Any) -> Any:
    c = _checkpointer()
    c.wait_until_finished()
    return c.restore(os.path.abspath(path), template)


def wait() -> None:
    """Join any in-flight asynchronous save."""
    c = _checkpointer()
    c.wait_until_finished()


def save_prior(path: str, prior: np.ndarray) -> None:
    np.save(path, prior)


def device_snapshot(state: Any) -> Any:
    """In-memory copy of a state pytree (used for the 'validated' rollback
    point so it survives donation of the live state)."""
    return jax.tree.map(lambda x: jax.numpy.array(x, copy=True), state)
