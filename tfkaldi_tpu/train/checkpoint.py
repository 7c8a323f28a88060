"""Checkpointing via Orbax.

Replaces the reference's two-tier ``tf.train.Saver`` checkpoints (model
weights + 'train_variables'; trainer.py:443-486) with a single Orbax save
of the whole :class:`TrainState` pytree — params, Adam state, BN stats,
step, lr_fact — so resume is bit-exact.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_state(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_state(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def save_prior(path: str, prior: np.ndarray) -> None:
    np.save(path, prior)


def device_snapshot(state: Any) -> Any:
    """In-memory copy of a state pytree (used for the 'validated' rollback
    point so it survives donation of the live state)."""
    return jax.tree.map(lambda x: jax.numpy.array(x, copy=True), state)
