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

import json
import logging
import os
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)

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
    try:
        return c.restore(os.path.abspath(path), template)
    except (ValueError, KeyError) as e:
        migrated = _restore_legacy_no_rng(c, path, template)
        if migrated is None:
            raise
        log.warning(
            "restored pre-rng-schema checkpoint %s; backfilled the dropout "
            "rng from the template (draw sequence restarts, training "
            "semantics otherwise unchanged): %s", path, e,
        )
        return migrated


def _restore_legacy_no_rng(c, path: str, template: Any):
    """Checkpoints written before TrainState gained its ``rng`` leaf lack
    that entry; restore the old schema and inject the template's rng (the
    deterministic fold_in(PRNGKey(seed), 0x5EED) stream) so pre-existing
    runs stay resumable."""
    import dataclasses

    from tfkaldi_tpu.train.trainer import TrainState

    if not isinstance(template, TrainState):
        return None
    legacy = {
        f.name: getattr(template, f.name)
        for f in dataclasses.fields(template)
        if f.name != "rng"
    }
    try:
        restored = c.restore(os.path.abspath(path), legacy)
    except (ValueError, KeyError):
        return None
    return TrainState(**restored, rng=template.rng)


def wait() -> None:
    """Join any in-flight asynchronous save."""
    c = _checkpointer()
    c.wait_until_finished()


def save_prior(path: str, prior: np.ndarray) -> None:
    # atomic: readers (decode, possibly on another host of a pod sharing
    # the filesystem) must never observe a partially-written file
    tmp = path + ".tmp.npy"
    np.save(tmp, prior)
    os.replace(tmp, path)


def save_validated(path: str, state: Any, loss: float, step: int) -> None:
    """Persist the validation rollback point (the reference saves
    ``training/validated`` on every successful validation,
    nnet.py:148-149, 206-207). The loss/step sidecar is written only
    after the state commit completes, so a crash mid-save can never
    leave a meta file pointing at a partial state."""
    save_state(path, state, block=True)
    if jax.process_index() != 0:
        return  # multi-host: one writer for the sidecar (orbax handles the state)
    meta = {"loss": float(loss), "step": int(step)}
    tmp = path + ".meta.json.tmp"
    with open(tmp, "w") as fid:
        json.dump(meta, fid)
    os.replace(tmp, path + ".meta.json")


def load_validated_meta(path: str) -> dict | None:
    """Return the persisted rollback point's ``{"loss", "step"}`` sidecar,
    or None if no complete validated checkpoint exists."""
    meta_path = path + ".meta.json"
    if not (os.path.isdir(path) and os.path.isfile(meta_path)):
        return None
    with open(meta_path) as fid:
        return json.load(fid)


def device_snapshot(state: Any) -> Any:
    """In-memory copy of a state pytree (used for the 'validated' rollback
    point so it survives donation of the live state)."""
    return jax.tree.map(lambda x: jax.numpy.array(x, copy=True), state)


def average_params(params_list: list) -> Any:
    """Elementwise mean of N same-shaped parameter pytrees in f32
    (checkpoint averaging — the standard last-N smoothing applied to the
    decode model; optimizer state and BN statistics are NOT averaged,
    callers keep the latest)."""
    if not params_list:
        raise ValueError("average_params needs at least one pytree")
    n = float(len(params_list))

    def mean(*leaves):
        acc = leaves[0].astype(jax.numpy.float32)
        for leaf in leaves[1:]:
            acc = acc + leaf.astype(jax.numpy.float32)
        return (acc / n).astype(leaves[0].dtype)

    return jax.tree.map(mean, *params_list)
