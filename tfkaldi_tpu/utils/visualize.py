"""TensorBoard visualisation (the reference's ``visualise`` config knob).

The reference merges per-parameter histograms and a scalar loss summary
each step (trainer.py:207-211) into an event file under
``savedir/logdir`` (trainer.py:249-258). Here: scalar loss / learning-rate
factor / throughput per step, parameter histograms on validation
boundaries (histograms every step would stall the device pipeline for
little insight). Uses torch's pure-Python event writer; gated so missing
tensorboard support degrades to a no-op with a warning.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

log = logging.getLogger(__name__)


class TensorBoardVisualizer:
    """Step/parameter summaries compatible with tensorboard/xprof UIs."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception as e:  # pragma: no cover - env without tensorboard
            log.warning("tensorboard unavailable (%s); visualisation disabled", e)
            self._writer = None

    # metrics_hook signature (train/controller.py)
    def __call__(self, *, step: int, loss: float, step_time: float, num_frames: int):
        if self._writer is None:
            return
        self._writer.add_scalar("train/loss", loss, step)
        self._writer.add_scalar("train/step_time_s", step_time, step)
        self._writer.add_scalar("train/frames_per_sec", num_frames / max(step_time, 1e-9), step)

    def validation(self, step: int, loss: float) -> None:
        if self._writer is None:
            return
        self._writer.add_scalar("valid/loss", loss, step)

    def params(self, step: int, params) -> None:
        """Per-parameter histograms (reference trainer.py:207-208)."""
        if self._writer is None:
            return
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "params" + jax.tree_util.keystr(path)
            self._writer.add_histogram(name, np.asarray(leaf), step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
