"""TensorBoard visualisation (the reference's ``visualise`` config knob).

The reference merges per-parameter histograms and a scalar loss summary
each step (trainer.py:207-211) into an event file under
``savedir/logdir`` (trainer.py:249-258). Here: scalar loss / learning-rate
factor / throughput per step, parameter histograms on validation
boundaries (histograms every step would stall the device pipeline for
little insight).

Event files are written by the self-contained
:mod:`tfkaldi_tpu.utils.tb_events` writer — no torch/TensorFlow
dependency, so ``visualise = True`` can never silently degrade to a no-op.
"""

from __future__ import annotations

import jax
import numpy as np

from tfkaldi_tpu.utils.tb_events import EventFileWriter


class TensorBoardVisualizer:
    """Step/parameter summaries compatible with tensorboard/xprof UIs."""

    def __init__(self, logdir: str):
        self._writer = EventFileWriter(logdir)

    # metrics_hook signature (train/controller.py)
    def __call__(self, *, step: int, loss: float, step_time: float, num_frames: int):
        self._writer.add_scalar("train/loss", loss, step)
        self._writer.add_scalar("train/step_time_s", step_time, step)
        self._writer.add_scalar("train/frames_per_sec", num_frames / max(step_time, 1e-9), step)

    def validation(self, step: int, loss: float) -> None:
        self._writer.add_scalar("valid/loss", loss, step)
        self._writer.flush()

    def params(self, step: int, params) -> None:
        """Per-parameter histograms (reference trainer.py:207-208)."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "params" + jax.tree_util.keystr(path)
            self._writer.add_histogram(name, np.asarray(leaf), step)

    def close(self) -> None:
        self._writer.close()
