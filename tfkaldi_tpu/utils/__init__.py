"""Utilities: structured metrics, profiling, scoring, visualisation."""

from tfkaldi_tpu.utils.metrics import MetricsLogger
from tfkaldi_tpu.utils.profiling import StepTimer, trace_profile
from tfkaldi_tpu.utils.wer import WerResult, edit_distance, score_text_files

__all__ = [
    "MetricsLogger",
    "StepTimer",
    "trace_profile",
    "WerResult",
    "edit_distance",
    "score_text_files",
]
