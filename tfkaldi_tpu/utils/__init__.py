"""Utilities: structured metrics, profiling, logging."""

from tfkaldi_tpu.utils.metrics import MetricsLogger
from tfkaldi_tpu.utils.profiling import StepTimer, trace_profile

__all__ = ["MetricsLogger", "StepTimer", "trace_profile"]
