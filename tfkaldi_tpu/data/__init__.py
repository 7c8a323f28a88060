"""Data pipeline (layer L2): targets, dispensing, and device batching.

Equivalents of the reference's processing/feature_reader.py,
batchdispenser.py, target_coder.py and target_normalizers.py, re-designed
for static-shape TPU consumption: utterances are padded into
length-bucketed batches with frame masks instead of Python lists of
ragged matrices.
"""

from tfkaldi_tpu.data.target_coder import AlignmentCoder, TargetCoder, TextCoder
from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer, identity_normalizer
from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.data.dispenser import (
    AlignmentBatchDispenser,
    BatchDispenser,
    TextBatchDispenser,
)
from tfkaldi_tpu.data.batching import DeviceBatcher, PaddedBatch
from tfkaldi_tpu.data.sharding import shard_scp, shard_scp_lines

__all__ = [
    "shard_scp",
    "shard_scp_lines",
    "AlignmentCoder",
    "TargetCoder",
    "TextCoder",
    "aurora4_normalizer",
    "identity_normalizer",
    "FeatureReader",
    "AlignmentBatchDispenser",
    "BatchDispenser",
    "TextBatchDispenser",
    "DeviceBatcher",
    "PaddedBatch",
]
