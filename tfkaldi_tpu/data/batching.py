"""Static-shape padded batches for XLA.

The reference pads every utterance to the corpus-wide max length into fixed
placeholders (trainer.py:42-69, 279-307) and un-pads inside the graph with
gathers. On TPU we instead pad each batch to a *bucketed* length (next
multiple of ``bucket_multiple`` frames over the batch max), so shapes stay
static per bucket — a handful of compiles — while padding waste stays small;
losses mask padding frames instead of gathering them away.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PaddedBatch:
    """One device-ready batch.

    Attributes:
        inputs: ``[B, T_pad, F]`` float32, zero-padded.
        targets: ``[B, L_pad]`` int32, zero-padded.
        input_lengths: ``[B]`` int32 true frame counts.
        target_lengths: ``[B]`` int32 true target lengths.
    """

    inputs: np.ndarray
    targets: np.ndarray
    input_lengths: np.ndarray
    target_lengths: np.ndarray

    @property
    def num_frames(self) -> int:
        """Total real input frames (throughput accounting). For frame-level
        targets this equals the reference's frame-weighted loss divisor
        (trainer.py:130-133); for CTC the target lengths are label counts,
        so input lengths are the meaningful frame count either way."""
        return int(self.input_lengths.sum())


def round_up(value: int, multiple: int) -> int:
    return -(-int(value) // int(multiple)) * int(multiple)


class DeviceBatcher:
    """Pads ragged utterance lists into bucketed static-shape arrays."""

    def __init__(
        self,
        bucket_multiple: int = 128,
        fixed_input_length: int | None = None,
        fixed_target_length: int | None = None,
    ):
        """Args:
            bucket_multiple: pad batch time dims up to a multiple of this
                (bounds the number of distinct compiled shapes).
            fixed_input_length / fixed_target_length: pin the padded lengths
                (single compile, reference-style corpus-max padding).
        """
        self.bucket_multiple = int(bucket_multiple)
        self.fixed_input_length = fixed_input_length
        self.fixed_target_length = fixed_target_length

    def __call__(self, inputs, targets) -> PaddedBatch:
        input_lengths = np.asarray([x.shape[0] for x in inputs], dtype=np.int32)
        target_lengths = np.asarray([t.shape[0] for t in targets], dtype=np.int32)

        t_pad = self.fixed_input_length or round_up(
            input_lengths.max(initial=1), self.bucket_multiple
        )
        l_pad = self.fixed_target_length or round_up(
            target_lengths.max(initial=1), self.bucket_multiple
        )
        if input_lengths.max(initial=0) > t_pad or target_lengths.max(initial=0) > l_pad:
            raise ValueError("utterance longer than fixed padded length")

        feat_dim = inputs[0].shape[1]
        batch_in = np.zeros((len(inputs), t_pad, feat_dim), dtype=np.float32)
        batch_tgt = np.zeros((len(targets), l_pad), dtype=np.int32)
        for i, (x, t) in enumerate(zip(inputs, targets)):
            batch_in[i, : x.shape[0]] = x
            batch_tgt[i, : t.shape[0]] = t
        return PaddedBatch(batch_in, batch_tgt, input_lengths, target_lengths)

    def split_microbatches(self, batch: PaddedBatch, micro_size: int) -> list[PaddedBatch]:
        """Slice a batch into ``micro_size``-utterance microbatches for
        gradient accumulation (reference trainer.py:310-332). The batch
        size must divide evenly — the reference's filler arithmetic only
        worked in that case anyway (trainer.py:279-294)."""
        b = batch.inputs.shape[0]
        if b % micro_size != 0:
            raise ValueError(f"batch size {b} not divisible by microbatch {micro_size}")
        return [
            PaddedBatch(
                batch.inputs[i : i + micro_size],
                batch.targets[i : i + micro_size],
                batch.input_lengths[i : i + micro_size],
                batch.target_lengths[i : i + micro_size],
            )
            for i in range(0, b, micro_size)
        ]
