"""Shared test-set streaming: FeatureReader → padded device-ready batches.

Both decode paths (likelihood emission, CTC transcription) consume the
test set the same way: read+CMVN+splice per utterance, pack into
bucket-padded batches, one device dispatch per batch (the reference ran
one utterance per ``session.run``, decoder.py:49-71). Utterances too short
to splice are skipped, mirroring training (batchdispenser.py:85-90).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from tfkaldi_tpu.data.batching import round_up
from tfkaldi_tpu.data.feature_reader import FeatureReader


def stream_padded_batches(
    reader: FeatureReader,
    *,
    batch_size: int,
    bucket_multiple: int = 128,
    pad_to_batch: bool = False,
) -> Iterator[tuple[list[str], np.ndarray, np.ndarray]]:
    """Yield ``(utt_ids, inputs [b, T_pad, F], lengths [b])`` batches.

    ``pad_to_batch`` pins b to ``batch_size`` (filler rows get length 1 and
    their outputs must be discarded) — required when the batch dim is
    sharded over a mesh and must stay divisible.
    """
    pending: list[tuple[str, np.ndarray]] = []

    def make():
        b = batch_size if pad_to_batch else len(pending)
        t_pad = round_up(max(u.shape[0] for _, u in pending), bucket_multiple)
        dim = pending[0][1].shape[1]
        inputs = np.zeros((b, t_pad, dim), np.float32)
        lengths = np.ones(b, np.int32)  # filler rows: length 1
        for i, (_, u) in enumerate(pending):
            inputs[i, : u.shape[0]] = u
            lengths[i] = u.shape[0]
        utt_ids = [u for u, _ in pending]
        pending.clear()
        return utt_ids, inputs, lengths

    while True:
        utt_id, utt_mat, looped = reader.get_utt()
        if looped:
            break
        if utt_mat is None:
            continue  # too short to splice
        pending.append((utt_id, utt_mat))
        if len(pending) >= batch_size:
            yield make()
    if pending:
        yield make()
