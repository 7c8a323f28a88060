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


def pick_stream(reader: FeatureReader):
    """Choose the native bulk stream when it is usable for this reader
    (native lib present, reader at the head of its scp), else the Python
    per-utterance stream. Both produce byte-identical batches."""
    from tfkaldi_tpu.io import native

    if native.available() and reader.reader.scp_position == 0:
        return stream_padded_batches_native
    return stream_padded_batches


def stream_padded_batches_native(
    reader: FeatureReader,
    *,
    batch_size: int,
    bucket_multiple: int = 128,
    pad_to_batch: bool = False,
) -> Iterator[tuple[list[str], np.ndarray, np.ndarray]]:
    """Native-backed twin of :func:`stream_padded_batches`: same yielded
    batches byte-for-byte, but each batch is one bulk C++ call
    (read + CMVN + splice fused, native/arkio.cpp) instead of per-utterance
    Python parsing. Requires :func:`tfkaldi_tpu.io.native.available`.

    Frame counts come from a cheap 15-byte header scan of the scp
    (io.ark.scan_scp_shapes), so padding is sized before any payload read.
    """
    from tfkaldi_tpu.io import native
    from tfkaldi_tpu.io.ark import scan_scp_shapes

    ark = reader.reader
    c = int(reader.context_width)
    min_frames = 2 * c + 1
    shapes = scan_scp_shapes(ark.scp_data)
    usable = [
        (utt, path, off, rows)
        for utt, (path, off), (rows, _cols) in zip(ark.utt_ids, ark.scp_data, shapes)
        if rows >= min_frames
    ]
    if not usable:
        return
    dim = shapes[0][1]

    if reader.reader_cmvn is not None:
        stats_of = {}

        def utt_stats(utt: str) -> np.ndarray:
            spk = reader.utt2spk[utt]
            s = stats_of.get(spk)
            if s is None:
                s = np.ascontiguousarray(reader.reader_cmvn.read_utt(spk), np.float32)
                stats_of[spk] = s
            return s
    else:
        ident = np.zeros((2, dim + 1), dtype=np.float32)
        ident[0, -1] = 1.0
        ident[1, :] = 1.0  # Σx² == count ⇒ var 1; (x-0)/1 is bit-exact

        def utt_stats(_utt: str) -> np.ndarray:
            return ident

    for start in range(0, len(usable), batch_size):
        group = usable[start : start + batch_size]
        b = batch_size if pad_to_batch else len(group)
        t_pad = round_up(max(rows for _, _, _, rows in group), bucket_multiple)
        inputs = np.zeros((b, t_pad, dim * (2 * c + 1)), np.float32)
        lengths = np.ones(b, np.int32)  # filler rows: length 1
        by_path: dict[str, list[int]] = {}
        for j, (_, path, _, _) in enumerate(group):
            by_path.setdefault(path, []).append(j)
        for path, js in by_path.items():
            offsets = np.asarray([group[j][2] for j in js], np.int64)
            stats = np.stack([utt_stats(group[j][0]) for j in js])
            feats, rows = native.read_cmvn_splice_batch(
                path, offsets, stats, c, t_pad, dim
            )
            inputs[js] = feats
            lengths[js] = rows
        yield [utt for utt, _, _, _ in group], inputs, lengths
