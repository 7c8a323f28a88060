"""Bulk batch loading through the native C++ ark reader.

A drop-in alternative to the per-utterance FeatureReader+BatchDispenser
path (the reference's data hot loop: ark seek/parse per utterance
processing/ark.py:59-94, numpy CMVN+splice processing/feature_reader.py:91-156,
batch assembly processing/batchdispenser.py:60-91): the whole batch
(read + CMVN + splice + padding) is produced by one native call
(native/arkio.cpp), so the Python data loop costs one ctypes call per
batch instead of ~size·(seek+parse+numpy) per utterance.

Keeps the dispenser cursor semantics (skip/return/split) by delegating to
an index over the scp order.
"""

from __future__ import annotations

import logging

import numpy as np

from tfkaldi_tpu.data.batching import PaddedBatch, round_up
from tfkaldi_tpu.io import ArkReader, read_utt2spk
from tfkaldi_tpu.io import native

log = logging.getLogger(__name__)


class BulkAlignmentBatchSource:
    """Native-backed batch source for frame-alignment training.

    Requires the native library; callers fall back to
    AlignmentBatchDispenser + DeviceBatcher when
    :func:`tfkaldi_tpu.io.native.available` is False.
    """

    def __init__(
        self,
        scpfile: str,
        cmvnfile: str,
        utt2spkfile: str,
        context_width: int,
        alignments: dict[str, np.ndarray],
        batch_size: int,
        bucket_multiple: int = 128,
        num_labels: int | None = None,
    ):
        """``num_labels``: total pdf classes — sizes the prior exactly like
        AlignmentBatchDispenser.compute_target_count (a label that never
        occurs in training must still get a prior slot, or the decoder's
        posterior/prior division shape-mismatches)."""
        if not native.available():
            raise RuntimeError("native arkio unavailable")
        self.reader = ArkReader(scpfile)
        cmvn_reader = ArkReader(cmvnfile)
        utt2spk = read_utt2spk(utt2spkfile)
        self.context_width = int(context_width)
        self.batch_size = int(batch_size)
        self.bucket_multiple = int(bucket_multiple)
        self.alignments = alignments
        self.num_labels = int(num_labels) if num_labels else None

        # usable utterances in scp order: have targets; frame counts read
        # from the alignments (frame-level targets ⇒ len == num frames)
        self._entries = []  # (utt_id, ark_path, offset, num_frames)
        for i, utt in enumerate(self.reader.utt_ids):
            ali = alignments.get(utt)
            if ali is None:
                log.warning("no targets for %s", utt)
                continue
            if len(ali) < 2 * self.context_width + 1:
                log.warning("%s is too short to splice", utt)
                continue
            path, offset = self.reader.scp_data[i]
            self._entries.append((utt, path, offset, len(ali)))
        self._cmvn = {
            spk: np.ascontiguousarray(cmvn_reader.read_utt(spk), dtype=np.float32)
            for spk in set(utt2spk.values())
        }
        cmvn_reader.close()
        self._utt2spk = utt2spk
        self.cursor = 0
        self.feat_dim = int(next(iter(self._cmvn.values())).shape[1]) - 1

    # -- cursor semantics -------------------------------------------------

    @property
    def num_utt(self) -> int:
        return len(self._entries)

    @property
    def num_batches(self) -> float:
        return self.num_utt / self.batch_size

    def split(self) -> None:
        self._entries = self._entries[self.cursor :]
        self.cursor = 0

    def skip_batch(self) -> None:
        self.cursor = (self.cursor + self.batch_size) % max(self.num_utt, 1)

    def return_batch(self) -> None:
        self.cursor = (self.cursor - self.batch_size) % max(self.num_utt, 1)

    # -- batches ----------------------------------------------------------

    def get_batch(self) -> PaddedBatch:
        n = self.batch_size
        idx = [(self.cursor + j) % self.num_utt for j in range(n)]
        self.cursor = (self.cursor + n) % self.num_utt
        entries = [self._entries[i] for i in idx]

        t_pad = round_up(max(e[3] for e in entries), self.bucket_multiple)

        # one native call per ark file in the batch (Kaldi data dirs split
        # feats across per-job arks feats.1.ark..feats.N.ark)
        by_path: dict[str, list[int]] = {}
        for j, e in enumerate(entries):
            by_path.setdefault(e[1], []).append(j)

        def read_group(path, js):
            offsets = np.asarray([entries[j][2] for j in js], dtype=np.int64)
            stats = np.stack([self._cmvn[self._utt2spk[entries[j][0]]] for j in js])
            return native.read_cmvn_splice_batch(
                path, offsets, stats, self.context_width, t_pad, self.feat_dim
            )

        if len(by_path) == 1:  # common case: zero-copy straight to the batch
            (path, js), = by_path.items()
            feats, rows = read_group(path, js)
        else:
            width = self.feat_dim * (2 * self.context_width + 1)
            feats = np.empty((n, t_pad, width), dtype=np.float32)
            rows = np.empty(n, dtype=np.int32)
            for path, js in by_path.items():
                group_feats, group_rows = read_group(path, js)
                feats[js] = group_feats
                rows[js] = group_rows
        if np.any(rows < 0):
            raise RuntimeError("unexpected too-short utterance in bulk batch")

        targets = np.zeros((n, t_pad), dtype=np.int32)
        lengths = np.asarray(rows, dtype=np.int32)
        for j, e in enumerate(entries):
            ali = self.alignments[e[0]]
            if len(ali) != rows[j]:
                raise ValueError(
                    f"alignment length {len(ali)} != {rows[j]} frames for {e[0]}"
                )
            targets[j, : len(ali)] = ali
        return PaddedBatch(feats, targets, lengths, lengths)

    def compute_target_count(self) -> np.ndarray:
        minlength = self.num_labels or (
            int(max(a.max() for a in self.alignments.values())) + 1
        )
        encoded = np.concatenate(list(self.alignments.values()))
        return np.bincount(encoded, minlength=minlength)
