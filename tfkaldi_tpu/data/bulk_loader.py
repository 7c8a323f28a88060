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


class _IdentityStats:
    """Maps every speaker to identity CMVN stats (the apply_cmvn=False path)."""

    def __init__(self, stats: np.ndarray):
        self._stats = stats

    def __getitem__(self, _spk: str) -> np.ndarray:
        return self._stats

    def values(self):
        return [self._stats]


class BulkAlignmentBatchSource:
    """Native-backed batch source for frame-alignment training.

    Requires the native library; callers fall back to
    AlignmentBatchDispenser + DeviceBatcher when
    :func:`tfkaldi_tpu.io.native.available` is False.

    Implements the full dispenser protocol the training controller and
    multi-host driver consume (``get_padded_batch``/``split``/
    ``skip_batch``/``return_batch``/``num_batches``/``limit_num_batches``/
    ``max_input_length``/``max_target_length``/``compute_target_count``),
    so it is a drop-in for AlignmentBatchDispenser on the production path.
    """

    def __init__(
        self,
        scpfile: str,
        cmvnfile: str | None,
        utt2spkfile: str,
        context_width: int,
        alignments: dict[str, np.ndarray],
        batch_size: int,
        bucket_multiple: int = 128,
        num_labels: int | None = None,
        max_input_length: int | None = None,
    ):
        """``num_labels``: total pdf classes — sizes the prior exactly like
        AlignmentBatchDispenser.compute_target_count (a label that never
        occurs in training must still get a prior slot, or the decoder's
        posterior/prior division shape-mismatches).

        ``cmvnfile=None`` disables CMVN (the ``apply_cmvn = False`` config
        path): the native call still runs with identity stats (mean 0,
        variance 1), which is bit-exact against the raw features.

        ``max_input_length``: corpus-wide max frame count (the featdir
        ``maxlength`` file) — only surfaced for the multi-host driver's
        fixed-shape padding; batches themselves pad to the bucketed batch
        max like the Python path."""
        if not native.available():
            raise RuntimeError("native arkio unavailable")
        self.reader = ArkReader(scpfile)
        utt2spk = read_utt2spk(utt2spkfile)
        self.context_width = int(context_width)
        self.batch_size = int(batch_size)
        self.bucket_multiple = int(bucket_multiple)
        self.alignments = alignments
        self.num_labels = int(num_labels) if num_labels else None
        self._max_input_length = max_input_length
        if self.num_labels is not None:
            # same guard AlignmentCoder.encode applies on the Python path:
            # a pdf id outside [0, num_labels) would silently corrupt the
            # one-hot loss and the prior
            for utt, ali in alignments.items():
                if len(ali) and not (0 <= int(ali.min()) and int(ali.max()) < self.num_labels):
                    raise ValueError(
                        f"alignment for {utt} has pdf ids outside [0, {self.num_labels})"
                    )

        # usable utterances in scp order: have targets; frame counts read
        # from the alignments (frame-level targets ⇒ len == num frames).
        # _with_targets additionally keeps too-short utterances — the
        # dispenser's num_utt / prior count span those too (reference
        # batchdispenser.py:128-145, 168-171), only get_batch skips them
        self._entries = []  # (utt_id, ark_path, offset, num_frames)
        self._with_targets: list[str] = []
        for i, utt in enumerate(self.reader.utt_ids):
            ali = alignments.get(utt)
            if ali is None:
                log.warning("no targets for %s", utt)
                continue
            self._with_targets.append(utt)
            if len(ali) < 2 * self.context_width + 1:
                log.warning("%s is too short to splice", utt)
                continue
            path, offset = self.reader.scp_data[i]
            self._entries.append((utt, path, offset, len(ali)))
        if cmvnfile:
            cmvn_reader = ArkReader(cmvnfile)
            self._cmvn = {
                spk: np.ascontiguousarray(cmvn_reader.read_utt(spk), dtype=np.float32)
                for spk in set(utt2spk.values())
            }
            cmvn_reader.close()
            self.feat_dim = int(next(iter(self._cmvn.values())).shape[1]) - 1
        else:
            # identity stats: (x - 0/1) / sqrt(1/1 - 0) == x, bit-exact
            _, first, _ = self.reader.read_next_utt()
            self.reader.close()
            self.reader = ArkReader(scpfile)  # rewind
            dim = int(first.shape[1])
            ident = np.zeros((2, dim + 1), dtype=np.float32)
            ident[0, -1] = 1.0  # count
            ident[1, :-1] = 1.0  # Σx² -> var 1
            ident[1, -1] = 1.0
            self._cmvn = _IdentityStats(ident)
            self.feat_dim = dim
        self._utt2spk = utt2spk
        self.cursor = 0
        self._num_batches_limit = None

    # -- cursor semantics -------------------------------------------------

    @property
    def num_utt(self) -> int:
        """Utterances with targets — includes too-short ones and is NOT
        reduced by split(), exactly like the Python dispenser (reference
        num_utt = len(target_dict), batchdispenser.py:168-171; its split
        never touches target_dict)."""
        return len(self._with_targets)

    @property
    def num_batches(self) -> float:
        raw = self.num_utt / self.batch_size
        limit = self._num_batches_limit
        return raw if limit is None else min(raw, limit)

    def limit_num_batches(self, limit: float) -> None:
        """Cap ``num_batches`` at a host-agreed value (multi-host runs; see
        BatchDispenser.limit_num_batches for why equal scp shards are not
        enough)."""
        self._num_batches_limit = float(limit)

    @property
    def max_input_length(self) -> int:
        if self._max_input_length is None:
            raise AttributeError("BulkAlignmentBatchSource built without max_input_length")
        return int(self._max_input_length)

    @property
    def max_target_length(self) -> int:
        """Frame-level targets: length == frame count. Spans every utterance
        with targets (incl. too-short ones), like the Python dispenser's
        max over its encoded target_dict."""
        return max((len(self.alignments[u]) for u in self._with_targets), default=0)

    def split(self) -> None:
        self._entries = self._entries[self.cursor :]
        self.cursor = 0

    def skip_batch(self) -> None:
        n = max(len(self._entries), 1)
        self.cursor = (self.cursor + self.batch_size) % n

    def return_batch(self) -> None:
        n = max(len(self._entries), 1)
        self.cursor = (self.cursor - self.batch_size) % n

    # -- batches ----------------------------------------------------------

    def get_padded_batch(self, batcher) -> PaddedBatch:
        """Dispenser-protocol entry: produce one device-ready PaddedBatch,
        honoring the DeviceBatcher's padding policy (bucketed batch max, or
        the pinned corpus-max lengths of a multi-host run)."""
        return self.get_batch(
            fixed_length=batcher.fixed_input_length,
            bucket_multiple=batcher.bucket_multiple,
        )

    def get_batch(
        self, fixed_length: int | None = None, bucket_multiple: int | None = None
    ) -> PaddedBatch:
        n = self.batch_size
        n_avail = len(self._entries)
        if n_avail == 0:
            raise RuntimeError(
                "no usable utterances: every scp entry lacks targets "
                "or is too short to splice"
            )
        idx = [(self.cursor + j) % n_avail for j in range(n)]
        self.cursor = (self.cursor + n) % n_avail
        entries = [self._entries[i] for i in idx]

        t_max = max(e[3] for e in entries)
        t_pad = fixed_length or round_up(t_max, bucket_multiple or self.bucket_multiple)
        if t_max > t_pad:
            raise ValueError("utterance longer than fixed padded length")

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
        """Bincount over the targets of THIS source's scp (including
        too-short utterances) — exactly the Python dispenser's count
        (batchdispenser.py:128-145 over its scp-filtered target_dict).
        Counting the full alignment dict instead would double-count the
        prior across the scp shards of a multi-host run."""
        counted = [self.alignments[u] for u in self._with_targets]
        minlength = self.num_labels or (int(max(a.max() for a in counted)) + 1)
        encoded = np.concatenate(counted)
        return np.bincount(encoded, minlength=minlength)


class BulkTextBatchSource:
    """Native-backed batch source for TEXT-target training (CTC / RNN-T /
    attention — the flagship beyond-reference recipes).

    The text twin of :class:`BulkAlignmentBatchSource`: the whole feature
    batch (read + CMVN + splice + padding) comes from one native call per
    ark file; targets are the coder-encoded transcriptions, padded on the
    host (they are tiny next to the features). Byte-identical batches to
    TextBatchDispenser + DeviceBatcher, including cursor semantics —
    verified in tests/test_bulk_loader.py.

    Unlike the alignment source, frame counts cannot be derived from the
    targets (text length != frame count), so they come from the same
    15-byte ark header scan the Python dispenser uses for its usable-set
    predicate (io/ark.py::scan_scp_shapes).
    """

    def __init__(
        self,
        scpfile: str,
        cmvnfile: str | None,
        utt2spkfile: str,
        context_width: int,
        target_coder,
        textfile: str,
        batch_size: int,
        bucket_multiple: int = 128,
        max_input_length: int | None = None,
    ):
        if not native.available():
            raise RuntimeError("native arkio unavailable")
        self.reader = ArkReader(scpfile)
        utt2spk = read_utt2spk(utt2spkfile)
        self.context_width = int(context_width)
        self.batch_size = int(batch_size)
        self.bucket_multiple = int(bucket_multiple)
        self.target_coder = target_coder
        self._max_input_length = max_input_length

        # encode every target once (dispenser.py:49-52 semantics), scoped
        # to THIS scp (multi-host shards; dispenser.py:41-47)
        target_dict: dict[str, str] = {}
        with open(textfile, "r") as fid:
            for line in fid:
                parts = line.strip().split(" ")
                target_dict[parts[0]] = " ".join(parts[1:])
        in_scp = set(self.reader.utt_ids)
        self._encoded = {
            utt: target_coder.encode(text)
            for utt, text in target_dict.items()
            if utt in in_scp
        }

        # frame counts from header-only scans; usable = has targets AND
        # long enough to splice (the dispenser's aligned predicate)
        from tfkaldi_tpu.io.ark import scan_scp_shapes

        with_targets = [
            (utt, entry)
            for utt, entry in zip(self.reader.utt_ids, self.reader.scp_data)
            if utt in self._encoded
        ]
        shapes = scan_scp_shapes([entry for _, entry in with_targets])
        min_frames = 2 * self.context_width + 1
        self._with_targets = [utt for utt, _ in with_targets]
        self._entries = []  # (utt_id, ark_path, offset, num_frames)
        for (utt, (path, offset)), (rows, _cols) in zip(with_targets, shapes):
            if rows < min_frames:
                log.warning("%s is too short to splice", utt)
                continue
            self._entries.append((utt, path, offset, rows))
        for utt in self.reader.utt_ids:
            if utt not in self._encoded:
                log.warning("no targets for %s", utt)

        if cmvnfile:
            cmvn_reader = ArkReader(cmvnfile)
            self._cmvn = {
                spk: np.ascontiguousarray(cmvn_reader.read_utt(spk), dtype=np.float32)
                for spk in set(utt2spk.values())
            }
            cmvn_reader.close()
            self.feat_dim = int(next(iter(self._cmvn.values())).shape[1]) - 1
        else:
            _, first, _ = self.reader.read_next_utt()
            self.reader.close()
            self.reader = ArkReader(scpfile)  # rewind
            dim = int(first.shape[1])
            ident = np.zeros((2, dim + 1), dtype=np.float32)
            ident[0, -1] = 1.0
            ident[1, :-1] = 1.0
            ident[1, -1] = 1.0
            self._cmvn = _IdentityStats(ident)
            self.feat_dim = dim
        self._utt2spk = utt2spk
        self.cursor = 0
        self._num_batches_limit = None

    # -- cursor semantics (shared shape with the alignment source) --------

    @property
    def num_utt(self) -> int:
        return len(self._with_targets)

    @property
    def num_batches(self) -> float:
        raw = self.num_utt / self.batch_size
        limit = self._num_batches_limit
        return raw if limit is None else min(raw, limit)

    def limit_num_batches(self, limit: float) -> None:
        self._num_batches_limit = float(limit)

    @property
    def num_labels(self) -> int:
        return self.target_coder.num_labels

    @property
    def max_input_length(self) -> int:
        if self._max_input_length is None:
            raise AttributeError("BulkTextBatchSource built without max_input_length")
        return int(self._max_input_length)

    @property
    def max_target_length(self) -> int:
        """Max over every encoded target in this scp (incl. too-short
        utterances), like the Python dispenser's max over _encoded."""
        return max((t.size for t in self._encoded.values()), default=0)

    def split(self) -> None:
        self._entries = self._entries[self.cursor :]
        self.cursor = 0

    def skip_batch(self) -> None:
        n = max(len(self._entries), 1)
        self.cursor = (self.cursor + self.batch_size) % n

    def return_batch(self) -> None:
        n = max(len(self._entries), 1)
        self.cursor = (self.cursor - self.batch_size) % n

    # -- batches ----------------------------------------------------------

    def get_padded_batch(self, batcher) -> PaddedBatch:
        return self.get_batch(
            fixed_input_length=batcher.fixed_input_length,
            fixed_target_length=batcher.fixed_target_length,
            bucket_multiple=batcher.bucket_multiple,
        )

    def get_batch(
        self,
        fixed_input_length: int | None = None,
        fixed_target_length: int | None = None,
        bucket_multiple: int | None = None,
    ) -> PaddedBatch:
        n = self.batch_size
        n_avail = len(self._entries)
        if n_avail == 0:
            raise RuntimeError(
                "no usable utterances: every scp entry lacks targets "
                "or is too short to splice"
            )
        idx = [(self.cursor + j) % n_avail for j in range(n)]
        self.cursor = (self.cursor + n) % n_avail
        entries = [self._entries[i] for i in idx]
        bucket = bucket_multiple or self.bucket_multiple

        t_max = max(e[3] for e in entries)
        t_pad = fixed_input_length or round_up(t_max, bucket)
        if t_max > t_pad:
            raise ValueError("utterance longer than fixed padded length")

        by_path: dict[str, list[int]] = {}
        for j, e in enumerate(entries):
            by_path.setdefault(e[1], []).append(j)

        def read_group(path, js):
            offsets = np.asarray([entries[j][2] for j in js], dtype=np.int64)
            stats = np.stack([self._cmvn[self._utt2spk[entries[j][0]]] for j in js])
            return native.read_cmvn_splice_batch(
                path, offsets, stats, self.context_width, t_pad, self.feat_dim
            )

        if len(by_path) == 1:
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

        encoded = [self._encoded[e[0]] for e in entries]
        target_lengths = np.asarray([t.size for t in encoded], dtype=np.int32)
        l_pad = fixed_target_length or round_up(
            int(target_lengths.max(initial=1)), bucket
        )
        if int(target_lengths.max(initial=0)) > l_pad:
            raise ValueError("utterance longer than fixed padded length")
        targets = np.zeros((n, l_pad), dtype=np.int32)
        for j, t in enumerate(encoded):
            targets[j, : t.size] = t
        return PaddedBatch(
            feats, targets, np.asarray(rows, dtype=np.int32), target_lengths
        )

    def compute_target_count(self) -> np.ndarray:
        """Bincount over all encoded targets of this scp — the class prior
        numerator, exactly like the Python dispenser
        (batchdispenser.py:128-145)."""
        encoded = np.concatenate(list(self._encoded.values()))
        return np.bincount(encoded, minlength=self.target_coder.num_labels)
