"""Streaming per-utterance feature reads with CMVN + context splicing.

Host-side equivalent of the reference processing/feature_reader.py:8-156:
reads one utterance from the ark archive, normalizes with its speaker's
CMVN stats, and splices ±context_width neighbor frames (zero-padded edges;
utterances shorter than ``2c+1`` frames yield None).

This feeds the BatchDispenser; the heavy math all happens later on device.
"""

from __future__ import annotations

import numpy as np

from tfkaldi_tpu.io import ArkReader, read_utt2spk


def apply_cmvn_np(utt: np.ndarray, stats: np.ndarray) -> np.ndarray:
    """Numpy mirror of frontend.cmvn.apply_cmvn (feature_reader.py:91-115)."""
    count = stats[0, -1]
    mean = stats[0, :-1] / count
    variance = stats[1, :-1] / count - np.square(mean)
    return (utt - mean) / np.sqrt(variance)


def splice_np(utt: np.ndarray, context_width: int) -> np.ndarray | None:
    """Numpy mirror of frontend.cmvn.splice (feature_reader.py:117-156);
    returns None when the utterance is too short to splice."""
    c = int(context_width)
    t, f = utt.shape
    if t < 1 + 2 * c:
        return None
    if c == 0:
        return np.asarray(utt, dtype=np.float32)
    padded = np.zeros((t + 2 * c, f), dtype=np.float32)
    padded[c : c + t] = utt
    return np.concatenate([padded[o : o + t] for o in range(2 * c + 1)], axis=1)


class FeatureReader:
    """Sequential reader over a feature scp with CMVN + splicing."""

    def __init__(
        self,
        scpfile: str,
        cmvnfile: str | None,
        utt2spkfile: str,
        context_width: int,
        max_input_length: int,
    ):
        """``cmvnfile=None`` disables CMVN (the ``apply_cmvn`` config key
        the reference's CGN recipe carries but its code never reads,
        config_CGN.cfg:54)."""
        self.reader = ArkReader(scpfile)
        self.reader_cmvn = ArkReader(cmvnfile) if cmvnfile else None
        self.utt2spk = read_utt2spk(utt2spkfile)
        self.context_width = int(context_width)
        # corpus-wide max frame count (from the featdir 'maxlength' file)
        self.max_input_length = int(max_input_length)
        self._cmvn_cache: dict[str, np.ndarray] = {}

    def get_utt(self):
        """Next (utt_id, spliced_features_or_None, looped)."""
        utt_id, utt_mat, looped = self.reader.read_next_utt()
        if self.reader_cmvn is not None:
            speaker = self.utt2spk[utt_id]
            stats = self._cmvn_cache.get(speaker)
            if stats is None:
                stats = self.reader_cmvn.read_utt(speaker)
                self._cmvn_cache[speaker] = stats
            utt_mat = apply_cmvn_np(utt_mat, stats)
        return utt_id, splice_np(utt_mat, self.context_width), looped

    def next_id(self) -> str:
        return self.reader.read_next_scp()

    def prev_id(self) -> str:
        return self.reader.read_previous_scp()

    def split(self) -> None:
        self.reader.split()

    @property
    def num_utt(self) -> int:
        return len(self.reader)
