"""Feature preparation: wav corpus → Kaldi featdir on disk.

Equivalent of the reference processing/prepare_data.py:13-141, re-designed
around the batched TPU extractor: instead of one utterance at a time
through numpy (prepare_data.py:55-68), utterances are packed into padded
batches (bucketed signal lengths → a handful of XLA compiles) and the
whole batch is computed in one device dispatch. Output featdir layout is
identical: feats.ark/feats.scp (wav.scp order), cmvn.ark/cmvn.scp,
maxlength, and copied utt2spk/spk2utt/text/wav.scp.
"""

from __future__ import annotations

import logging
import os
import random
import shutil

import numpy as np

from tfkaldi_tpu.frontend.cmvn import cmvn_stats
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.io import ArkReader, ArkWriter, read_segments, read_spk2utt, read_wavfiles
from tfkaldi_tpu.io.wav import read_wav

log = logging.getLogger(__name__)


def _signal_jobs(datadir: str):
    """Yield (utt_id, rate, signal) honoring an optional segments file
    (prepare_data.py:30-37, 55-64)."""
    wavfiles = read_wavfiles(os.path.join(datadir, "wav.scp"))
    segments_path = os.path.join(datadir, "segments")
    if os.path.isfile(segments_path):
        segments = read_segments(segments_path)
        for rec, wavfile in wavfiles.items():
            rate, sig = read_wav(wavfile)
            for seg_id, begin, end in segments.get(rec, []):
                yield seg_id, rate, sig[int(begin * rate) : int(end * rate)]
    else:
        log.warning("no segments file found, assuming each wav file is a separate utterance")
        for utt, wavfile in wavfiles.items():
            rate, sig = read_wav(wavfile)
            yield utt, rate, sig


def prepare_data(
    datadir: str,
    featdir: str,
    conf: dict,
    feat_type: str | None = None,
    dynamic: str | None = None,
    *,
    batch_size: int = 32,
    length_bucket_seconds: float = 1.0,
    spectrum_precision: str = "high",
) -> int:
    """Compute features for a Kaldi data dir and write the featdir.

    Returns the max utterance frame count (also written to ``maxlength``).
    """
    os.makedirs(featdir, exist_ok=True)
    conf = dict(conf)
    if feat_type:
        conf["type"] = feat_type
    if dynamic:
        conf["dynamic"] = dynamic
    opts = FeatureOpts.from_config(conf)

    ark_path = os.path.join(featdir, "feats.ark")
    if os.path.isfile(ark_path):
        os.remove(ark_path)

    extractor: FeatureExtractor | None = None
    max_length = 0
    pending: list[tuple[str, np.ndarray]] = []

    def flush(writer):
        nonlocal max_length, extractor
        if not pending:
            return
        rate = extractor.rate
        bucket = max(1, int(length_bucket_seconds * rate))
        s_pad = -(-max(len(s) for _, s in pending) // bucket) * bucket
        batch = np.zeros((len(pending), s_pad), dtype=np.float32)
        lengths = np.zeros(len(pending), dtype=np.int64)
        for i, (_, sig) in enumerate(pending):
            batch[i, : len(sig)] = sig
            lengths[i] = len(sig)
        feats, num_frames = extractor(batch, lengths)
        feats = np.asarray(feats)
        for i, (utt_id, _) in enumerate(pending):
            n = int(num_frames[i])
            writer.write_next_utt(utt_id, feats[i, :n])
            max_length = max(max_length, n)
        pending.clear()

    with ArkWriter(os.path.join(featdir, "feats.scp"), ark_path) as writer:
        for utt_id, rate, sig in _signal_jobs(datadir):
            if extractor is None:
                extractor = FeatureExtractor(opts, rate, spectrum_precision)
            elif rate != extractor.rate:
                raise ValueError(f"mixed sample rates: {rate} vs {extractor.rate}")
            if sig.ndim > 1:  # multi-channel: first channel
                sig = sig[:, 0]
            pending.append((utt_id, np.asarray(sig, dtype=np.float32)))
            if len(pending) >= batch_size:
                flush(writer)
        flush(writer)

    # copy metadata into the featdir (prepare_data.py:72-76)
    for name in ("utt2spk", "spk2utt", "text", "wav.scp"):
        src = os.path.join(datadir, name)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(featdir, name))

    with open(os.path.join(featdir, "maxlength"), "w") as fid:
        fid.write(str(max_length))
    return max_length


def compute_cmvn(featdir: str) -> None:
    """Per-speaker CMVN statistics over feats.scp → cmvn.ark/cmvn.scp
    (prepare_data.py:82-122; same [2, dim+1] stats layout)."""
    spk2utt = read_spk2utt(os.path.join(featdir, "spk2utt"))
    reader = ArkReader(os.path.join(featdir, "feats.scp"))
    with ArkWriter(
        os.path.join(featdir, "cmvn.scp"), os.path.join(featdir, "cmvn.ark")
    ) as writer:
        for spk, utts in spk2utt.items():
            stats = None
            for utt_id in utts:
                s = cmvn_stats(reader.read_utt(utt_id))
                stats = s if stats is None else stats + s
            writer.write_next_utt(spk, stats)
    reader.close()


def shuffle_examples(featdir: str, seed: int | None = None) -> None:
    """Shuffle feats.scp once on disk → feats_shuffled.scp
    (prepare_data.py:124-141)."""
    with open(os.path.join(featdir, "feats.scp")) as f:
        lines = f.readlines()
    rng = random.Random(seed)
    rng.shuffle(lines)
    with open(os.path.join(featdir, "feats_shuffled.scp"), "w") as f:
        f.writelines(lines)
