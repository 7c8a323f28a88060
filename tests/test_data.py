"""Tests for the data layer: coders, normalizers, reader, dispenser, batching."""

import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import (
    AlignmentBatchDispenser,
    AlignmentCoder,
    DeviceBatcher,
    FeatureReader,
    TextCoder,
    aurora4_normalizer,
    identity_normalizer,
)
from tfkaldi_tpu.data.feature_reader import apply_cmvn_np, splice_np


def test_text_coder_roundtrip():
    coder = TextCoder(aurora4_normalizer)
    assert coder.num_labels == 35
    enc = coder.encode("HELLO .PERIOD")
    assert enc.dtype == np.int32
    dec = coder.decode(enc)
    assert dec.startswith("<sos>") and dec.endswith("<eos>")
    assert "p e r i o d" in dec


def test_aurora4_normalizer_replacements():
    out = aurora4_normalizer("A <NOISE> ,COMMA", ["<sos>", "<eos>", "<space>", "<unk>", "a", "o", "m"])
    tokens = out.split(" ")
    assert tokens[0] == "<sos>" and tokens[-1] == "<eos>"
    assert "<unk>" in tokens  # 'c' not in this alphabet → <unk>
    assert "," not in tokens  # ,COMMA → COMMA


def test_alignment_coder():
    coder = AlignmentCoder(identity_normalizer, 5)
    np.testing.assert_array_equal(coder.encode("0 3 4 4"), [0, 3, 4, 4])
    assert coder.num_labels == 5
    assert coder.decode([1, 2]) == "1 2"


def test_feature_reader_cmvn_and_splice(tmp_path):
    featdir, _, info = make_featdir(tmp_path)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 2, 60
    )
    utt_id, spliced, looped = reader.get_utt()
    assert not looped
    raw = info["utts"][utt_id]
    assert spliced.shape == (raw.shape[0], raw.shape[1] * 5)
    # spot-check: center block equals cmvn-normalized features
    spk_feats = np.concatenate(
        [m for u, m in info["utts"].items() if info["utt2spk"][u] == info["utt2spk"][utt_id]]
    )
    from tests.synthetic import cmvn_stats_f32

    normed = apply_cmvn_np(raw, cmvn_stats_f32(spk_feats).astype(np.float64))
    np.testing.assert_allclose(spliced[:, 2 * raw.shape[1] : 3 * raw.shape[1]], normed, atol=1e-4)
    # per-speaker cmvn: mean ≈ 0, std ≈ 1 over the speaker
    assert abs(normed.mean()) < 0.5


def test_splice_too_short_returns_none():
    assert splice_np(np.zeros((4, 3), np.float32), 2) is None
    assert splice_np(np.zeros((5, 3), np.float32), 2) is not None


def test_dispenser_batches_and_cursors(tmp_path):
    featdir, alifile, info = make_featdir(tmp_path)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    assert disp.num_utt == 12
    assert disp.num_batches == 3.0
    assert disp.num_labels == info["num_labels"]

    inputs, targets = disp.get_batch()
    assert len(inputs) == 4 and len(targets) == 4
    for x, t in zip(inputs, targets):
        assert x.shape[0] == t.shape[0]  # frame-level alignments

    count = disp.compute_target_count()
    assert count.sum() == sum(a.size for a in info["alignments"].values())

    # skip/return cursor symmetry
    disp.skip_batch()
    disp.return_batch()
    a2, _ = disp.get_batch()
    b2, _ = disp.get_batch()
    assert len(a2) == 4 and len(b2) == 4


def test_validation_split_carves_off_read_portion(tmp_path):
    featdir, alifile, info = make_featdir(tmp_path)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    disp.get_batch()
    disp.split()
    assert reader.num_utt == 8  # 12 - 4, keeping the final utterance (ref drops it)


def test_device_batcher_padding_and_micro(tmp_path):
    batcher = DeviceBatcher(bucket_multiple=16)
    inputs = [np.ones((t, 3), np.float32) * t for t in (10, 20, 33, 5)]
    targets = [np.arange(t, dtype=np.int32) for t in (10, 20, 33, 5)]
    batch = batcher(inputs, targets)
    assert batch.inputs.shape == (4, 48, 3)
    assert batch.targets.shape == (4, 48)
    np.testing.assert_array_equal(batch.input_lengths, [10, 20, 33, 5])
    assert batch.num_frames == 68
    assert np.all(batch.inputs[0, 10:] == 0)

    micros = batcher.split_microbatches(batch, 2)
    assert len(micros) == 2 and micros[0].inputs.shape == (2, 48, 3)
    with pytest.raises(ValueError):
        batcher.split_microbatches(batch, 3)


def test_device_batcher_fixed_length():
    batcher = DeviceBatcher(fixed_input_length=40, fixed_target_length=40)
    batch = batcher([np.ones((10, 2), np.float32)], [np.ones(10, np.int32)])
    assert batch.inputs.shape == (1, 40, 2)
    with pytest.raises(ValueError):
        batcher([np.ones((50, 2), np.float32)], [np.ones(50, np.int32)])


def test_feature_reader_without_cmvn(tmp_path):
    """cmvnfile=None disables CMVN (the apply_cmvn key the reference's CGN
    config carries but never reads, config_CGN.cfg:54)."""
    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import FeatureReader
    from tfkaldi_tpu.io import ArkReader

    featdir, _, info = make_featdir(tmp_path)
    r = FeatureReader(
        f"{featdir}/feats.scp", None, f"{featdir}/utt2spk", 0, 60
    )
    utt_id, mat, _ = r.get_utt()
    raw = ArkReader(f"{featdir}/feats.scp").read_utt(utt_id)
    np.testing.assert_array_equal(mat, raw)  # untouched, unspliced (c=0)


def test_dispenser_raises_when_nothing_usable(tmp_path):
    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    import gzip

    featdir, _, info = make_featdir(tmp_path)
    empty_ali = str(tmp_path / "empty.gz")
    with gzip.open(empty_ali, "wt") as f:
        f.write("")
    r = FeatureReader(f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60)
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    d = AlignmentBatchDispenser(r, coder, 4, empty_ali)
    import pytest
    with pytest.raises(RuntimeError, match="no usable utterances"):
        d.get_batch()


def test_dispenser_raises_when_split_exhausts_corpus(tmp_path):
    """If the validation carve consumes every usable utterance, get_batch
    must raise, not hang (the usable set is pruned on split())."""
    import pytest

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer

    featdir, alifile, info = make_featdir(tmp_path, num_speakers=1, utts_per_speaker=4)
    r = FeatureReader(f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60)
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    d = AlignmentBatchDispenser(r, coder, 4, alifile)
    d.get_batch()  # consume all 4 utterances
    d.split()      # nothing left
    with pytest.raises(RuntimeError, match="no usable utterances"):
        d.get_batch()
    with pytest.raises(RuntimeError):
        d.skip_batch()


def test_limit_num_batches(tmp_path):
    """Multi-host: the driver pins num_batches at the allgathered minimum
    so hosts with richer target coverage don't derive a larger num_steps."""
    featdir, alifile, info = make_featdir(tmp_path)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    assert disp.num_batches == 3.0
    disp.limit_num_batches(2.5)
    assert disp.num_batches == 2.5
    disp.limit_num_batches(10.0)  # a cap above the raw value is inert
    assert disp.num_batches == 3.0
