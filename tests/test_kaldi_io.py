"""Tests for Kaldi data-dir text-file readers."""

import gzip

import numpy as np

from tfkaldi_tpu.io import (
    read_alignments,
    read_segments,
    read_spk2utt,
    read_utt2spk,
    read_wavfiles,
)


def test_read_alignments(tmp_path):
    path = tmp_path / "pdf.1.gz"
    with gzip.open(path, "wt") as f:
        f.write("utt1 0 1 2 2 \n")
        f.write("utt2 5 5 \n")
    ali = read_alignments(str(path))
    np.testing.assert_array_equal(ali["utt1"], [0, 1, 2, 2])
    np.testing.assert_array_equal(ali["utt2"], [5, 5])


def test_read_segments(tmp_path):
    path = tmp_path / "segments"
    path.write_text("seg1 rec1 0.0 1.5\nseg2 rec1 1.5 3.0\nseg3 rec2 0.0 2.0\n")
    segs = read_segments(str(path))
    assert list(segs) == ["rec1", "rec2"]
    assert segs["rec1"] == [("seg1", 0.0, 1.5), ("seg2", 1.5, 3.0)]
    assert segs["rec2"] == [("seg3", 0.0, 2.0)]


def test_read_wavfiles_plain_and_extended(tmp_path):
    path = tmp_path / "wav.scp"
    path.write_text("utt1 /data/utt1.wav\nutt2 sox /data/utt2.sph -t wav - |\n")
    wavs = read_wavfiles(str(path))
    assert wavs["utt1"] == ("/data/utt1.wav", False)
    assert wavs["utt2"] == ("sox /data/utt2.sph -t wav - |", True)


def test_read_utt2spk_spk2utt(tmp_path):
    (tmp_path / "utt2spk").write_text("utt1 spkA\nutt2 spkA\nutt3 spkB\n")
    (tmp_path / "spk2utt").write_text("spkA utt1 utt2\nspkB utt3\n")
    u2s = read_utt2spk(str(tmp_path / "utt2spk"))
    s2u = read_spk2utt(str(tmp_path / "spk2utt"))
    assert u2s == {"utt1": "spkA", "utt2": "spkA", "utt3": "spkB"}
    assert s2u == {"spkA": ["utt1", "utt2"], "spkB": ["utt3"]}
