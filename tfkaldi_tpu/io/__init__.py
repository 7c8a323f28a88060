"""Kaldi interchange & file I/O (layer L0).

Byte-compatible readers/writers for Kaldi binary ark/scp archives and the
Kaldi data-dir text files (segments, wav.scp, utt2spk, spk2utt, gzipped
alignments). This is the contract with the external Kaldi toolkit: our
feature archives feed Kaldi GMM training, and our pseudo-likelihood
archives feed ``latgen-faster-mapped``.
"""

from tfkaldi_tpu.io.ark import (
    ArkReader,
    ArkWriter,
    read_ark_matrix,
    read_ark_shape,
    scan_scp_shapes,
    write_ark_matrix,
)
from tfkaldi_tpu.io.kaldi_io import (
    read_alignments,
    read_segments,
    read_utt2spk,
    read_spk2utt,
    read_wavfiles,
)
from tfkaldi_tpu.io.wav import read_wav

__all__ = [
    "ArkReader",
    "ArkWriter",
    "read_ark_matrix",
    "read_ark_shape",
    "scan_scp_shapes",
    "write_ark_matrix",
    "read_alignments",
    "read_segments",
    "read_utt2spk",
    "read_spk2utt",
    "read_wavfiles",
    "read_wav",
]
