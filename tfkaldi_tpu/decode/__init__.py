"""Posterior emission for hybrid WFST decoding, and CTC decoding."""

from tfkaldi_tpu.decode.ctc import CTCDecoder, collapse_ctc_path
from tfkaldi_tpu.decode.decoder import Decoder

__all__ = ["CTCDecoder", "Decoder", "collapse_ctc_path"]
