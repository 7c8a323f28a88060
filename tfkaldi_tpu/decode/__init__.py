"""Posterior emission for hybrid WFST decoding, and CTC decoding."""

from tfkaldi_tpu.decode.ctc import CTCDecoder, collapse_ctc_path
from tfkaldi_tpu.decode.decoder import Decoder
from tfkaldi_tpu.decode.online import OnlineRecurrentDecoder

__all__ = ["CTCDecoder", "Decoder", "OnlineRecurrentDecoder", "collapse_ctc_path"]
