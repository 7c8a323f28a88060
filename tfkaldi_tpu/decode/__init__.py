"""Posterior emission for hybrid WFST decoding, and CTC decoding."""

from tfkaldi_tpu.decode.ctc import CTCDecoder, collapse_ctc_path
from tfkaldi_tpu.decode.decoder import Decoder
from tfkaldi_tpu.decode.lm import ArpaLM, DenseFusionTable, FusionScorer
from tfkaldi_tpu.decode.online import (
    OnlineCTCBeamDecoder,
    OnlineCTCDecoder,
    OnlineRecurrentDecoder,
    OnlineSplicedDecoder,
    OnlineWindowedDecoder,
    StreamingTranscriber,
)
from tfkaldi_tpu.decode.seq2seq import CTCRescoreDecoder, Seq2SeqBeamDecoder
from tfkaldi_tpu.decode.transducer import (
    OnlineTransducerDecoder,
    StreamingTransducerTranscriber,
    TransducerDecoder,
)
from tfkaldi_tpu.decode.transducer_beam import (
    OnlineTransducerBeamDecoder,
    TransducerBeamDecoder,
)

__all__ = [
    "ArpaLM",
    "CTCDecoder",
    "CTCRescoreDecoder",
    "Decoder",
    "DenseFusionTable",
    "FusionScorer",
    "OnlineCTCBeamDecoder",
    "OnlineCTCDecoder",
    "OnlineRecurrentDecoder",
    "OnlineSplicedDecoder",
    "OnlineWindowedDecoder",
    "OnlineTransducerBeamDecoder",
    "OnlineTransducerDecoder",
    "Seq2SeqBeamDecoder",
    "StreamingTranscriber",
    "StreamingTransducerTranscriber",
    "TransducerBeamDecoder",
    "TransducerDecoder",
    "collapse_ctc_path",
]
