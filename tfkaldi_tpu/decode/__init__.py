"""Posterior emission for hybrid WFST decoding."""

from tfkaldi_tpu.decode.decoder import Decoder

__all__ = ["Decoder"]
