"""Signal processing & feature extraction (layer L1), TPU-batched.

The reference computes features one utterance at a time in numpy
(processing/prepare_data.py:55-68, processing/base.py, processing/sigproc.py).
Here the whole pipeline — preemphasis, framing, power spectrum, mel
filterbank, log/DCT/lifter, energy, delta dynamics — is a single
jit-compiled JAX function over padded utterance batches ``[B, S]`` with a
length vector, so the MXU sees one big batched matmul instead of thousands
of tiny host-side ops.

Numerical quirks of the reference are reproduced exactly (they are part of
the feature definition): rectangular analysis window (sigproc.py:33),
``1/nfft`` power-spectrum scaling (sigproc.py:138-153), eps floors on
energy and filterbank outputs (base.py:87,96), mel bin edges
``floor((nfft+1)*hz/rate)`` (base.py:215), ``snip_edges`` frame arithmetic
(feat.py:71-90), and ndimage-style reflect-boundary derivative filters
(base.py:249-259).
"""

from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import OnlineDynamicExtractor, OnlineFeatureExtractor
from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats, splice
from tfkaldi_tpu.frontend.functional import (
    fbank,
    logfbank,
    mfcc,
    ssc,
    deriv,
    delta,
    ddelta,
)

__all__ = [
    "FeatureExtractor",
    "FeatureOpts",
    "OnlineDynamicExtractor",
    "OnlineFeatureExtractor",
    "apply_cmvn",
    "cmvn_stats",
    "splice",
    "fbank",
    "logfbank",
    "mfcc",
    "ssc",
    "deriv",
    "delta",
    "ddelta",
]
