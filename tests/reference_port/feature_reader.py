"""TEST-ONLY ORACLE: mechanical Python-3 port of the module-level functions of
/root/reference/processing/feature_reader.py (apply_cmvn at :91-115, splice at
:117-156). The FeatureReader class itself is not ported — its streaming
behavior is covered by the stateful dispenser/reader property tests.

Port changes: none — the function bodies are already valid Python 3.
"""

import numpy as np


def apply_cmvn(utt, stats):
    """Mean/variance normalisation from 2x(dim+1) speaker stats
    (reference feature_reader.py:91-115)."""

    # compute mean
    mean = stats[0, :-1]/stats[0, -1]

    # compute variance
    variance = stats[1, :-1]/stats[0, -1] - np.square(mean)

    # return mean and variance normalised utterance
    return np.divide(np.subtract(utt, mean), np.sqrt(variance))


def splice(utt, context_width):
    """Context splicing with zero-padded edges; None if the utterance is
    shorter than 2*context_width+1 frames (reference feature_reader.py:117-156)."""

    # return None if utterance is too short
    if utt.shape[0] < 1+2*context_width:
        return None

    # create spliced utterance holder
    utt_spliced = np.zeros(
        shape=[utt.shape[0], utt.shape[1]*(1+2*context_width)],
        dtype=np.float32)

    # middle part is just the utterance
    utt_spliced[:, context_width*utt.shape[1]:
                (context_width+1)*utt.shape[1]] = utt

    for i in range(context_width):

        # add left context
        utt_spliced[i+1:utt_spliced.shape[0],
                    (context_width-i-1)*utt.shape[1]:
                    (context_width-i)*utt.shape[1]] = utt[0:utt.shape[0]-i-1, :]

        # add right context
        utt_spliced[0:utt_spliced.shape[0]-i-1,
                    (context_width+i+1)*utt.shape[1]:
                    (context_width+i+2)*utt.shape[1]] = utt[i+1:utt.shape[0], :]

    return utt_spliced
