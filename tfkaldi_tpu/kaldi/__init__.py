"""External-Kaldi orchestration (layer L4).

GMM-HMM training/alignment/decoding stay in the external Kaldi toolkit —
the interchange boundary is the filesystem (ark/scp/gz artifacts), exactly
as in the reference. Unlike the reference's fire-and-forget ``os.system``
calls (gmm.py:31-44, no error checking anywhere), every subprocess here is
checked and failures propagate.
"""

from tfkaldi_tpu.kaldi.gmm import GMM, LdaGmm, MonoGmm, TriGmm, merge_alignments
from tfkaldi_tpu.kaldi.decode_wfst import WfstDecodeOpts, best_wer, decode_wfst

__all__ = [
    "GMM",
    "MonoGmm",
    "TriGmm",
    "LdaGmm",
    "merge_alignments",
    "WfstDecodeOpts",
    "best_wer",
    "decode_wfst",
]
