"""TEST-ONLY ORACLE — mechanical Python-3 port of the reference feature code.

Per VERDICT.md (round 1, next-round item 2): the parity/fuzz suites must run
against the *actual* reference implementation rather than a first-party
re-derivation, so a shared misreading cannot pass silently. These modules are
line-mechanical 2to3 ports of

    /root/reference/processing/sigproc.py   (vendored python_speech_features, MIT)
    /root/reference/processing/base.py      (vendored python_speech_features, MIT)
    /root/reference/processing/feat.py
    /root/reference/processing/feature_reader.py (apply_cmvn/splice only)

with ONLY the changes required to execute under Python 3 (print/xrange/relative
imports/integer division), each marked inline. They are not part of the
tfkaldi_tpu framework and are never imported by production code. The previous
first-party re-derivation (tests/ref_frontend.py) is demoted to a cross-check
(tests/test_oracle_crosscheck.py).
"""

from tests.reference_port import base, feat, feature_reader, sigproc  # noqa: F401


def compute(sig, rate, conf):
    """Convenience: the full reference FeatureComputer.__call__ pipeline
    (reference feat.py:42-69) for a config dict of strings."""
    return feat.FeatureComputer(conf["type"], conf["dynamic"], conf)(sig, rate)
