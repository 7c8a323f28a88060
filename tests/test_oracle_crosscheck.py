"""Cross-check the two oracles against each other.

``tests/reference_port`` is a mechanical Python-3 port of the reference's
processing code (the primary oracle since round 2); ``tests/ref_frontend``
is an independent float64 re-derivation of the same math (the round-1
oracle). Fuzzing them against each other pins the port's Py2→Py3 edits
(integer division, xrange) and the re-derivation's faithfulness at once:
they must agree to float64 roundoff, not just 1e-4.
"""

import numpy as np
import pytest

from tests import ref_frontend as rederived
from tests import reference_port as refport

RATE = 16000


@pytest.mark.parametrize("trial", range(8))
def test_oracles_agree(trial):
    rng = np.random.default_rng(4000 + trial)
    conf = {
        "type": str(rng.choice(["fbank", "mfcc", "ssc"])),
        "dynamic": str(rng.choice(["nodelta", "delta", "ddelta"])),
        "winlen": str(rng.choice([0.02, 0.025, 0.032])),
        "winstep": str(rng.choice([0.008, 0.01, 0.015])),
        "nfilt": str(int(rng.integers(8, 32))),
        "nfft": str(int(rng.choice([256, 512]))),
        "lowfreq": str(int(rng.choice([0, 80, 300]))),
        "highfreq": str(int(rng.choice([-1, 7000]))),
        "preemph": str(float(rng.choice([0.0, 0.95, 0.97]))),
        "include_energy": str(bool(rng.integers(0, 2))),
        "snip_edges": str(bool(rng.integers(0, 2))),
        "numcep": str(int(rng.integers(6, 14))),
        "ceplifter": str(float(rng.choice([0, 22]))),
    }
    if conf["type"] == "mfcc":
        conf["numcep"] = str(min(int(conf["numcep"]), int(conf["nfilt"])))
    sig = (rng.standard_normal(int(rng.integers(RATE // 8, RATE // 2))) * 800).astype(
        np.float64
    )
    a = refport.compute(sig, RATE, conf)
    b = rederived.ref_compute(sig, RATE, conf)
    assert a.shape == b.shape, (conf, a.shape, b.shape)
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_cmvn_splice_oracles_agree():
    rng = np.random.default_rng(11)
    utt = rng.standard_normal((30, 9))
    stats = np.zeros((2, 10))
    stats[0, :-1] = utt.sum(0)
    stats[0, -1] = 30
    stats[1, :-1] = np.square(utt).sum(0)
    np.testing.assert_allclose(
        refport.feature_reader.apply_cmvn(utt, stats),
        rederived.ref_apply_cmvn(utt, stats),
        rtol=1e-12,
    )
    for c in [1, 2, 5]:
        np.testing.assert_array_equal(
            refport.feature_reader.splice(utt.astype(np.float32), c),
            rederived.ref_splice(utt.astype(np.float32), c),
        )
    # the <2c+1-frames -> None rule
    assert refport.feature_reader.splice(utt[:3].astype(np.float32), 2) is None
    assert rederived.ref_splice(utt[:3].astype(np.float32), 2) is None
