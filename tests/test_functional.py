"""Standalone sigproc/feature functions vs the ported reference code
(tests/reference_port) and the batched device extractor."""

import numpy as np
import pytest

from tests import reference_port as refport
from tfkaldi_tpu.frontend import functional, sigproc
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts

RATE = 16000
CONF = {
    "type": "mfcc",
    "dynamic": "nodelta",
    "winlen": "0.025",
    "winstep": "0.01",
    "nfilt": "20",
    "nfft": "512",
    "lowfreq": "0",
    "highfreq": "-1",
    "preemph": "0.97",
    "include_energy": "False",
    "snip_edges": "False",
    "numcep": "13",
    "ceplifter": "22",
}


@pytest.fixture
def sig():
    rng = np.random.default_rng(0)
    return rng.standard_normal(RATE // 2) * 1000


def test_preemphasis_and_framesig(sig):
    np.testing.assert_allclose(
        sigproc.preemphasis(sig, 0.97), refport.sigproc.preemphasis(sig, 0.97)
    )
    ours = sigproc.framesig(sig, 0.025 * RATE, 0.01 * RATE)
    want = refport.sigproc.framesig(sig, 0.025 * RATE, 0.01 * RATE)
    np.testing.assert_allclose(ours, want)


def test_powspec(sig):
    frames = sigproc.framesig(sig, 400, 160)
    np.testing.assert_allclose(sigproc.powspec(frames, 512), refport.sigproc.powspec(frames, 512))


def test_deframesig_roundtrip(sig):
    frames = sigproc.framesig(sig, 400, 160)
    rec = sigproc.deframesig(frames, len(sig), 400, 160)
    np.testing.assert_allclose(rec, sig, rtol=1e-9)


def test_logpowspec_floor_and_norm():
    frames = np.zeros((2, 400))
    frames[1, 0] = 1.0
    lps = sigproc.logpowspec(frames, 512, norm=False)
    assert lps.min() == 10 * np.log10(1e-30)
    assert sigproc.logpowspec(frames, 512, norm=True).max() == 0.0


def test_fbank_matches_ref(sig):
    feat, energy = functional.fbank(sig, RATE, CONF)
    want_feat, want_energy = refport.base.fbank(sig, RATE, CONF)
    np.testing.assert_allclose(feat, want_feat, rtol=1e-9)
    np.testing.assert_allclose(energy, want_energy, rtol=1e-9)


def test_logfbank_mfcc_ssc_match_ref(sig):
    np.testing.assert_allclose(
        functional.logfbank(sig, RATE, CONF), refport.base.logfbank(sig, RATE, CONF)[0], rtol=1e-9
    )
    np.testing.assert_allclose(
        functional.mfcc(sig, RATE, CONF)[0], refport.base.mfcc(sig, RATE, CONF)[0], rtol=1e-9
    )
    np.testing.assert_allclose(
        functional.ssc(sig, RATE, CONF)[0], refport.base.ssc(sig, RATE, CONF)[0], rtol=1e-9
    )


def test_deriv_delta_ddelta(sig):
    feat = functional.logfbank(sig, RATE, CONF)
    np.testing.assert_allclose(functional.deriv(feat), refport.base.deriv(feat))
    d = functional.delta(feat)
    assert d.shape == (feat.shape[0], feat.shape[1] * 2)
    np.testing.assert_allclose(d[:, feat.shape[1] :], refport.base.deriv(feat))
    dd = functional.ddelta(feat)
    assert dd.shape == (feat.shape[0], feat.shape[1] * 3)


def test_functional_consistent_with_device_extractor(sig):
    """The host functional API and the batched device pipeline agree."""
    opts = FeatureOpts.from_config(CONF)
    ex = FeatureExtractor(opts, RATE, "high")
    device = ex.compute(sig)
    host = functional.mfcc(sig, RATE, CONF)[0]
    np.testing.assert_allclose(device, host, atol=2e-5, rtol=1e-4)
