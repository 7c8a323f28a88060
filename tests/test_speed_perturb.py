"""Speed-perturbation augmentation (frontend/perturb.py).

The reference has no augmentation; these tests pin the Kaldi 3-way
``sp0.9/1.0/1.1`` recipe semantics: resampling math, the bit-exact
identity of the factor-1.0 copy, featdir metadata expansion, and CMVN
over the prefixed speakers.
"""

import os

import numpy as np
import pytest
import scipy.io.wavfile

from tfkaldi_tpu.frontend.perturb import (
    expand_metadata,
    factor_prefix,
    parse_factors,
    resample_signal,
)
from tfkaldi_tpu.frontend.prepare_data import compute_cmvn, prepare_data
from tfkaldi_tpu.io import ArkReader, read_spk2utt, read_utt2spk

RATE = 16000


def test_parse_factors():
    assert parse_factors("0.9,1.0,1.1") == (0.9, 1.0, 1.1)
    assert parse_factors(" 1.1 , 0.9 ") == (1.1, 0.9)
    with pytest.raises(ValueError):
        parse_factors("0.9,0.9")
    with pytest.raises(ValueError):
        parse_factors("-1.0")
    with pytest.raises(ValueError):
        parse_factors(" , ")


def test_factor_prefix():
    assert factor_prefix(1.0) == ""
    assert factor_prefix(0.9) == "sp0.9-"
    assert factor_prefix(1.1) == "sp1.1-"


def test_resample_identity_at_unity():
    sig = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    assert resample_signal(sig, 1.0) is sig  # bit-exact, no copy


def test_resample_length():
    n = 1000
    sig = np.arange(n, dtype=np.float32)
    for f in (0.9, 1.1, 2.0, 0.5):
        out = resample_signal(sig, f)
        assert len(out) == int(round(n / f))
        assert out.dtype == np.float32


def test_resample_tone_frequency_scales():
    # band-limited semantics (sox speed): a pure tone at f0 comes out at
    # f0 * factor, with the bulk of its energy still in one spectral peak
    f0 = 1000.0
    t = np.arange(RATE, dtype=np.float64) / RATE
    sig = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    for f in (0.9, 1.1):
        out = resample_signal(sig, f).astype(np.float64)
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * RATE / len(out)
        assert abs(peak_hz - f0 * f) < 5.0, (f, peak_hz)


def test_resample_antialiases_speedup():
    # for factor > 1 content above the new effective Nyquist must be
    # filtered out, not folded back (linear interp aliases it); 7.9 kHz
    # at sp1.1 would land at 8.69 kHz > Nyquist -> alias to ~7.3 kHz
    f0 = 7900.0
    t = np.arange(RATE, dtype=np.float64) / RATE
    sig = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = resample_signal(sig, 1.1).astype(np.float64)
    # energy of the anti-aliased output is tiny vs the input tone
    assert np.mean(out**2) < 1e-3 * np.mean(np.asarray(sig, np.float64) ** 2)


def test_resample_empty_and_tiny():
    assert len(resample_signal(np.zeros(0, np.float32), 0.9)) == 0
    out = resample_signal(np.ones(3, np.float32), 1.1)
    assert len(out) == int(round(3 / 1.1))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_expand_metadata(tmp_path):
    datadir = tmp_path / "data"
    featdir = tmp_path / "feat"
    datadir.mkdir()
    featdir.mkdir()
    (datadir / "utt2spk").write_text("u1 s1\nu2 s1\nu3 s2\n")
    (datadir / "text").write_text("u1 hello\nu2 a b\nu3 c\n")
    expand_metadata(str(datadir), str(featdir), (0.9, 1.0))

    u2s = read_utt2spk(str(featdir / "utt2spk"))
    assert u2s == {
        "sp0.9-u1": "sp0.9-s1",
        "sp0.9-u2": "sp0.9-s1",
        "sp0.9-u3": "sp0.9-s2",
        "u1": "s1",
        "u2": "s1",
        "u3": "s2",
    }
    s2u = read_spk2utt(str(featdir / "spk2utt"))
    assert sorted(s2u["sp0.9-s1"]) == ["sp0.9-u1", "sp0.9-u2"]
    assert sorted(s2u["s2"]) == ["u3"]
    text = dict(
        line.split(" ", 1) for line in (featdir / "text").read_text().splitlines()
    )
    assert text["sp0.9-u2"] == "a b"
    assert text["u2"] == "a b"


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sp_corpus")
    datadir = tmp / "data"
    datadir.mkdir()
    rng = np.random.default_rng(7)
    utts = {}
    for s in range(2):
        for u in range(2):
            utt = f"spk{s}_utt{u}"
            n = int(rng.integers(RATE // 4, RATE // 2))
            sig = (rng.standard_normal(n) * 5000).astype(np.int16)
            path = tmp / f"{utt}.wav"
            scipy.io.wavfile.write(path, RATE, sig)
            utts[utt] = str(path)
    (datadir / "wav.scp").write_text(
        "".join(f"{u} {p}\n" for u, p in utts.items())
    )
    (datadir / "utt2spk").write_text(
        "".join(f"{u} {u.split('_')[0]}\n" for u in utts)
    )
    (datadir / "spk2utt").write_text(
        "".join(
            f"spk{s} {' '.join(u for u in utts if u.startswith(f'spk{s}'))}\n"
            for s in range(2)
        )
    )
    (datadir / "text").write_text("".join(f"{u} hello world\n" for u in utts))
    return str(datadir), list(utts)


def _conf(**extra):
    conf = {
        "type": "fbank",
        "dynamic": "nodelta",
        "winlen": "0.025",
        "winstep": "0.01",
        "nfilt": "8",
        "nfft": "512",
        "lowfreq": "0",
        "highfreq": "-1",
        "preemph": "0.97",
        "include_energy": "False",
        "snip_edges": "True",
    }
    conf.update(extra)
    return conf


def test_prepare_data_three_way(tiny_corpus, tmp_path):
    datadir, utt_ids = tiny_corpus
    plain = str(tmp_path / "plain")
    sp = str(tmp_path / "sp")
    prepare_data(datadir, plain, _conf(), batch_size=3)
    prepare_data(
        datadir, sp, _conf(speed_perturb="0.9,1.0,1.1"), batch_size=3
    )

    with open(os.path.join(sp, "feats.scp")) as f:
        sp_keys = [line.split()[0] for line in f]
    assert len(sp_keys) == 3 * len(utt_ids)
    for utt in utt_ids:
        for pre in ("sp0.9-", "", "sp1.1-"):
            assert pre + utt in sp_keys

    plain_r = ArkReader(os.path.join(plain, "feats.scp"))
    sp_r = ArkReader(os.path.join(sp, "feats.scp"))
    for utt in utt_ids:
        base = plain_r.read_utt(utt)
        # the factor-1.0 copy is byte-identical to an unperturbed run
        np.testing.assert_array_equal(sp_r.read_utt(utt), base)
        # slower speed -> longer signal -> more frames (and vice versa)
        slow = sp_r.read_utt(f"sp0.9-{utt}")
        fast = sp_r.read_utt(f"sp1.1-{utt}")
        assert slow.shape[0] > base.shape[0] > fast.shape[0]
        assert slow.shape[1] == base.shape[1] == fast.shape[1]
    plain_r.close()

    # maxlength covers the longest (sp0.9) copy
    with open(os.path.join(sp, "maxlength")) as f:
        maxlength = int(f.read())
    assert maxlength == max(
        sp_r.read_utt(f"sp0.9-{u}").shape[0] for u in utt_ids
    )
    sp_r.close()

    # metadata expanded; CMVN runs over the prefixed speakers
    u2s = read_utt2spk(os.path.join(sp, "utt2spk"))
    assert len(u2s) == 3 * len(utt_ids)
    assert u2s["sp1.1-spk0_utt0"] == "sp1.1-spk0"
    compute_cmvn(sp)
    with open(os.path.join(sp, "cmvn.scp")) as f:
        cmvn_spks = [line.split()[0] for line in f]
    assert sorted(cmvn_spks) == sorted(
        pre + f"spk{s}" for pre in ("sp0.9-", "", "sp1.1-") for s in range(2)
    )
