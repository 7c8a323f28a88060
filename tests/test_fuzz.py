"""Property/fuzz tests: ark round-trips over random shapes and feature
parity over randomized configurations (seeded — deterministic in CI)."""

import numpy as np
import pytest

from tests import reference_port as refport
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.io import ArkReader, ArkWriter

RATE = 16000


def test_ark_roundtrip_fuzz(tmp_path):
    rng = np.random.default_rng(0)
    mats = {}
    with ArkWriter(str(tmp_path / "f.scp"), str(tmp_path / "f.ark")) as w:
        for i in range(40):
            rows = int(rng.integers(1, 400))
            cols = int(rng.integers(1, 100))
            key = f"u{i}_{'x' * int(rng.integers(0, 30))}"
            mat = (
                rng.standard_normal((rows, cols)) * 10.0 ** float(rng.integers(-3, 4))
            ).astype(np.float32)
            mats[key] = mat
            w.write_next_utt(key, mat)
    r = ArkReader(str(tmp_path / "f.scp"))
    assert r.utt_ids == list(mats)
    # random access in shuffled order must be byte-exact
    order = list(mats)
    rng.shuffle(order)
    for key in order:
        np.testing.assert_array_equal(r.read_utt(key), mats[key])
    # sequential read loops exactly at the end
    for i, key in enumerate(mats):
        utt_id, mat, looped = r.read_next_utt()
        assert utt_id == key and not looped
        np.testing.assert_array_equal(mat, mats[key])
    assert r.read_next_utt()[2] is True  # loop-around flag


@pytest.mark.parametrize("trial", range(6))
def test_feature_parity_random_configs(trial, tmp_path):
    """Batched device features vs the ported reference oracle
    (tests/reference_port) under randomized
    config draws (type, dynamics, filterbank geometry, windows, energy,
    snip_edges) at the 1e-4 gate."""
    rng = np.random.default_rng(1000 + trial)
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
    opts = FeatureOpts.from_config(conf)
    ex = FeatureExtractor(opts, RATE, "high")

    sigs = [
        (rng.standard_normal(int(rng.integers(RATE // 8, RATE // 2))) * 800).astype(
            np.float32
        )
        for _ in range(3)
    ]
    s_pad = max(len(s) for s in sigs)
    batch = np.zeros((len(sigs), s_pad), np.float32)
    lengths = np.zeros(len(sigs), np.int64)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    feats, num_frames = ex(batch, lengths)
    feats = np.asarray(feats)

    for i, s in enumerate(sigs):
        want = refport.compute(s.astype(np.float64), RATE, conf)
        got = feats[i, : int(num_frames[i])]
        assert got.shape == want.shape, (conf, got.shape, want.shape)
        scale = np.maximum(np.abs(want), 1.0)
        err = np.abs(got - want) / scale
        assert err.max() <= 1e-4, (conf, float(err.max()))


def test_double_matrix_ark_roundtrip(tmp_path):
    """'DM' (float64) records — e.g. Kaldi compute-cmvn-stats output — read
    identically through the Python reader and the native bulk loader."""
    import struct

    from tfkaldi_tpu.io import native

    rng = np.random.default_rng(3)
    mats = {f"u{i}": rng.standard_normal((int(rng.integers(2, 30)), 7)) for i in range(5)}
    ark, scp = tmp_path / "d.ark", tmp_path / "d.scp"
    with open(ark, "wb") as f, open(scp, "w") as s:
        for key, mat in mats.items():
            f.write(key.encode() + b" ")
            offset = f.tell()
            f.write(b"\x00BDM ")
            f.write(struct.pack("<bi", 4, mat.shape[0]))
            f.write(struct.pack("<bi", 4, mat.shape[1]))
            f.write(mat.astype("<f8").tobytes())
            s.write(f"{key} {ark}:{offset}\n")

    r = ArkReader(str(scp))
    for key, mat in mats.items():
        got = r.read_utt(key)
        assert got.dtype == np.float64
        np.testing.assert_array_equal(got, mat)

    if native.available():
        offsets = [r.scp_data[i][1] for i in range(len(mats))]
        max_rows = max(m.shape[0] for m in mats.values())
        out, rows = native.read_batch(str(ark), offsets, max_rows, 7)
        for i, (key, mat) in enumerate(mats.items()):
            assert rows[i] == mat.shape[0]
            np.testing.assert_allclose(out[i, : rows[i]], mat.astype(np.float32), rtol=1e-6)
