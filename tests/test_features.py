"""Golden parity tests: TPU-batched frontend vs the actual reference code
(tests/reference_port — a mechanical Python-3 port of processing/{sigproc,base,feat,feature_reader}.py).

BASELINE.md target: features within 1e-4 of the reference.
"""

import numpy as np
import pytest

from tests import reference_port as refport
from tfkaldi_tpu.frontend import FeatureExtractor, FeatureOpts, apply_cmvn, cmvn_stats, splice

RATE = 16000


def _conf(**over):
    conf = {
        "type": "fbank",
        "dynamic": "nodelta",
        "winlen": "0.025",
        "winstep": "0.01",
        "nfilt": "40",
        "nfft": "512",
        "lowfreq": "0",
        "highfreq": "-1",
        "preemph": "0.97",
        "include_energy": "False",
        "snip_edges": "True",
        "numcep": "13",
        "ceplifter": "22",
    }
    conf.update({k: str(v) for k, v in over.items()})
    return conf


def _signals(rng, n, min_len=3000, max_len=18000):
    lens = rng.integers(min_len, max_len, size=n)
    return [
        (rng.standard_normal(l) * 8000).astype(np.int16).astype(np.float64) for l in lens
    ]


@pytest.mark.parametrize(
    "over",
    [
        {},  # AURORA4 dnn-features: 40-fbank
        {"type": "mfcc", "nfilt": 23, "numcep": 13},  # AURORA4 gmm-features
        {"type": "fbank", "include_energy": True},
        {"type": "mfcc", "include_energy": True, "ceplifter": 0},
        {"type": "fbank", "dynamic": "delta"},
        {"type": "fbank", "dynamic": "ddelta", "include_energy": True},
        {"type": "mfcc", "dynamic": "ddelta"},
        {"type": "ssc", "nfilt": 20},
        {"snip_edges": False},
        {"type": "fbank", "lowfreq": 100, "highfreq": 7000},
    ],
)
def test_feature_parity(over):
    conf = _conf(**over)
    rng = np.random.default_rng(7)
    sigs = _signals(rng, 6)
    opts = FeatureOpts.from_config(conf)
    fx = FeatureExtractor(opts, RATE)

    s_max = max(len(s) for s in sigs)
    batch = np.zeros((len(sigs), s_max), dtype=np.float32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    feats, nframes = fx(batch, np.asarray([len(s) for s in sigs]))
    feats = np.asarray(feats)

    for i, sig in enumerate(sigs):
        golden = refport.compute(sig, RATE, conf)
        assert int(nframes[i]) == golden.shape[0], f"frame count mismatch utt {i}"
        got = feats[i, : golden.shape[0]]
        assert got.shape == golden.shape
        np.testing.assert_allclose(got, golden, atol=1e-4, rtol=1e-4)
        # padding frames are zeroed
        assert np.all(feats[i, golden.shape[0] :] == 0)


def test_feature_dim_property():
    for over, expected in [
        ({}, 40),
        ({"include_energy": True}, 41),
        ({"type": "mfcc", "numcep": 13}, 13),
        ({"dynamic": "delta"}, 80),
        ({"dynamic": "ddelta", "include_energy": True}, 123),
    ]:
        assert FeatureOpts.from_config(_conf(**over)).dim == expected


def test_single_utt_compute_matches_batch():
    conf = _conf(dynamic="delta", include_energy=True)
    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(9000) * 5000).astype(np.int16).astype(np.float64)
    fx = FeatureExtractor(FeatureOpts.from_config(conf), RATE)
    single = fx.compute(sig)
    golden = refport.compute(sig, RATE, conf)
    np.testing.assert_allclose(single, golden, atol=1e-4, rtol=1e-4)


def test_short_utterance_edge_cases():
    """Signals shorter than one window still produce one (zero-padded) frame."""
    conf = _conf()
    fx = FeatureExtractor(FeatureOpts.from_config(conf), RATE)
    for length in [100, 399, 400, 401, 560, 561]:
        sig = np.linspace(-1000, 1000, length)
        golden = refport.compute(sig, RATE, conf)
        got = fx.compute(sig)
        assert got.shape == golden.shape, f"len={length}"
        np.testing.assert_allclose(got, golden, atol=1e-4, rtol=1e-4)


def test_cmvn_parity():
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((50, 13)) * 4 + 2
    stats = cmvn_stats(feats)
    # layout: row0 = [Σx, N], row1 = [Σx², 0]  (prepare_data.py:113-118)
    np.testing.assert_allclose(stats[0, :-1], feats.sum(0))
    np.testing.assert_allclose(stats[1, :-1], np.square(feats).sum(0))
    assert stats[0, -1] == 50 and stats[1, -1] == 0
    got = np.asarray(apply_cmvn(feats.astype(np.float32), stats))
    golden = refport.feature_reader.apply_cmvn(feats, stats)
    np.testing.assert_allclose(got, golden, atol=1e-4)


def test_cmvn_stats_batched_equals_concat():
    rng = np.random.default_rng(6)
    a, b = rng.standard_normal((10, 5)), rng.standard_normal((7, 5))
    batch = np.zeros((2, 10, 5))
    batch[0] = a
    batch[1, :7] = b
    stats = cmvn_stats(batch, num_frames=[10, 7])
    np.testing.assert_allclose(stats, cmvn_stats(np.concatenate([a, b])), atol=1e-10)


def test_splice_parity():
    rng = np.random.default_rng(8)
    utt = rng.standard_normal((20, 4)).astype(np.float32)
    for c in [0, 1, 2, 5]:
        got = np.asarray(splice(utt, c))
        golden = refport.feature_reader.splice(utt, c) if c > 0 else utt
        np.testing.assert_allclose(got, golden, atol=0)


def test_splice_batched_matches_single():
    rng = np.random.default_rng(9)
    batch = rng.standard_normal((3, 12, 5)).astype(np.float32)
    got = np.asarray(splice(batch, 2))
    for i in range(3):
        np.testing.assert_allclose(got[i], np.asarray(splice(batch[i], 2)))


def test_high_path_tracks_exact_f64():
    """The default 'high' path (Veltkamp-split double-float DFT with
    chunked-f64 accumulation) stays within the 1e-4 parity gate of the
    'exact' emulated-f64 path even on the worst amplifier (mfcc + ddelta),
    at a fraction of the cost."""
    rng = np.random.default_rng(1)
    conf = _conf(type="mfcc", dynamic="ddelta", include_energy=True, nfilt=23)
    opts = FeatureOpts.from_config(conf)
    sig = (rng.standard_normal(24000) * 800).astype(np.float32)
    exact = FeatureExtractor(opts, RATE, "exact").compute(sig)
    high = FeatureExtractor(opts, RATE, "high").compute(sig)
    assert high.shape == exact.shape
    err = np.abs(high - exact) / np.maximum(np.abs(exact), 1.0)
    assert err.max() < 1e-4, float(err.max())


def test_double_float_split_invariants():
    """The trunc-12 double-float split (a, b, lo) used by the TPU 'high'
    DFT: a carries ≤12 significand bits (so a*a' products are exact in
    f32), a+b reconstructs f32(m) exactly, and a+b+lo reconstructs the
    float64 value to ≤2^-36 relative."""
    import jax

    from tfkaldi_tpu.frontend.features import _df_split_np, _df_split_traced

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    m = np.concatenate(
        [rng.standard_normal(500) * 10.0 ** rng.integers(-20, 20, 500), [0.0, 1.0, -1.0]]
    )
    with jax.enable_x64():
        traced = jax.tree.map(np.asarray, _df_split_traced(jnp.asarray(m)))
    for name, (a, b, lo) in {"np": _df_split_np(m), "traced": traced}.items():
        a, b, lo = np.asarray(a), np.asarray(b), np.asarray(lo)
        # a has at most 12 significand bits: low 12 mantissa bits are zero
        assert (a.view(np.int32) & 0xFFF == 0).all(), name
        np.testing.assert_array_equal(a + b, m.astype(np.float32), err_msg=name)
        recon = a.astype(np.float64) + b.astype(np.float64) + lo.astype(np.float64)
        err = np.abs(recon - m) / np.maximum(np.abs(m), np.finfo(np.float64).tiny)
        assert err.max() < 2.0**-35, (name, float(err.max()))


def test_df_matmul_accuracy():
    """`_df_matmul` (the split scheme behind the TPU 'high' DFT and mel
    matmuls) tracks a float64 matmul to ~aa_chunk·2^-24 relative on a
    positive contraction, and tightening aa_chunk tightens the bound —
    the property the mel stage's aa_chunk=16 relies on to survive the
    36x double-delta error amplification."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.frontend.features import _df_matmul, _df_split_traced

    rng = np.random.default_rng(5)
    # positive lhs with a large dynamic range (like a power spectrum) and a
    # sparse nonnegative basis (like a mel filterbank)
    lhs = (10.0 ** rng.uniform(-6, 6, (4, 37, 257))) * rng.uniform(0.5, 2.0, (4, 37, 257))
    basis = np.maximum(rng.uniform(-0.5, 1.0, (257, 40)), 0.0)
    want = lhs @ basis
    with jax.enable_x64():
        split = _df_split_traced(jnp.asarray(lhs))
        errs = {}
        for chunk in (128, 16):
            got = np.asarray(_df_matmul(split, basis, aa_chunk=chunk))
            errs[chunk] = float(
                (np.abs(got - want) / np.maximum(np.abs(want), np.finfo(np.float64).tiny)).max()
            )
    # worst-case bound is aa_chunk·2^-24; allow 2x slack for the correction
    # terms' own rounding
    assert errs[128] < 2 * 128 * 2.0**-24, errs
    assert errs[16] < 2 * 16 * 2.0**-24, errs
    assert errs[16] <= errs[128] or errs[128] < 4 * 2.0**-24, errs


def test_fast_spectrum_path_close_to_high():
    """The f32 'fast' spectrum path tracks the f64 'high' path within its
    documented tolerance (log-domain ~1e-3 worst-case per bin; the mel
    aggregation keeps typical feature error far below that)."""
    rng = np.random.default_rng(0)
    conf = {
        "type": "mfcc", "dynamic": "delta", "winlen": "0.025", "winstep": "0.01",
        "nfilt": "23", "nfft": "512", "lowfreq": "0", "highfreq": "-1",
        "preemph": "0.97", "include_energy": "True", "snip_edges": "True",
        "numcep": "13", "ceplifter": "22",
    }
    opts = FeatureOpts.from_config(conf)
    sig = (rng.standard_normal(16000) * 800).astype(np.float32)
    high = FeatureExtractor(opts, 16000, "high").compute(sig)
    fast = FeatureExtractor(opts, 16000, "fast").compute(sig)
    assert fast.shape == high.shape
    err = np.abs(fast - high) / np.maximum(np.abs(high), 1.0)
    # bounds cover the TPU's bf16x6 HIGHEST rounding (measured on v5e:
    # max 2.1e-3, p99 9.1e-4 — CPU f32 is ~2x tighter)
    assert err.max() < 5e-3, float(err.max())
    assert np.quantile(err, 0.99) < 2e-3, float(np.quantile(err, 0.99))
