"""Streaming feature extraction: chunked == offline whole-utterance.

frontend/online.py::OnlineFeatureExtractor against the offline batched
FeatureExtractor, across chunkings, snip modes, feature types, ragged
per-row lengths, and the end-of-utterance flush geometry.
"""

import numpy as np
import pytest

from tfkaldi_tpu.frontend import FeatureExtractor, FeatureOpts, OnlineFeatureExtractor

RATE = 16000


def _signals(rng, lengths, padded):
    sig = (rng.standard_normal((len(lengths), padded)) * 3000).astype(np.int16)
    sig = sig.astype(np.float32)
    for row, n in enumerate(lengths):
        sig[row, n:] = 0
    return sig


def _stream(online, sig, lengths, chunk):
    """Run the stream; returns per-row trimmed feature matrices."""
    b, padded = sig.shape
    online.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, padded, chunk):
        c = sig[:, pos : pos + chunk]
        cl = np.clip(lengths - pos, 0, c.shape[1])
        feats, nnew = online.step(c, cl)
        for row in range(b):
            got[row].append(feats[row, : nnew[row]])
    feats, nnew = online.flush()
    for row in range(b):
        got[row].append(feats[row, : nnew[row]])
    return [np.concatenate(g, axis=0) for g in got]


@pytest.mark.parametrize("snip", [True, False])
@pytest.mark.parametrize("chunk", [160, 1000, 7777])
def test_stream_matches_offline_fbank_high(snip, chunk):
    """High-precision streamed frames are BIT-IDENTICAL to the offline
    batch: identical preemphasis dtype/op, identical frame set, and the
    shared _frames_to_feats tail."""
    opts = FeatureOpts(
        feature_type="fbank", dynamic="nodelta", snip_edges=snip, include_energy=True
    )
    ext = FeatureExtractor(opts, RATE, spectrum_precision="high")
    rng = np.random.default_rng(1)
    lengths = np.asarray([16000, 9137, 300, 0])  # short row + empty row
    sig = _signals(rng, lengths, 16000)

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    got = _stream(OnlineFeatureExtractor(ext), sig, lengths, chunk)
    for row in range(len(lengths)):
        assert got[row].shape[0] == off_nf[row]
        np.testing.assert_array_equal(got[row], off_feats[row, : off_nf[row]])


@pytest.mark.parametrize("ftype", ["mfcc", "ssc"])
def test_stream_matches_offline_other_types(ftype):
    opts = FeatureOpts(feature_type=ftype, dynamic="nodelta", snip_edges=True)
    ext = FeatureExtractor(opts, RATE, spectrum_precision="high")
    rng = np.random.default_rng(2)
    lengths = np.asarray([12000, 5000])
    sig = _signals(rng, lengths, 12000)
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    got = _stream(OnlineFeatureExtractor(ext), sig, lengths, 1600)
    for row in range(len(lengths)):
        np.testing.assert_array_equal(got[row], off_feats[row, : off_nf[row]])


def test_stream_fast_mode_close():
    """f32 mode: the offline jit and the chunked jits may fuse/tile the
    f32 contractions differently, so equality is approximate — but well
    inside the fast mode's own ~1e-3 documented error band."""
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta")
    ext = FeatureExtractor(opts, RATE, spectrum_precision="fast")
    rng = np.random.default_rng(3)
    lengths = np.asarray([8000, 8000])
    sig = _signals(rng, lengths, 8000)
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    got = _stream(OnlineFeatureExtractor(ext), sig, lengths, 900)
    for row in range(len(lengths)):
        np.testing.assert_allclose(
            got[row], off_feats[row, : off_nf[row]], atol=1e-4, rtol=0
        )


def test_stream_rows_advance_at_different_rates():
    """Rows are independent streams: feeding one row in dribbles while
    the other gets the whole signal up front changes nothing."""
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta")
    ext = FeatureExtractor(opts, RATE)
    rng = np.random.default_rng(4)
    lengths = np.asarray([6000, 6000])
    sig = _signals(rng, lengths, 6000)
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))

    online = OnlineFeatureExtractor(ext)
    online.reset(2)
    got = [[] for _ in range(2)]
    # row 0: everything in chunk one; row 1: 250-sample dribbles
    for pos in range(0, 6000, 250):
        c = np.zeros((2, 250), np.float32)
        cl = np.zeros((2,), np.int64)
        if pos == 0:
            c0 = sig[0]  # row 0 all at once via a ragged first call
        c[1] = sig[1, pos : pos + 250]
        cl[1] = 250
        if pos == 0:
            feats, nnew = online.step(
                np.stack([c0, np.pad(sig[1, :250], (0, 5750))]),
                np.asarray([6000, 250]),
            )
        else:
            feats, nnew = online.step(c, cl)
        for row in range(2):
            got[row].append(feats[row, : nnew[row]])
    feats, nnew = online.flush()
    for row in range(2):
        got[row].append(feats[row, : nnew[row]])
    for row in range(2):
        g = np.concatenate(got[row], axis=0)
        np.testing.assert_array_equal(g, off_feats[row, : off_nf[row]])


def test_stream_requires_reset_and_nodelta():
    ext = FeatureExtractor(FeatureOpts(dynamic="nodelta"), RATE)
    online = OnlineFeatureExtractor(ext)
    with pytest.raises(RuntimeError, match="reset"):
        online.step(np.zeros((1, 100), np.float32), np.asarray([100]))
    with pytest.raises(RuntimeError, match="reset"):
        online.flush()
    with pytest.raises(ValueError, match="OnlineDynamicExtractor"):
        OnlineFeatureExtractor(FeatureExtractor(FeatureOpts(dynamic="ddelta"), RATE))


def test_stream_flush_is_terminal():
    ext = FeatureExtractor(FeatureOpts(dynamic="nodelta"), RATE)
    online = OnlineFeatureExtractor(ext)
    online.reset(1)
    online.step(np.zeros((1, 1000), np.float32), np.asarray([1000]))
    online.flush()
    with pytest.raises(RuntimeError, match="reset"):
        online.step(np.zeros((1, 100), np.float32), np.asarray([100]))


def test_wav_to_text_streaming_equals_offline_pipeline():
    """Capstone: raw audio chunks → OnlineFeatureExtractor → CMVN →
    OnlineCTCDecoder produces exactly the label stream of the offline
    pipeline (batched FeatureExtractor → CMVN → CTCDecoder best-path)."""
    import jax

    from tfkaldi_tpu.decode import CTCDecoder
    from tfkaldi_tpu.decode.online import OnlineCTCDecoder
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats
    from tfkaldi_tpu.models import GRU, RNNConfig

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")

    rng = np.random.default_rng(5)
    lengths = np.asarray([8000, 5003])
    sig = _signals(rng, lengths, 8000)

    # offline arm
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    blank = 7
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline_ids = CTCDecoder(model, params, state, _IdCoder(), blank).decode_batch(
        off_norm, off_nf
    )

    # online arm: 1000-sample audio chunks through the whole chain
    online = OnlineFeatureExtractor(ext)
    online.reset(2)
    dec = OnlineCTCDecoder(model, params, state, blank)
    dec.reset(2)
    got = [[] for _ in range(2)]

    def _push(feats, nnew):
        norm = np.asarray(apply_cmvn(feats, stats)).astype(np.float32)
        for row, ids in enumerate(dec.step(norm, nnew)):
            got[row].extend(ids.tolist())

    for pos in range(0, 8000, 1000):
        c = sig[:, pos : pos + 1000]
        cl = np.clip(lengths - pos, 0, c.shape[1])
        _push(*online.step(c, cl))
    _push(*online.flush())

    for row in range(2):
        np.testing.assert_array_equal(
            np.asarray(got[row], np.int32), offline_ids[row]
        )


@pytest.mark.parametrize("beam_width", [1, 8])
def test_streaming_transcriber_equals_offline(beam_width):
    """StreamingTranscriber (audio chunks -> features -> CMVN -> CTC) ends
    at exactly the offline pipeline's transcripts, greedy and beam."""
    import jax

    from tfkaldi_tpu.decode import CTCDecoder, StreamingTranscriber
    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder  # noqa: F401
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import GRU, RNNConfig

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")

    rng = np.random.default_rng(11)
    lengths = np.asarray([8000, 5003])
    sig = _signals(rng, lengths, 8000)

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    blank = 7
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline_ids = CTCDecoder(
        model, params, state, _IdCoder(), blank, beam_width=beam_width
    ).decode_batch(off_norm, off_nf)
    offline_text = [_IdCoder().decode(ids) for ids in offline_ids]

    tx = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), blank,
        cmvn=stats, beam_width=beam_width,
    )
    tx.reset(2)
    for pos in range(0, 8000, 1000):
        c = sig[:, pos : pos + 1000]
        cl = np.clip(lengths - pos, 0, c.shape[1])
        partial = tx.push(c, cl)
        assert len(partial) == 2  # partials available mid-stream
    final = tx.finish()
    assert final == offline_text


def test_streaming_transcriber_requires_reset():
    import jax

    from tfkaldi_tpu.decode import StreamingTranscriber
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import GRU, RNNConfig

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        8000,
    )
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    tx = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), 7
    )
    with pytest.raises(RuntimeError, match="reset"):
        tx.push(np.zeros((1, 100), np.float32), np.asarray([100]))
    with pytest.raises(RuntimeError, match="reset"):
        tx.finish()


# ----------------------------------------------------------------------
# streaming delta / double-delta (OnlineDynamicExtractor)
# ----------------------------------------------------------------------


@pytest.mark.parametrize("dynamic", ["delta", "ddelta"])
@pytest.mark.parametrize("chunk", [160, 1000, 7777])
def test_dynamic_stream_matches_offline(dynamic, chunk):
    """Streamed delta/ddelta features equal the offline batch in high
    precision: the STATIC columns are bit-identical after the f32 cast;
    the derivative columns carry ≤ a few f64 ulps of noise because the
    f64 statics differ by ~1 ulp between differently-shaped compiled
    programs (f64 matmul reduction order) — invisible after the f32 cast
    everywhere except the derivative's exact-cancellation frames
    (|true value| ~ 0), where the noise IS the value. Verified by
    feeding the streamed f64 statics through the full-shape dynamics fn:
    the tiny diff persists, so it is not a windowing artifact. Hence
    exact statics + tiny-atol dynamics."""
    from tfkaldi_tpu.frontend import OnlineDynamicExtractor

    ext = FeatureExtractor(
        FeatureOpts(feature_type="mfcc", dynamic=dynamic, nfilt=20, numcep=13),
        RATE, spectrum_precision="high",
    )
    rng = np.random.default_rng(31)
    lengths = np.asarray([16000, 9973, 400])
    sig = _signals(rng, lengths, 16000)

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    online = OnlineDynamicExtractor(ext)
    assert online.dim == off_feats.shape[2]
    sdim = online._static.dim
    got = _stream(online, sig, lengths, chunk)
    for row in range(len(lengths)):
        assert got[row].shape[0] == off_nf[row]
        want = off_feats[row, : off_nf[row]]
        np.testing.assert_array_equal(got[row][:, :sdim], want[:, :sdim])
        np.testing.assert_allclose(
            got[row][:, sdim:], want[:, sdim:], rtol=1e-7, atol=1e-10
        )


def test_dynamic_stream_fast_mode_close():
    from tfkaldi_tpu.frontend import OnlineDynamicExtractor

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="delta", nfilt=12),
        RATE, spectrum_precision="fast",
    )
    rng = np.random.default_rng(32)
    lengths = np.asarray([8000, 5000])
    sig = _signals(rng, lengths, 8000)
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    got = _stream(OnlineDynamicExtractor(ext), sig, lengths, 1000)
    for row in range(len(lengths)):
        np.testing.assert_allclose(
            got[row], off_feats[row, : off_nf[row]], rtol=2e-4, atol=2e-4
        )


def test_dynamic_stream_short_utterance_and_guards():
    """A shorter-than-lookahead utterance emits everything at flush with
    the right reflections; guards mirror the static extractor's."""
    from tfkaldi_tpu.frontend import OnlineDynamicExtractor

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="ddelta", nfilt=8),
        RATE, spectrum_precision="high",
    )
    rng = np.random.default_rng(33)
    lengths = np.asarray([720])  # ~3 frames < lookahead 4
    sig = _signals(rng, lengths, 720)
    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    got = _stream(OnlineDynamicExtractor(ext), sig, lengths, 100)
    assert got[0].shape[0] == off_nf[0]
    np.testing.assert_array_equal(got[0], off_feats[0, : off_nf[0]])

    with pytest.raises(ValueError, match="nodelta"):
        OnlineDynamicExtractor(FeatureExtractor(FeatureOpts(dynamic="nodelta"), RATE))
    online = OnlineDynamicExtractor(ext)
    with pytest.raises(RuntimeError, match="reset"):
        online.step(np.zeros((1, 100), np.float32), np.asarray([100]))
    with pytest.raises(RuntimeError, match="reset"):
        online.flush()


@pytest.mark.parametrize("beam_width", [1, 4])
def test_streaming_transcriber_subsampled_conformer(beam_width):
    """Audio chunks through the SUBSAMPLED causal conformer: the feature
    flush chains into the encoder flush (the front-end's final partial
    group), ending at exactly the offline pipeline's transcripts."""
    import jax

    from tfkaldi_tpu.decode import CTCDecoder, StreamingTranscriber
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import Transformer, TransformerConfig

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")

    rng = np.random.default_rng(21)
    lengths = np.asarray([6000, 4403])
    sig = _signals(rng, lengths, 6000)

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    blank = 7
    model = Transformer(TransformerConfig(
        input_dim=10, num_labels=8, num_blocks=2, d_model=12, num_heads=2,
        ffn_dim=16, conformer=True, conv_kernel=3, causal_conv=True,
        left_context=6, right_context=0, subsample=2,
    ))
    params, state = model.init(jax.random.PRNGKey(2))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(3), params["out"]["w"].shape) * 0.5
    )

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline_ids = CTCDecoder(
        model, params, state, _IdCoder(), blank, beam_width=beam_width
    ).decode_batch(off_norm, off_nf)
    offline_text = [_IdCoder().decode(ids) for ids in offline_ids]

    tx = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), blank,
        cmvn=stats, beam_width=beam_width,
    )
    tx.reset(2)
    for pos in range(0, 6000, 900):
        c = sig[:, pos : pos + 900]
        cl = np.clip(lengths - pos, 0, c.shape[1])
        tx.push(c, cl)
    assert tx.finish() == offline_text
