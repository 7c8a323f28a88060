"""Endpoint detection (decode/endpoint.py) — rule semantics over blank
streams, chunking invariance, and the StreamingTranscriber wiring."""

import numpy as np
import pytest

from tfkaldi_tpu.decode.endpoint import (
    DEFAULT_RULES,
    EndpointConfig,
    EndpointRule,
    Endpointer,
)

BLANK = 9


def _ep(rules, frame_shift=0.01):
    e = Endpointer(EndpointConfig(tuple(rules), frame_shift), BLANK)
    return e


def _feed(ep, labels, chunk=None):
    """Feed a 1-row label stream, optionally split into chunks; returns
    the detection flag after the last update."""
    labels = np.asarray(labels, np.int32)
    chunk = chunk or len(labels)
    det = ep.detected()
    for pos in range(0, len(labels), chunk):
        part = labels[pos : pos + chunk][None, :]
        det = ep.update(part, np.asarray([part.shape[1]]))
    return bool(det[0])


def test_no_speech_rule():
    rule = EndpointRule(False, 5.0, 0.0)
    ep = _ep([rule])
    ep.reset(1)
    assert not _feed(ep, [BLANK] * 499)
    assert _feed(ep, [BLANK])  # 500 frames = 5.0 s


def test_after_speech_rule():
    rule = EndpointRule(True, 1.0, 0.0)
    ep = _ep([rule])
    ep.reset(1)
    # a long blank run with no speech never fires this rule
    assert not _feed(ep, [BLANK] * 300)
    # speech, then 1 s of trailing blanks fires it
    assert not _feed(ep, [3] + [BLANK] * 99)
    assert _feed(ep, [BLANK])


def test_speech_resets_trailing_silence():
    rule = EndpointRule(True, 0.5, 0.0)
    ep = _ep([rule])
    ep.reset(1)
    assert not _feed(ep, [3] + [BLANK] * 49)
    assert not _feed(ep, [4])  # speech resets the trailing counter
    assert not _feed(ep, [BLANK] * 49)
    assert _feed(ep, [BLANK])


def test_max_length_rule():
    rule = EndpointRule(False, 0.0, 20.0)
    ep = _ep([rule])
    ep.reset(1)
    # alternating speech keeps trailing silence at 0; length still fires
    stream = ([3, BLANK] * 1000)[:1999]
    assert not _feed(ep, stream, chunk=100)
    assert _feed(ep, [3])


def test_latching_and_reset():
    ep = _ep([EndpointRule(True, 0.1, 0.0)])
    ep.reset(2)
    labels = np.asarray([[3] + [BLANK] * 10, [BLANK] * 11], np.int32)
    det = ep.update(labels, np.asarray([11, 11]))
    assert det.tolist() == [True, False]
    # more speech does not clear a latched endpoint
    det = ep.update(np.full((2, 4), 3, np.int32), np.asarray([4, 4]))
    assert det.tolist() == [True, False]
    ep.reset(2)
    assert ep.detected().tolist() == [False, False]


def test_chunking_invariance():
    rng = np.random.default_rng(0)
    stream = rng.choice([BLANK, BLANK, BLANK, 2, 5], size=400).astype(np.int32)
    results = []
    for chunk in (1, 7, 100, 400):
        ep = _ep(list(DEFAULT_RULES), frame_shift=0.05)
        ep.reset(1)
        flags = []
        for pos in range(0, 400, chunk):
            part = stream[pos : pos + chunk][None, :]
            flags.append(ep.update(part, np.asarray([part.shape[1]]))[0])
        results.append((flags[-1], float(ep.trailing_silence_seconds()[0])))
    assert all(r == results[0] for r in results)


def test_n_valid_masks_padding():
    ep = _ep([EndpointRule(True, 0.05, 0.0)])
    ep.reset(1)
    # padding region contains speech labels that must be ignored
    labels = np.asarray([[3] + [BLANK] * 5 + [4, 4, 4, 4]], np.int32)
    det = ep.update(labels, np.asarray([6]))
    assert det[0]


def test_empty_update_and_errors():
    ep = _ep(list(DEFAULT_RULES))
    with pytest.raises(RuntimeError, match="reset"):
        ep.update(np.zeros((1, 0), np.int32), np.asarray([0]))
    ep.reset(1)
    det = ep.update(np.zeros((1, 0), np.int32), np.asarray([0]))
    assert not det[0]  # no frames seen -> nothing fires


def test_transcriber_endpointing_wiring():
    """All-blank model + short no-speech rule: the transcriber latches an
    endpoint mid-stream; without endpoint_config the query raises."""
    import jax

    from tfkaldi_tpu.decode import StreamingTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import GRU, RNNConfig

    rate = 8000
    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        rate,
    )
    blank = 7
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    # zero weights + a large blank bias: every frame decodes to blank
    params["out"]["w"] = params["out"]["w"] * 0.0
    params["out"]["b"] = params["out"]["b"].at[blank].set(10.0)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    cfg = EndpointConfig((EndpointRule(False, 0.3, 0.0),), frame_shift=0.01)
    tx = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), blank,
        endpoint_config=cfg,
    )
    tx.reset(1)
    rng = np.random.default_rng(1)
    fired_at = None
    # 0.8 s of audio in 0.1 s chunks; 0.3 s of blank frames ~ 0.33 s audio
    for i in range(8):
        chunk = rng.standard_normal((1, 800)).astype(np.float32) * 100
        tx.push(chunk, np.asarray([800]))
        if tx.endpointed()[0]:
            fired_at = i
            break
    assert fired_at is not None and 2 <= fired_at <= 4
    # latched across further pushes; reset clears
    tx.push(rng.standard_normal((1, 800)).astype(np.float32), np.asarray([800]))
    assert tx.endpointed()[0]
    tx.reset(1)
    assert not tx.endpointed()[0]

    tx2 = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), blank
    )
    tx2.reset(1)
    with pytest.raises(RuntimeError, match="endpoint_config"):
        tx2.endpointed()


def test_transcriber_endpoint_shift_follows_subsample():
    """A subsampling front-end stretches one decoder-output frame to
    subsample_factor feature steps; the default frame_shift must scale
    with it (an explicit non-default shift is kept verbatim)."""
    from tfkaldi_tpu.decode import StreamingTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        8000,
    )

    class _Cfg:
        bidirectional = False

    class _SubModel:
        subsample_factor = 4
        config = _Cfg()

    def make(cfg):
        return StreamingTranscriber(
            OnlineFeatureExtractor(ext), _SubModel(), {}, {}, None, 0,
            endpoint_config=cfg,
        )

    # class default 0.01 -> derived 0.04 on a subsample-4 model
    tx = make(EndpointConfig())
    assert tx._endpointer.config.frame_shift == pytest.approx(0.04)
    # an explicit user-set shift is honored unchanged
    tx = make(EndpointConfig(frame_shift=0.02))
    assert tx._endpointer.config.frame_shift == pytest.approx(0.02)
