"""Streaming label timestamps (CTC and transducer).

``StreamingTranscriber.timestamps()`` (greedy CTC) reports each
committed label's emission time: the start of the decoder output frame
whose argmax first produced it. ``StreamingTransducerTranscriber``
exposes the same surface off the transducer lattice's own alignment
(the encoder frame whose joint step emitted the label). Contracts under
test: equality to the offline alignment, invariance to audio chunking,
subsample-factor frame scaling, and the per-slot lifecycle (timestamps
restart at zero after ``reset_rows``).

(Beyond the reference: its decoder emits likelihood matrices only,
neuralNetworks/decoder.py:50-77 — no alignment surface exists there.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.decode import StreamingTranscriber
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
from tfkaldi_tpu.models import GRU, RNNConfig, Transformer, TransformerConfig

RATE = 8000
BLANK = 7


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _extractor():
    return FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        RATE,
    )


def _gru():
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )
    return model, params, state


def _offline_alignment(model, params, state, feats, blank):
    """Oracle: offline argmax path -> (label ids, first frame of each
    emitted run) with the streaming collapse semantics (prev = -1)."""
    logits, _ = model.apply(
        params, state, jnp.asarray(feats[None, :]),
        jnp.asarray([feats.shape[0]], jnp.int32), train=False,
    )
    p = np.asarray(jnp.argmax(logits[0], axis=-1))
    keep = np.ones(p.shape[0], bool)
    keep[1:] = p[1:] != p[:-1]
    idx = np.flatnonzero(keep)
    collapsed = p[idx]
    nonblank = collapsed != blank
    return collapsed[nonblank].astype(np.int32), idx[nonblank]


def _stream(model, params, state, audio, chunk):
    tx = StreamingTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state,
        _IdCoder(), BLANK,
    )
    tx.reset(1)
    for pos in range(0, len(audio), chunk):
        c = audio[pos : pos + chunk][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    final = tx.finish()[0]
    return tx, final


def test_timestamps_match_offline_alignment_and_chunking_invariant():
    model, params, state = _gru()
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(7000).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    ids, frames = _offline_alignment(
        model, params, state, feats[0, : int(n[0])], BLANK
    )

    tx_a, final_a = _stream(model, params, state, audio, 1000)
    tx_b, final_b = _stream(model, params, state, audio, 333)
    assert final_a == final_b == _IdCoder().decode(ids)
    times_a = tx_a.timestamps()[0]
    times_b = tx_b.timestamps()[0]
    expected = frames * tx_a.frame_seconds
    np.testing.assert_allclose(times_a, expected, rtol=0, atol=0)
    np.testing.assert_allclose(times_b, expected, rtol=0, atol=0)
    assert len(times_a) == len(final_a.split()) if final_a else True
    # winstep 0.01 s, subsample 1
    assert tx_a.frame_seconds == pytest.approx(0.01)


def test_timestamps_subsampled_conformer_frame_scaling():
    """Under a subsample-2 causal conformer each decoder frame spans two
    feature frames: frame_seconds doubles and timestamps stay
    chunking-invariant (the finish() flush emits the ceil tail group)."""
    extra = dict(
        num_blocks=2, d_model=16, num_heads=2, ffn_dim=24, conv_kernel=3,
        subsample=2, left_context=4, right_context=0, causal_conv=True,
        conformer=True,
    )
    model = Transformer(TransformerConfig(
        input_dim=10, num_labels=8, **extra,
    ))
    params, state = model.init(jax.random.PRNGKey(11))

    rng = np.random.default_rng(5)
    audio = rng.standard_normal(6000).astype(np.float32)
    tx_a, final_a = _stream(model, params, state, audio, 900)
    tx_b, final_b = _stream(model, params, state, audio, 250)
    assert final_a == final_b
    assert tx_a.frame_seconds == pytest.approx(0.02)
    np.testing.assert_allclose(tx_a.timestamps()[0], tx_b.timestamps()[0])
    t = tx_a.timestamps()[0]
    # every timestamp sits on a decoder-frame boundary
    np.testing.assert_allclose(t / 0.02, np.round(t / 0.02), atol=1e-9)


def test_timestamps_per_slot_lifecycle():
    """finish_rows leaves the finished row's timestamps readable;
    reset_rows restarts its clock at zero while the other row's
    accumulated alignment is untouched."""
    model, params, state = _gru()
    rng = np.random.default_rng(9)
    a0 = rng.standard_normal(4000).astype(np.float32)
    a1 = rng.standard_normal(8000).astype(np.float32)

    tx = StreamingTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state,
        _IdCoder(), BLANK,
    )
    tx.reset(2)
    for pos in range(0, len(a1), 1000):
        chunk = np.zeros((2, 1000), np.float32)
        ln = np.zeros((2,), np.int64)
        if pos < len(a0):
            p0 = a0[pos : pos + 1000]
            chunk[0, : len(p0)] = p0
            ln[0] = len(p0)
        p1 = a1[pos : pos + 1000]
        chunk[1, : len(p1)] = p1
        ln[1] = len(p1)
        tx.push(chunk, ln)
        if pos + 1000 >= len(a0) and pos < len(a0):
            tx.finish_rows([0])
            t_row0 = tx.timestamps()[0]
            # equals an independent batch-1 run of the same audio
            solo, _ = _stream(model, params, state, a0, 1000)
            np.testing.assert_allclose(t_row0, solo.timestamps()[0])
            tx.reset_rows([0])
            assert tx.timestamps()[0].size == 0
    tx.finish_rows([1])
    solo1, _ = _stream(model, params, state, a1, 1000)
    np.testing.assert_allclose(tx.timestamps()[1], solo1.timestamps()[0])


def _stream_beam(model, params, state, audio, chunk, beam_width=4):
    tx = StreamingTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state,
        _IdCoder(), BLANK, beam_width=beam_width,
    )
    tx.reset(1)
    for pos in range(0, len(audio), chunk):
        c = audio[pos : pos + chunk][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    final = tx.finish()[0]
    return tx, final


def test_timestamps_beam_match_offline_and_chunking_invariant():
    """Beam-mode timestamps/confidences are the best hypothesis' label-
    time backtrace: equal to the offline prefix-beam's alignment
    (ctc_beam_search_py return_alignment) on the whole utterance, at any
    chunking. Timestamps are exact (integer frame indices); confidences
    carry f32 log-softmax noise across chunk shapes (rtol 1e-5)."""
    from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py

    model, params, state = _gru()
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(7000).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    logits, _ = model.apply(
        params, state, jnp.asarray(feats),
        jnp.asarray(n, jnp.int32), train=False,
    )
    lp = np.asarray(
        jax.nn.log_softmax(logits[0, : int(n[0])].astype(jnp.float32), axis=-1)
    )
    ids, frames, confs = ctc_beam_search_py(lp, BLANK, 4, return_alignment=True)

    tx_a, final_a = _stream_beam(model, params, state, audio, 1000)
    tx_b, final_b = _stream_beam(model, params, state, audio, 333)
    assert final_a == final_b == _IdCoder().decode(ids)
    expected = frames * tx_a.frame_seconds
    np.testing.assert_allclose(tx_a.timestamps()[0], expected, rtol=0, atol=0)
    np.testing.assert_allclose(tx_b.timestamps()[0], expected, rtol=0, atol=0)
    np.testing.assert_allclose(tx_a.confidences()[0], confs, rtol=1e-5)
    np.testing.assert_allclose(tx_b.confidences()[0], confs, rtol=1e-5)
    # aligned label for label with the transcript, monotone, in (0, 1]
    assert len(tx_a.timestamps()[0]) == len(final_a.split())
    assert np.all(np.diff(tx_a.timestamps()[0]) >= 0)
    assert np.all(tx_a.confidences()[0] > 0)
    assert np.all(tx_a.confidences()[0] <= 1)


def test_timestamps_beam_per_slot_lifecycle():
    """Beam mode through the per-slot primitives: finish_rows leaves the
    finished row's backtrace readable and equal to an independent batch-1
    beam run; reset_rows restarts its clock."""
    model, params, state = _gru()
    rng = np.random.default_rng(29)
    a0 = rng.standard_normal(4000).astype(np.float32)
    a1 = rng.standard_normal(8000).astype(np.float32)

    tx = StreamingTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state,
        _IdCoder(), BLANK, beam_width=4,
    )
    tx.reset(2)
    for pos in range(0, len(a1), 1000):
        chunk = np.zeros((2, 1000), np.float32)
        ln = np.zeros((2,), np.int64)
        if pos < len(a0):
            p0 = a0[pos : pos + 1000]
            chunk[0, : len(p0)] = p0
            ln[0] = len(p0)
        p1 = a1[pos : pos + 1000]
        chunk[1, : len(p1)] = p1
        ln[1] = len(p1)
        tx.push(chunk, ln)
        if pos + 1000 >= len(a0) and pos < len(a0):
            tx.finish_rows([0])
            solo, _ = _stream_beam(model, params, state, a0, 1000)
            np.testing.assert_allclose(tx.timestamps()[0], solo.timestamps()[0])
            np.testing.assert_allclose(
                tx.confidences()[0], solo.confidences()[0], rtol=1e-5
            )
            tx.reset_rows([0])
            assert tx.timestamps()[0].size == 0
    tx.finish_rows([1])
    solo1, _ = _stream_beam(model, params, state, a1, 1000)
    np.testing.assert_allclose(tx.timestamps()[1], solo1.timestamps()[0])


# -- transducer -----------------------------------------------------------


def _transducer(input_dim=10, subsample=1):
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    if subsample == 1:
        cfg = TransducerConfig(
            input_dim=input_dim, num_labels=4, enc_layers=1, enc_units=16,
            pred_layers=1, pred_units=12, embed_dim=6, joint_units=12,
            scan_unroll=1,
        )
    else:
        extra = {
            "num_blocks": "2", "d_model": "16", "num_heads": "2",
            "ffn_dim": "24", "conv_kernel": "3", "subsample": str(subsample),
            "attention_left_context": "4", "attention_right_context": "0",
            "causal_conv": "True",
        }
        cfg = TransducerConfig(
            input_dim=input_dim, num_labels=4, enc_type="conformer",
            pred_layers=1, pred_units=8, embed_dim=4, joint_units=12,
            enc_extra=tuple(extra.items()),
        )
    model = Transducer(cfg)
    params, state = model.init(jax.random.PRNGKey(21))
    return model, params, state


def _stream_transducer(model, params, state, audio, chunk):
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state, _IdCoder()
    )
    tx.reset(1)
    for pos in range(0, len(audio), chunk):
        c = audio[pos : pos + chunk][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    return tx, tx.finish()[0]


@pytest.mark.parametrize("subsample", [1, 2])
def test_transducer_timestamps_match_offline_and_chunking(subsample):
    """Streamed transducer timestamps == the offline lattice alignment
    (TransducerDecoder.last_label_frames × frame seconds), at any audio
    chunking; under subsample-2 each encoder frame spans two winsteps."""
    from tfkaldi_tpu.decode.transducer import TransducerDecoder

    model, params, state = _transducer(subsample=subsample)
    rng = np.random.default_rng(31 + subsample)
    audio = (rng.standard_normal(7000) * 100).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    dec = TransducerDecoder(model, params, state, _IdCoder())
    offline_ids = dec.decode_batch(feats, n)[0]
    offline_frames = dec.last_label_frames[0]

    tx_a, final_a = _stream_transducer(model, params, state, audio, 1000)
    tx_b, final_b = _stream_transducer(model, params, state, audio, 317)
    assert final_a == final_b == _IdCoder().decode(offline_ids)
    assert tx_a.frame_seconds == pytest.approx(0.01 * subsample)
    expected = offline_frames * tx_a.frame_seconds
    np.testing.assert_allclose(tx_a.timestamps()[0], expected, rtol=0, atol=0)
    np.testing.assert_allclose(tx_b.timestamps()[0], expected, rtol=0, atol=0)


def test_transducer_timestamps_per_slot_lifecycle():
    """finish_rows leaves the finished slot's timestamps readable and
    equal to an independent batch-1 run; reset_rows restarts its clock."""
    model, params, state = _transducer()
    rng = np.random.default_rng(41)
    a0 = (rng.standard_normal(4000) * 100).astype(np.float32)
    a1 = (rng.standard_normal(8000) * 100).astype(np.float32)

    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state, _IdCoder()
    )
    tx.reset(2)
    for pos in range(0, len(a1), 1000):
        chunk = np.zeros((2, 1000), np.float32)
        ln = np.zeros((2,), np.int64)
        if pos < len(a0):
            p0 = a0[pos : pos + 1000]
            chunk[0, : len(p0)] = p0
            ln[0] = len(p0)
        p1 = a1[pos : pos + 1000]
        chunk[1, : len(p1)] = p1
        ln[1] = len(p1)
        tx.push(chunk, ln)
        if pos + 1000 >= len(a0) and pos < len(a0):
            tx.finish_rows([0])
            solo, _ = _stream_transducer(model, params, state, a0, 1000)
            np.testing.assert_allclose(tx.timestamps()[0], solo.timestamps()[0])
            tx.reset_rows([0])
            assert tx.timestamps()[0].size == 0
    tx.finish_rows([1])
    solo1, _ = _stream_transducer(model, params, state, a1, 1000)
    np.testing.assert_allclose(tx.timestamps()[1], solo1.timestamps()[0])


def _stream_transducer_beam(model, params, state, audio, chunk, beam_width=4):
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state, _IdCoder(),
        beam_width=beam_width,
    )
    tx.reset(1)
    for pos in range(0, len(audio), chunk):
        c = audio[pos : pos + chunk][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    return tx, tx.finish()[0]


@pytest.mark.parametrize("subsample", [1, 2])
def test_transducer_beam_timestamps_match_offline_and_chunking(subsample):
    """Beam-mode transducer timestamps/confidences are the best
    hypothesis' lattice backtrace: equal to the offline beam search's
    (TransducerBeamDecoder.decode_batch_aligned) on the whole utterance,
    at any chunking."""
    from tfkaldi_tpu.decode.transducer_beam import TransducerBeamDecoder

    model, params, state = _transducer(subsample=subsample)
    rng = np.random.default_rng(51 + subsample)
    audio = (rng.standard_normal(7000) * 100).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    dec = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=4
    )
    off_ids, off_frames, off_confs = dec.decode_batch_aligned(feats, n)[0]

    tx_a, final_a = _stream_transducer_beam(model, params, state, audio, 1000)
    tx_b, final_b = _stream_transducer_beam(model, params, state, audio, 317)
    assert final_a == final_b == _IdCoder().decode(off_ids)
    assert tx_a.frame_seconds == pytest.approx(0.01 * subsample)
    expected = off_frames * tx_a.frame_seconds
    np.testing.assert_allclose(tx_a.timestamps()[0], expected, rtol=0, atol=0)
    np.testing.assert_allclose(tx_b.timestamps()[0], expected, rtol=0, atol=0)
    np.testing.assert_allclose(tx_a.confidences()[0], off_confs, rtol=1e-5)
    np.testing.assert_allclose(tx_b.confidences()[0], off_confs, rtol=1e-5)


def test_transducer_beam_timestamps_per_slot_lifecycle():
    """Beam transducer per-slot primitives: finish_rows leaves the
    finished slot's backtrace readable and equal to an independent
    batch-1 beam run; reset_rows restarts its clock; the OTHER slot's
    stream is undisturbed."""
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber

    model, params, state = _transducer()
    rng = np.random.default_rng(61)
    a0 = (rng.standard_normal(4000) * 100).astype(np.float32)
    a1 = (rng.standard_normal(8000) * 100).astype(np.float32)

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state, _IdCoder(),
        beam_width=4,
    )
    tx.reset(2)
    for pos in range(0, len(a1), 1000):
        chunk = np.zeros((2, 1000), np.float32)
        ln = np.zeros((2,), np.int64)
        if pos < len(a0):
            p0 = a0[pos : pos + 1000]
            chunk[0, : len(p0)] = p0
            ln[0] = len(p0)
        p1 = a1[pos : pos + 1000]
        chunk[1, : len(p1)] = p1
        ln[1] = len(p1)
        tx.push(chunk, ln)
        if pos + 1000 >= len(a0) and pos < len(a0):
            tx.finish_rows([0])
            solo, _ = _stream_transducer_beam(model, params, state, a0, 1000)
            np.testing.assert_allclose(tx.timestamps()[0], solo.timestamps()[0])
            np.testing.assert_allclose(
                tx.confidences()[0], solo.confidences()[0], rtol=1e-5
            )
            tx.reset_rows([0])
            assert tx.timestamps()[0].size == 0
    tx.finish_rows([1])
    solo1, _ = _stream_transducer_beam(model, params, state, a1, 1000)
    np.testing.assert_allclose(tx.timestamps()[1], solo1.timestamps()[0])
    np.testing.assert_allclose(
        tx.confidences()[1], solo1.confidences()[0], rtol=1e-5
    )


# -- over the socket protocol ----------------------------------------------


def _collect_timed(host, port, audio, chunk):
    from tfkaldi_tpu.serve import stream_transcribe

    gen = stream_transcribe(host, port, audio, chunk, timestamps=True)
    partials = []
    try:
        while True:
            partials.append(next(gen))
    except StopIteration as stop:
        final, times = stop.value
        return partials, final, times


def test_streaming_server_timestamps_over_socket():
    """MSG_TIMES_REQ after the final returns the committed alignment as
    float64 seconds, equal to a direct library-level run."""
    import threading

    from tfkaldi_tpu.serve import StreamingServer

    model, params, state = _gru()
    rng = np.random.default_rng(17)
    audio = rng.standard_normal(6000).astype(np.float32)
    solo, solo_final = _stream(model, params, state, audio, 1000)

    server = StreamingServer(
        lambda: StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            _IdCoder(), BLANK,
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        _, final, times = _collect_timed(server.host, server.port, audio, 1000)
        assert final == solo_final
        np.testing.assert_allclose(times, solo.timestamps()[0])
    finally:
        server.close()


def test_streaming_server_timestamps_beam_over_socket():
    """MSG_TIMES_REQ on a BEAM server returns the best hypothesis' final
    backtrace, equal to a direct library-level beam run."""
    import threading

    from tfkaldi_tpu.serve import StreamingServer

    model, params, state = _gru()
    rng = np.random.default_rng(18)
    audio = rng.standard_normal(6000).astype(np.float32)
    solo, solo_final = _stream_beam(model, params, state, audio, 1000)

    server = StreamingServer(
        lambda: StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            _IdCoder(), BLANK, beam_width=4,
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        _, final, times = _collect_timed(server.host, server.port, audio, 1000)
        assert final == solo_final
        np.testing.assert_allclose(times, solo.timestamps()[0])
    finally:
        server.close()


def test_multistream_server_timestamps_beam_concurrent():
    """Beam transcriber through the SHARED-batch server: concurrent
    clients' finals and backtraces equal undisturbed batch-1 beam runs."""
    import threading

    from tfkaldi_tpu.serve import MultiStreamServer

    model, params, state = _gru()
    rng = np.random.default_rng(20)
    audios = [
        rng.standard_normal(int(n)).astype(np.float32) for n in (4000, 7000)
    ]
    want = [_stream_beam(model, params, state, a, 1000) for a in audios]

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            _IdCoder(), BLANK, beam_width=4,
        ),
        num_slots=2,
        chunk_size=1000,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    got = [None] * len(audios)
    errors = []

    def client(i):
        try:
            _, final, times = _collect_timed(
                server.host, server.port, audios[i], 1000
            )
            got[i] = (final, times)
        except Exception as exc:  # noqa: BLE001 — re-raised on the main thread
            errors.append((i, exc))

    try:
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(len(audios))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors, errors
        for i, (solo, solo_final) in enumerate(want):
            final, times = got[i]
            assert final == solo_final, i
            np.testing.assert_allclose(times, solo.timestamps()[0])
    finally:
        server.close()


def test_multistream_server_timestamps_concurrent():
    """Concurrent clients on shared slots each get THEIR stream's
    alignment (routed through the engine thread), equal to undisturbed
    batch-1 runs — even with slot reuse (3 clients through 2 slots)."""
    import threading

    from tfkaldi_tpu.serve import MultiStreamServer

    model, params, state = _gru()
    rng = np.random.default_rng(19)
    audios = [
        rng.standard_normal(int(n)).astype(np.float32)
        for n in (4000, 7000, 5000)
    ]
    want = [_stream(model, params, state, a, 1000) for a in audios]

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            _IdCoder(), BLANK,
        ),
        num_slots=2,
        chunk_size=1000,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    got = [None] * len(audios)
    errors = []

    def client(i):
        try:
            _, final, times = _collect_timed(
                server.host, server.port, audios[i], 1000
            )
            got[i] = (final, times)
        except Exception as exc:  # noqa: BLE001 — re-raised on the main thread
            errors.append((i, exc))

    try:
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(len(audios))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors, errors
        for i, (solo, solo_final) in enumerate(want):
            final, times = got[i]
            assert final == solo_final, i
            np.testing.assert_allclose(times, solo.timestamps()[0])
    finally:
        server.close()
