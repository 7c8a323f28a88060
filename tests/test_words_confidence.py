"""Per-label confidences and word-level alignments.

Confidence = the emitted label's softmax posterior at its emission point
(CTC: the argmax posterior at the first frame of the run; transducer:
the token's joint-step posterior) — deterministic and chunking-invariant
by construction. Words = committed labels grouped at the TextCoder's
``<space>`` into (word, start, end, confidence) spans (decode/words.py).

(Beyond the reference: its decoder emits likelihood matrices only,
neuralNetworks/decoder.py:50-77.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.decode import StreamingTranscriber
from tfkaldi_tpu.decode.words import WordAlignment, group_words
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
from tfkaldi_tpu.models import GRU, RNNConfig

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


def _gru(num_labels=8, seed=0):
    model = GRU(
        RNNConfig(input_dim=10, num_labels=num_labels, num_layers=1,
                  hidden_units=16, bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(seed))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(seed + 1), params["out"]["w"].shape)
        * 0.5
    )
    return model, params, state


def _stream(model, params, state, audio, chunk, coder=None, blank=BLANK):
    tx = StreamingTranscriber(
        OnlineFeatureExtractor(_extractor()), model, params, state,
        coder or _IdCoder(), blank,
    )
    tx.reset(1)
    for pos in range(0, len(audio), chunk):
        c = audio[pos : pos + chunk][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    final = tx.finish()[0]
    return tx, final


# -- group_words unit semantics --------------------------------------------


def test_group_words_semantics():
    tokens = ["<sos>", "h", "i", "<space>", "<space>", "y", "o", "<eos>"]
    times = np.asarray([0.0, 0.01, 0.04, 0.05, 0.06, 0.10, 0.12, 0.13])
    confs = np.asarray([0.5, 0.9, 0.6, 0.4, 0.4, 0.8, 0.7, 0.3])
    words = group_words(tokens, times, confs, 0.01)
    assert words == [
        WordAlignment("hi", 0.01, 0.05, 0.6),
        WordAlignment("yo", 0.10, 0.13, 0.7),
    ]
    # markers and spaces never open a word; trailing space is harmless
    assert group_words(["<space>", "<sos>"], np.zeros(2), np.ones(2), 0.01) == []
    with pytest.raises(ValueError, match="misaligned"):
        group_words(["a"], np.zeros(2), np.ones(1), 0.01)


# -- CTC confidences ---------------------------------------------------------


def test_ctc_confidences_match_offline_and_chunking_invariant():
    """Streamed per-label confidences equal the offline argmax posterior
    at each emission frame, at any chunking, and live in (0, 1]."""
    model, params, state = _gru()
    rng = np.random.default_rng(23)
    audio = rng.standard_normal(7000).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    logits, _ = model.apply(
        params, state, jnp.asarray(feats[:, : int(n[0])]),
        jnp.asarray([int(n[0])], jnp.int32), train=False,
    )
    lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1))
    p = np.argmax(lp, axis=-1)
    keep = np.ones(p.shape[0], bool)
    keep[1:] = p[1:] != p[:-1]
    idx = np.flatnonzero(keep)
    nonblank = p[idx] != BLANK
    want = np.exp(lp[idx[nonblank], p[idx[nonblank]]])

    tx_a, _ = _stream(model, params, state, audio, 1000)
    tx_b, _ = _stream(model, params, state, audio, 333)
    got_a, got_b = tx_a.confidences()[0], tx_b.confidences()[0]
    np.testing.assert_allclose(got_a, want, rtol=1e-5)
    np.testing.assert_allclose(got_b, want, rtol=1e-5)
    assert np.all(got_a > 0) and np.all(got_a <= 1)
    # aligned with timestamps label for label
    assert len(got_a) == len(tx_a.timestamps()[0])


def test_ctc_confidences_and_words_beam_mode():
    """Beam-mode confidences are the best hypothesis' emission-frame
    posteriors (offline prefix-beam backtrace), and words() groups the
    beam transcript with them — chunking-invariant."""
    from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py

    model, params, state = _gru()
    rng = np.random.default_rng(24)
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
    ids, _, confs = ctc_beam_search_py(lp, BLANK, 4, return_alignment=True)

    class _AlphaCoder(_IdCoder):
        alphabet = [str(i) for i in range(8)]  # no <space>: one word

    def stream(chunk):
        tx = StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            _AlphaCoder(), BLANK, beam_width=4,
        )
        tx.reset(1)
        for pos in range(0, len(audio), chunk):
            c = audio[pos : pos + chunk][None, :]
            tx.push(c, np.asarray([c.shape[1]]))
        return tx, tx.finish()[0]

    tx_a, final_a = stream(1000)
    tx_b, final_b = stream(333)
    assert final_a == final_b == _IdCoder().decode(ids)
    np.testing.assert_allclose(tx_a.confidences()[0], confs, rtol=1e-5)
    np.testing.assert_allclose(tx_b.confidences()[0], confs, rtol=1e-5)
    # words() runs off the same backtrace (the _IdCoder alphabet has no
    # <space>, so the whole transcript is one word whose confidence is
    # the weakest label)
    words_a = tx_a.words()[0]
    assert len(words_a) == 1
    assert words_a[0].confidence == pytest.approx(min(confs), rel=1e-5)


# -- transducer confidences --------------------------------------------------


def test_transducer_confidences_match_offline():
    """Streamed transducer confidences equal the offline lattice pass's
    last_label_confs (the emitted token's joint-step posterior)."""
    from tfkaldi_tpu.decode.transducer import (
        StreamingTransducerTranscriber,
        TransducerDecoder,
    )
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    model = Transducer(TransducerConfig(
        input_dim=10, num_labels=4, enc_layers=1, enc_units=16,
        pred_layers=1, pred_units=12, embed_dim=6, joint_units=12,
        scan_unroll=1,
    ))
    params, state = model.init(jax.random.PRNGKey(31))
    rng = np.random.default_rng(33)
    audio = (rng.standard_normal(6000) * 100).astype(np.float32)

    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))
    dec = TransducerDecoder(model, params, state, _IdCoder())
    dec.decode_batch(feats, n)
    want = dec.last_label_confs[0]
    assert want.size and np.all(want > 0) and np.all(want <= 1)

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder()
    )
    tx.reset(1)
    for pos in range(0, len(audio), 1000):
        c = audio[pos : pos + 1000][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    tx.finish()
    np.testing.assert_allclose(tx.confidences()[0], want, rtol=1e-5)
    assert len(tx.confidences()[0]) == len(tx.timestamps()[0])


# -- word alignments end to end ----------------------------------------------


def test_words_end_to_end_with_text_coder():
    """Through a TextCoder-shaped model, words() reproduces the final
    transcript (spaces → word boundaries), with monotonic non-overlapping
    spans and per-word min-label confidences."""
    from tfkaldi_tpu.data.target_coder import TextCoder
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer

    coder = TextCoder(identity_normalizer)
    blank = coder.num_labels  # 35
    model, params, state = _gru(num_labels=coder.num_labels + 1, seed=5)
    rng = np.random.default_rng(37)
    audio = rng.standard_normal(9000).astype(np.float32)

    tx, final = _stream(model, params, state, audio, 1000, coder, blank)
    words = tx.words()[0]
    # the transcript's words (marker/space tokens removed) match
    text = "".join(
        {"<space>": " ", "<sos>": "", "<eos>": ""}.get(t, t)
        for t in final.split(" ")
    ).split()
    assert [w.word for w in words] == text
    times = tx.timestamps()[0]
    confs = tx.confidences()[0]
    assert words, "degenerate test: no words emitted"
    for w in words:
        assert w.end > w.start >= 0
        assert 0 < w.confidence <= 1
    starts = [w.start for w in words]
    assert starts == sorted(starts)
    # spot-check one word's confidence is the min of its labels'
    tokens = [coder.alphabet[i] for i in tx._committed[0]]
    first_label = next(
        i for i, t in enumerate(tokens) if t not in ("<space>", "<sos>", "<eos>")
    )
    assert words[0].start == pytest.approx(times[first_label])
    assert words[0].confidence <= confs[first_label] + 1e-12


# -- over the socket protocol --------------------------------------------


def _text_setup():
    from tfkaldi_tpu.data.target_coder import TextCoder
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer

    coder = TextCoder(identity_normalizer)
    model, params, state = _gru(num_labels=coder.num_labels + 1, seed=5)
    return coder, model, params, state


def test_streaming_server_words_over_socket():
    """stream_words returns the word alignment equal to a library run
    (JSON wire round trip preserves spans and confidences)."""
    import threading

    from tfkaldi_tpu.serve import StreamingServer, stream_words

    coder, model, params, state = _text_setup()
    blank = coder.num_labels
    rng = np.random.default_rng(41)
    audio = rng.standard_normal(6000).astype(np.float32)
    solo, solo_final = _stream(model, params, state, audio, 1000, coder, blank)

    server = StreamingServer(
        lambda: StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            coder, blank,
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        final, words = stream_words(server.host, server.port, audio, 1000)
        assert final == solo_final
        assert words == solo.words()[0]
    finally:
        server.close()


def test_multistream_server_words_and_confidences():
    """On the shared-batch server each client's words and confidences are
    its own stream's (engine-routed, slot-correct)."""
    import threading

    from tfkaldi_tpu.serve import (
        MSG_CONF,
        MSG_CONF_REQ,
        MSG_FINAL,
        MSG_FINISH,
        MSG_AUDIO,
        MSG_PARTIAL,
        MultiStreamServer,
        _recv_msg,
        _send_msg,
        stream_words,
    )

    coder, model, params, state = _text_setup()
    blank = coder.num_labels
    rng = np.random.default_rng(43)
    audios = [
        rng.standard_normal(int(n)).astype(np.float32) for n in (5000, 7000)
    ]
    want = [
        _stream(model, params, state, a, 1000, coder, blank) for a in audios
    ]

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(_extractor()), model, params, state,
            coder, blank,
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
            got[i] = stream_words(server.host, server.port, audios[i], 1000)
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
            final, words = got[i]
            assert final == solo_final, i
            assert words == solo.words()[0], i

        # raw-socket confidences request (MSG_CONF_REQ path)
        import socket as socketlib

        with socketlib.create_connection((server.host, server.port)) as sock:
            a = np.ascontiguousarray(audios[0], "<f4")
            for pos in range(0, len(a), 1000):
                _send_msg(sock, MSG_AUDIO, a[pos : pos + 1000].tobytes())
                mtype, _ = _recv_msg(sock)
                assert mtype == MSG_PARTIAL
            _send_msg(sock, MSG_FINISH, b"")
            mtype, _ = _recv_msg(sock)
            assert mtype == MSG_FINAL
            _send_msg(sock, MSG_CONF_REQ, b"")
            mtype, payload = _recv_msg(sock)
            assert mtype == MSG_CONF
            np.testing.assert_allclose(
                np.frombuffer(payload, "<f8"), want[0][0].confidences()[0]
            )
    finally:
        server.close()


# -- offline CTCDecoder alignment parity -----------------------------------


def test_offline_ctc_decoder_alignment_matches_streaming(monkeypatch):
    """CTCDecoder.decode_batch (greedy) exposes last_label_frames/confs
    equal to the streaming transcriber's committed alignment; the Python
    beam exposes the best hypothesis' backtrace; the native-C++ beam
    (transcripts only) nulls them."""
    from tfkaldi_tpu.decode.ctc import CTCDecoder

    model, params, state = _gru()
    rng = np.random.default_rng(47)
    audio = rng.standard_normal(7000).astype(np.float32)
    ext = _extractor()
    feats, n = map(np.asarray, ext(audio[None, :], np.asarray([len(audio)])))

    dec = CTCDecoder(model, params, state, _IdCoder(), BLANK)
    ids = dec.decode_batch(feats, n)[0]
    tx, final = _stream(model, params, state, audio, 1000)
    assert _IdCoder().decode(ids) == final
    np.testing.assert_allclose(
        dec.last_label_frames[0] * tx.frame_seconds, tx.timestamps()[0]
    )
    np.testing.assert_allclose(
        dec.last_label_confs[0], tx.confidences()[0], rtol=1e-5
    )

    from tfkaldi_tpu.decode import native_beam
    from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py

    beam = CTCDecoder(model, params, state, _IdCoder(), BLANK, beam_width=4)
    if native_beam.available():
        beam.decode_batch(feats, n)
        assert beam.last_label_frames is None
        assert beam.last_label_confs is None
    # force the Python beam: it populates the best hypothesis' backtrace
    monkeypatch.setattr(native_beam, "available", lambda: False)
    beam_ids = beam.decode_batch(feats, n)[0]
    lp = np.asarray(beam._logprob_fn(
        jnp.asarray(feats), jnp.asarray(n, jnp.int32),
        beam.params, beam.model_state,
    ))
    want_ids, want_frames, want_confs = ctc_beam_search_py(
        lp[0, : int(n[0])], BLANK, 4, return_alignment=True
    )
    np.testing.assert_array_equal(beam_ids, want_ids)
    np.testing.assert_array_equal(beam.last_label_frames[0], want_frames)
    np.testing.assert_allclose(beam.last_label_confs[0], want_confs)
