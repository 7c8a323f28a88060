"""MultiStreamServer: N socket clients share ONE batched device program.

The contract: concurrent clients' finals equal undisturbed batch-1 runs
of the same audio (the per-slot primitives' guarantee, lifted over a real
socket + engine-thread scheduler), slots are reused across more clients
than slots, and endpointing finishes a stream server-side with an early
MSG_FINAL.

(No reference counterpart: the reference rebuilds a batch-1 TF graph per
decode run, neuralNetworks/decoder.py:8-47.)
"""

import threading

import jax
import numpy as np

from tfkaldi_tpu.decode import StreamingTranscriber
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
from tfkaldi_tpu.models import GRU, RNNConfig
from tfkaldi_tpu.serve import MultiStreamServer, stream_transcribe

RATE = 8000
CHUNK = 1000
BLANK = 7


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _setup():
    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        RATE,
    )
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )
    return ext, model, params, state


def _batch1_final(ext, model, params, state, audio, **tx_kwargs):
    tx = StreamingTranscriber(
        OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
        **tx_kwargs,
    )
    tx.reset(1)
    for pos in range(0, len(audio), CHUNK):
        c = audio[pos : pos + CHUNK][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    return tx.finish()[0]


def _collect(host, port, audio):
    gen = stream_transcribe(host, port, audio, CHUNK)
    partials = []
    try:
        while True:
            partials.append(next(gen))
    except StopIteration as stop:
        return partials, stop.value


def test_multistream_server_concurrent_clients_match_batch1():
    """5 concurrent clients through 3 shared slots (forced slot reuse):
    every final equals an undisturbed batch-1 run, and the engine
    actually batched rows (rows_pushed accumulates across clients)."""
    ext, model, params, state = _setup()
    rng = np.random.default_rng(5)
    audios = [
        rng.standard_normal(int(n)).astype(np.float32)
        for n in rng.integers(3000, 9000, size=5)
    ]
    expected = [
        _batch1_final(ext, model, params, state, a) for a in audios
    ]

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
        ),
        num_slots=3,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    finals = [None] * len(audios)
    errors = []

    def client(i):
        try:
            _, finals[i] = _collect(server.host, server.port, audios[i])
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
        assert finals == expected
        total_chunks = sum(-(-len(a) // CHUNK) for a in audios)
        assert server.rows_pushed == total_chunks
        assert 0 < server.ticks <= total_chunks
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_sequential_slot_reuse():
    """Two sequential sessions land on a re-armed slot: the second
    utterance's final must not see the first's state."""
    ext, model, params, state = _setup()
    rng = np.random.default_rng(9)
    audio = rng.standard_normal(5000).astype(np.float32)
    expected = _batch1_final(ext, model, params, state, audio)

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
        ),
        num_slots=1,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for _ in range(2):
            partials, final = _collect(server.host, server.port, audio)
            assert len(partials) == -(-len(audio) // CHUNK)
            assert final == expected
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_oversized_chunk_rejected():
    ext, model, params, state = _setup()
    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
        ),
        num_slots=1,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        audio = np.zeros((2 * CHUNK,), np.float32)
        gen = stream_transcribe(server.host, server.port, audio, 2 * CHUNK)
        try:
            next(gen)
            raise AssertionError("oversized chunk was accepted")
        except RuntimeError as exc:
            assert "chunk_size" in str(exc)
        # the slot must be released and usable for a well-behaved session
        rng = np.random.default_rng(2)
        good = rng.standard_normal(3000).astype(np.float32)
        _, final = _collect(server.host, server.port, good)
        assert final == _batch1_final(ext, model, params, state, good)
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_transducer():
    """The production serving config — streaming conformer-s2 transducer —
    through the shared-batch server: concurrent finals equal batch-1."""
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        RATE,
    )
    extra = {
        "num_blocks": "2", "d_model": "16", "num_heads": "2",
        "ffn_dim": "24", "conv_kernel": "3", "subsample": "2",
        "attention_left_context": "4", "attention_right_context": "0",
        "causal_conv": "True",
    }
    model = Transducer(TransducerConfig(
        input_dim=10, num_labels=4, enc_type="conformer",
        pred_layers=1, pred_units=8, embed_dim=4, joint_units=12,
        joint_chunk_t=3, enc_extra=tuple(extra.items()),
    ))
    params, state = model.init(jax.random.PRNGKey(21))

    rng = np.random.default_rng(23)
    audios = [
        rng.standard_normal(int(n)).astype(np.float32) for n in (3500, 5200)
    ]

    def batch1(a):
        tx = StreamingTransducerTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(),
        )
        tx.reset(1)
        for pos in range(0, len(a), CHUNK):
            c = a[pos : pos + CHUNK][None, :]
            tx.push(c, np.asarray([c.shape[1]]))
        return tx.finish()[0]

    expected = [batch1(a) for a in audios]
    server = MultiStreamServer(
        StreamingTransducerTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(),
        ),
        num_slots=2,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    finals = [None] * len(audios)

    def client(i):
        _, finals[i] = _collect(server.host, server.port, audios[i])

    try:
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(len(audios))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert finals == expected
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_endpoint_early_final():
    """A max-utterance-length endpoint rule finishes the stream
    server-side: the client gets an early MSG_FINAL (fewer partials than
    chunks) and the final equals a batch-1 run truncated the same way."""
    from tfkaldi_tpu.decode.endpoint import EndpointConfig, EndpointRule

    ext, model, params, state = _setup()
    rng = np.random.default_rng(13)
    audio = rng.standard_normal(8000).astype(np.float32)
    # fires once the utterance exceeds 0.2 s (~20 decoder frames),
    # regardless of labels — deterministic with a random model
    cfg = EndpointConfig(rules=(EndpointRule(False, 0.0, 0.2),))

    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
            endpoint_config=cfg,
        ),
        num_slots=2,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        partials, final = _collect(server.host, server.port, audio)
        n_chunks = -(-len(audio) // CHUNK)
        assert len(partials) < n_chunks  # ended early
        assert isinstance(final, str) and final
        # the slot is re-armed for the next stream
        partials2, final2 = _collect(server.host, server.port, audio)
        assert (partials2, final2) == (partials, final)
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_audio_after_finish_is_protocol_error():
    """A non-conforming client that keeps sending audio after MSG_FINAL
    gets MSG_ERROR (the finished row must not be re-flushed), while
    alignment requests on the finished slot still work."""
    import socket as socketlib

    from tfkaldi_tpu.serve import (
        MSG_AUDIO, MSG_ERROR, MSG_FINAL, MSG_FINISH, MSG_TIMES, MSG_TIMES_REQ,
        _recv_msg, _send_msg,
    )

    ext, model, params, state = _setup()
    rng = np.random.default_rng(31)
    audio = rng.standard_normal(CHUNK).astype(np.float32)
    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
        ),
        num_slots=1,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socketlib.create_connection((server.host, server.port)) as sock:
            _send_msg(sock, MSG_AUDIO, audio.tobytes())
            mtype, _ = _recv_msg(sock)
            assert mtype != MSG_ERROR
            _send_msg(sock, MSG_FINISH, b"")
            mtype, _ = _recv_msg(sock)
            assert mtype == MSG_FINAL
            # alignment requests remain answerable on the finished slot
            _send_msg(sock, MSG_TIMES_REQ, b"")
            mtype, _ = _recv_msg(sock)
            assert mtype == MSG_TIMES
            # ...but more audio is a protocol error
            _send_msg(sock, MSG_AUDIO, audio.tobytes())
            mtype, payload = _recv_msg(sock)
            assert mtype == MSG_ERROR
            assert b"finished" in payload
        # the slot is released and a well-behaved session works after it
        good = rng.standard_normal(3000).astype(np.float32)
        _, final = _collect(server.host, server.port, good)
        assert final == _batch1_final(ext, model, params, state, good)
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_audio_after_endpoint_final_is_error():
    """Same guard for SERVER-side endpoint finals: a client that ignores
    the early MSG_FINAL and keeps pushing audio gets MSG_ERROR instead of
    having its chunks flushed through the finished row."""
    import socket as socketlib

    from tfkaldi_tpu.decode.endpoint import EndpointConfig, EndpointRule
    from tfkaldi_tpu.serve import (
        MSG_AUDIO, MSG_ERROR, MSG_FINAL, _recv_msg, _send_msg,
    )

    ext, model, params, state = _setup()
    rng = np.random.default_rng(37)
    audio = rng.standard_normal(8000).astype(np.float32)
    cfg = EndpointConfig(rules=(EndpointRule(False, 0.0, 0.2),))
    server = MultiStreamServer(
        StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), BLANK,
            endpoint_config=cfg,
        ),
        num_slots=1,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socketlib.create_connection((server.host, server.port)) as sock:
            saw_final = False
            for pos in range(0, len(audio), CHUNK):
                _send_msg(
                    sock, MSG_AUDIO, audio[pos : pos + CHUNK].tobytes()
                )
                mtype, payload = _recv_msg(sock)
                if not saw_final:
                    assert mtype != MSG_ERROR
                    saw_final = mtype == MSG_FINAL
                else:
                    assert mtype == MSG_ERROR
                    assert b"finished" in payload
                    break
            assert saw_final, "endpoint never fired"
    finally:
        server.close()
        t.join(timeout=5)


def test_multistream_server_engine_survives_rearm_failure():
    """A reset_rows exception at claim time fails THAT slot with
    MSG_ERROR instead of silently killing the engine thread: the failed
    client sees an error, and the next claim re-arms the slot and streams
    normally."""
    ext, model, params, state = _setup()
    rng = np.random.default_rng(41)
    audio = rng.standard_normal(3000).astype(np.float32)
    expected = _batch1_final(ext, model, params, state, audio)

    class _FlakyRearm:
        """Delegating proxy whose first reset_rows raises."""

        def __init__(self, inner):
            self._inner = inner
            self._fails = 1

        def reset_rows(self, rows):
            if self._fails:
                self._fails -= 1
                raise RuntimeError("injected re-arm failure")
            return self._inner.reset_rows(rows)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    server = MultiStreamServer(
        _FlakyRearm(
            StreamingTranscriber(
                OnlineFeatureExtractor(ext), model, params, state,
                _IdCoder(), BLANK,
            )
        ),
        num_slots=1,
        chunk_size=CHUNK,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        gen = stream_transcribe(server.host, server.port, audio, CHUNK)
        try:
            while True:
                next(gen)
        except RuntimeError as exc:
            assert "injected re-arm failure" in str(exc)
        except StopIteration:
            raise AssertionError("failed re-arm did not surface") from None
        # the engine is still alive: the next session works end to end
        _, final = _collect(server.host, server.port, audio)
        assert final == expected
    finally:
        server.close()
        t.join(timeout=5)
