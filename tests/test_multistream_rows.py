"""Per-slot lifecycle primitives for multi-stream serving.

``finish_rows``/``reset_rows`` let N concurrent utterances share ONE
batched device program and end/restart independently — the primitive
behind ``serve``'s batched streaming. The contract under test: finishing
or resetting a subset of rows leaves every other row's subsequent output
bit-identical to an undisturbed run, and each stream's final transcript
equals an independent batch-1 run of the same audio.

(The reference rebuilds a batch-1 graph per utterance, decoder.py:8-47 —
no per-slot concept exists there; this is serving capability beyond it.)
"""

import jax
import numpy as np
import pytest

from tfkaldi_tpu.decode import StreamingTranscriber
from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import OnlineDynamicExtractor, OnlineFeatureExtractor
from tfkaldi_tpu.models import GRU, RNNConfig
from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

RATE = 8000
CHUNK = 1000  # samples per push


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _extractor(dynamic="nodelta"):
    return FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic=dynamic, nfilt=10, nfft=256),
        RATE,
    )


def _gru(input_dim=10, num_labels=8):
    model = GRU(
        RNNConfig(input_dim=input_dim, num_labels=num_labels, num_layers=1,
                  hidden_units=16, bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )
    return model, params, state


def _conf_transducer():
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
    return model, params, state


def _signals(rng, n, lo=3000, hi=9000):
    lens = rng.integers(lo, hi, size=n)
    return [rng.standard_normal(int(s)).astype(np.float32) for s in lens]


def _single_stream_final(make_tx, audio):
    """Reference: the same audio through an undisturbed batch-1 run."""
    tx = make_tx()
    tx.reset(1)
    for pos in range(0, len(audio), CHUNK):
        c = audio[pos : pos + CHUNK][None, :]
        tx.push(c, np.asarray([c.shape[1]]))
    return tx.finish()[0]


def _run_multistream(make_tx, n_slots, audios):
    """Drive len(audios) streams through n_slots shared rows: slots are
    claimed in audio order as they free up, pushed one chunk per tick,
    finished (finish_rows) when their audio is exhausted, then re-armed
    (reset_rows) for the next waiting stream. Returns finals per audio."""
    tx = make_tx()
    tx.reset(n_slots)
    finals = [None] * len(audios)
    slot_audio = [None] * n_slots  # audio index per slot
    pos = [0] * n_slots
    next_audio = 0
    while True:
        for s in range(n_slots):
            if slot_audio[s] is None and next_audio < len(audios):
                tx.reset_rows([s])
                slot_audio[s] = next_audio
                pos[s] = 0
                next_audio += 1
        if all(a is None for a in slot_audio):
            break
        chunk = np.zeros((n_slots, CHUNK), np.float32)
        lengths = np.zeros((n_slots,), np.int64)
        for s, a in enumerate(slot_audio):
            if a is None:
                continue
            piece = audios[a][pos[s] : pos[s] + CHUNK]
            chunk[s, : len(piece)] = piece
            lengths[s] = len(piece)
            pos[s] += len(piece)
        tx.push(chunk, lengths)
        done = [s for s, a in enumerate(slot_audio)
                if a is not None and pos[s] >= len(audios[a])]
        if done:
            out = tx.finish_rows(done)
            for s in done:
                finals[slot_audio[s]] = out[s]
                slot_audio[s] = None
    return finals


@pytest.mark.parametrize("beam_width", [1, 4])
def test_ctc_transcriber_slots_match_single_stream(beam_width):
    """5 streams through 2 shared slots (forced slot reuse): every final
    equals an undisturbed batch-1 run of the same audio."""
    rng = np.random.default_rng(0)
    audios = _signals(rng, 5)
    model, params, state = _gru()
    ext = _extractor()

    def make_tx():
        return StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), 7,
            beam_width=beam_width,
        )

    finals = _run_multistream(make_tx, 2, audios)
    for i, audio in enumerate(audios):
        assert finals[i] == _single_stream_final(make_tx, audio), f"stream {i}"


def test_ctc_transcriber_slots_delta_features():
    """Same contract under the delta front-end (OnlineDynamicExtractor
    per-row flush: lookahead buffers + true end reflection per slot)."""
    rng = np.random.default_rng(3)
    audios = _signals(rng, 3)
    model, params, state = _gru(input_dim=20)
    ext = _extractor(dynamic="delta")

    def make_tx():
        return StreamingTranscriber(
            OnlineDynamicExtractor(ext), model, params, state, _IdCoder(), 7,
        )

    finals = _run_multistream(make_tx, 2, audios)
    for i, audio in enumerate(audios):
        assert finals[i] == _single_stream_final(make_tx, audio), f"stream {i}"


def test_transducer_transcriber_slots_match_single_stream():
    """Conformer-s2 streaming transducer (the production serving config):
    per-slot finish exercises the subsampled encoder's flush-group path
    and the transformer carry's batch-dim-1 row merge."""
    rng = np.random.default_rng(7)
    audios = _signals(rng, 3, lo=2500, hi=6000)
    model, params, state = _conf_transducer()
    ext = _extractor()

    def make_tx():
        return StreamingTransducerTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(),
        )

    finals = _run_multistream(make_tx, 2, audios)
    for i, audio in enumerate(audios):
        assert finals[i] == _single_stream_final(make_tx, audio), f"stream {i}"


def test_finish_rows_leaves_other_rows_bit_identical():
    """Finishing row 0 mid-stream must not perturb row 1's remaining
    partials: compare against a parallel run where row 0 just goes idle."""
    rng = np.random.default_rng(11)
    a0, a1 = _signals(rng, 2, lo=4000, hi=5000)
    model, params, state = _gru()
    ext = _extractor()

    def make_tx():
        return StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), 7,
        )

    def drive(finish_row0):
        tx = make_tx()
        tx.reset(2)
        partials = []
        for k, pos in enumerate(range(0, len(a1), CHUNK)):
            c = np.zeros((2, CHUNK), np.float32)
            ln = np.zeros((2,), np.int64)
            if pos < len(a0) and not (finish_row0 and k >= 2):
                p0 = a0[pos : pos + CHUNK]
                c[0, : len(p0)] = p0
                ln[0] = len(p0)
            p1 = a1[pos : pos + CHUNK]
            c[1, : len(p1)] = p1
            ln[1] = len(p1)
            partials.append(tx.push(c, ln)[1])
            if finish_row0 and k == 1:
                tx.finish_rows([0])
        return partials, tx.finish_rows([1])[1]

    base_partials, base_final = drive(finish_row0=False)
    cut_partials, cut_final = drive(finish_row0=True)
    assert cut_partials == base_partials
    assert cut_final == base_final


def test_endpointer_reset_rows():
    from tfkaldi_tpu.decode.endpoint import EndpointConfig, Endpointer

    ep = Endpointer(EndpointConfig(), blank_id=0)
    ep.reset(3)
    labels = np.zeros((3, 200), np.int32)
    labels[:, 0] = 1  # one nonblank then trailing silence
    ep.update(labels, np.asarray([200, 200, 10]))
    det = ep.detected()
    assert det[0] and det[1] and not det[2]
    ep.reset_rows([0])
    det = ep.detected()
    assert not det[0] and det[1]
    assert ep._total[0] == 0 and ep._total[1] == 200
