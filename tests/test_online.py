"""Streaming inference: chunked forward == offline whole-utterance forward.

models/rnn.py::apply_stream + decode/online.py::OnlineRecurrentDecoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.decode import Decoder
from tfkaldi_tpu.decode.online import OnlineRecurrentDecoder
from tfkaldi_tpu.models import GRU, LSTM, RNNConfig


def _model(cls, **over):
    cfg = dict(input_dim=8, num_labels=5, num_layers=2, hidden_units=16,
               bidirectional=False, scan_unroll=1)
    cfg.update(over)
    return cls(RNNConfig(**cfg))


def _params(model, seed=0):
    params, state = model.init(jax.random.PRNGKey(seed))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(seed + 1), params["out"]["w"].shape) * 0.3
    )
    return params, state


@pytest.mark.parametrize("cls", [LSTM, GRU])
@pytest.mark.parametrize("splits", [[4, 8, 20], [1] * 32, [20, 12]])
def test_stream_equals_offline(cls, splits):
    """Any chunking of the utterance reproduces the offline logits at
    valid frames, including a ragged final chunk."""
    model = _model(cls)
    params, state = _params(model)
    rng = np.random.default_rng(0)
    b, total = 3, 32
    lengths = np.asarray([32, 19, 7], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)

    offline, _ = model.apply(params, state, jnp.asarray(x),
                             jnp.asarray(lengths), train=False)

    carry = model.init_stream_carry(b)
    outs = []
    pos = 0
    for tc in splits:
        if tc == 0:
            continue
        chunk = x[:, pos : pos + tc]
        # per-row valid frames within this chunk
        chunk_len = np.clip(lengths - pos, 0, chunk.shape[1]).astype(np.int32)
        logits, carry = model.apply_stream(
            params, state, jnp.asarray(chunk), jnp.asarray(chunk_len), carry
        )
        outs.append(np.asarray(logits))
        pos += chunk.shape[1]
    streamed = np.concatenate(outs, axis=1)[:, :total]

    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            streamed[row, :n], np.asarray(offline)[row, :n], rtol=0, atol=2e-6
        )


@pytest.mark.parametrize("cls", [LSTM, GRU])
def test_carry_freezes_past_length(cls):
    """Frames past a row's chunk length must not advance its state."""
    model = _model(cls, num_layers=1)
    params, state = _params(model)
    rng = np.random.default_rng(1)
    b = 2
    chunk = rng.standard_normal((b, 6, 8)).astype(np.float32)
    carry0 = model.init_stream_carry(b)
    _, c_full = model.apply_stream(
        params, state, jnp.asarray(chunk), jnp.asarray([6, 3]), carry0
    )
    _, c_trunc = model.apply_stream(
        params, state, jnp.asarray(chunk[:, :3]), jnp.asarray([3, 3]), carry0
    )
    # row 1 stopped at frame 3 in both runs -> identical carry
    for a, bb in zip(jax.tree.leaves(c_full), jax.tree.leaves(c_trunc)):
        np.testing.assert_array_equal(np.asarray(a)[1], np.asarray(bb)[1])


def test_bidirectional_rejected():
    model = _model(LSTM, bidirectional=True)
    with pytest.raises(ValueError, match="unidirectional"):
        model.init_stream_carry(2)


@pytest.mark.parametrize("cls", [LSTM, GRU])
def test_online_decoder_matches_offline_decoder(cls):
    """The full streaming emission chain (softmax -> /prior -> floor ->
    log) equals the offline batched Decoder on the same utterances."""
    model = _model(cls)
    params, state = _params(model)
    o = model.config.num_labels
    prior = np.full((o,), 1.0 / o, np.float32)
    rng = np.random.default_rng(2)
    b, total = 2, 24
    lengths = np.asarray([24, 13], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)

    offline = np.asarray(
        Decoder(model, params, state, prior).compute_batch(x, lengths)
    )

    dec = OnlineRecurrentDecoder(model, params, state, prior)
    dec.reset(b)
    outs = []
    for pos in range(0, total, 8):
        chunk = x[:, pos : pos + 8]
        chunk_len = np.clip(lengths - pos, 0, 8).astype(np.int32)
        outs.append(np.asarray(dec.step(chunk, chunk_len)))
    streamed = np.concatenate(outs, axis=1)

    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            streamed[row, :n], offline[row, :n], rtol=0, atol=2e-5
        )


def test_online_decoder_requires_reset():
    model = _model(GRU)
    params, state = _params(model)
    dec = OnlineRecurrentDecoder(
        model, params, state, np.full((5,), 0.2, np.float32)
    )
    with pytest.raises(RuntimeError, match="reset"):
        dec.step(np.zeros((1, 4, 8), np.float32), np.asarray([4]))


@pytest.mark.parametrize("cls", [LSTM, GRU])
@pytest.mark.parametrize("chunk_len", [1, 5, 24])
def test_online_ctc_matches_offline_greedy(cls, chunk_len):
    """Accumulated streaming CTC output == offline best-path decoding,
    including repeat-merging across chunk boundaries."""
    from tfkaldi_tpu.decode import CTCDecoder
    from tfkaldi_tpu.decode.online import OnlineCTCDecoder

    model = _model(cls, num_labels=6)  # 5 chars + blank
    params, state = _params(model, seed=7)
    blank = 5
    rng = np.random.default_rng(3)
    b, total = 3, 24
    lengths = np.asarray([24, 17, 4], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline = CTCDecoder(model, params, state, _IdCoder(), blank).decode_batch(
        x, lengths
    )

    dec = OnlineCTCDecoder(model, params, state, blank)
    dec.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, total, chunk_len):
        chunk = x[:, pos : pos + chunk_len]
        chunk_lens = np.clip(lengths - pos, 0, chunk.shape[1]).astype(np.int32)
        for row, new_ids in enumerate(dec.step(chunk, chunk_lens)):
            got[row].extend(new_ids.tolist())
    for row in range(b):
        np.testing.assert_array_equal(np.asarray(got[row], np.int32), offline[row])


def test_online_ctc_requires_reset_and_unidirectional():
    from tfkaldi_tpu.decode.online import OnlineCTCDecoder

    model = _model(GRU, num_labels=6)
    params, state = _params(model)
    dec = OnlineCTCDecoder(model, params, state, blank_id=5)
    with pytest.raises(RuntimeError, match="reset"):
        dec.step(np.zeros((1, 4, 8), np.float32), np.asarray([4]))

    bidi = _model(LSTM, num_labels=6, bidirectional=True)
    bparams, bstate = bidi.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unidirectional"):
        OnlineCTCDecoder(bidi, bparams, bstate, blank_id=5)
