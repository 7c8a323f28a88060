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


@pytest.mark.parametrize("c", [0, 2])
@pytest.mark.parametrize("chunk_len", [1, 5, 64])
def test_online_spliced_dnn_matches_offline(c, chunk_len):
    """Streaming DNN emission (c-frame lookahead, edge zero-splice) ==
    offline Decoder on offline-spliced features, any chunking."""
    from tfkaldi_tpu.decode.decoder import Decoder
    from tfkaldi_tpu.decode.online import OnlineSplicedDecoder
    from tfkaldi_tpu.frontend.cmvn import splice
    from tfkaldi_tpu.models.dnn import DNN, DNNConfig

    dim = 6
    model = DNN(
        DNNConfig(
            input_dim=dim * (2 * c + 1), num_labels=7, num_hidden_layers=2,
            num_hidden_units=16, batch_norm=True,
        )
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.4
    )
    prior = np.full((7,), 1.0 / 7, np.float32)

    rng = np.random.default_rng(6)
    b, total = 3, 64
    lengths = np.asarray([64, 37, 1], np.int32)
    feats = rng.standard_normal((b, total, dim)).astype(np.float32)
    for row, n in enumerate(lengths):
        feats[row, n:] = 0

    offline = np.asarray(
        Decoder(model, params, state, prior).compute_batch(
            np.asarray(splice(feats, c)), lengths
        )
    )

    dec = OnlineSplicedDecoder(model, params, state, prior, context_width=c)
    dec.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, total, chunk_len):
        ck = feats[:, pos : pos + chunk_len]
        cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
        likes, nnew = dec.step(ck, cl)
        for row in range(b):
            got[row].append(likes[row, : nnew[row]])
    likes, nnew = dec.flush()
    for row in range(b):
        got[row].append(likes[row, : nnew[row]])
    for row in range(b):
        g = np.concatenate(got[row], axis=0)
        assert g.shape[0] == lengths[row]
        np.testing.assert_allclose(
            g, offline[row, : lengths[row]], rtol=0, atol=1e-5
        )


def test_online_spliced_requires_reset():
    from tfkaldi_tpu.decode.online import OnlineSplicedDecoder
    from tfkaldi_tpu.models.dnn import DNN, DNNConfig

    model = DNN(DNNConfig(input_dim=6, num_labels=4, num_hidden_layers=1,
                          num_hidden_units=8))
    dec = OnlineSplicedDecoder(model, *model.init(jax.random.PRNGKey(0)),
                               np.full((4,), 0.25, np.float32), context_width=1)
    with pytest.raises(RuntimeError, match="reset"):
        dec.step(np.zeros((1, 4, 6), np.float32), np.asarray([4]))
    with pytest.raises(RuntimeError, match="reset"):
        dec.flush()


@pytest.mark.parametrize("chunk_len", [1, 5, 64])
def test_online_ctc_beam_matches_offline(chunk_len):
    """Streaming prefix beam search == offline ctc_beam_search_py on the
    whole utterance, at any chunking (the beam state is the recursion's
    only state, advanced by the shared beam_step)."""
    from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py
    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder

    model = _model(GRU, num_labels=6)
    params, state = _params(model, seed=3)
    blank, beam = 5, 8
    rng = np.random.default_rng(7)
    b, total = 3, 48
    lengths = np.asarray([48, 31, 1], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)

    logits, _ = model.apply(params, state, jnp.asarray(x),
                            jnp.asarray(lengths), train=False)
    log_probs = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits).astype(jnp.float32), axis=-1)
    ).astype(np.float64)
    offline = [
        ctc_beam_search_py(log_probs[row, : int(n)], blank, beam)
        for row, n in enumerate(lengths)
    ]

    dec = OnlineCTCBeamDecoder(model, params, state, blank, beam_width=beam)
    dec.reset(b)
    for pos in range(0, total, chunk_len):
        ck = x[:, pos : pos + chunk_len]
        cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
        dec.step(ck, cl)
    got = dec.best()
    for row in range(b):
        np.testing.assert_array_equal(got[row], offline[row])


def test_online_ctc_beam_stable_prefix_monotone():
    """stable_prefixes() only ever grows and is always a prefix of the
    final best hypothesis of the same stream."""
    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder

    model = _model(LSTM, num_labels=6, num_layers=1)
    params, state = _params(model, seed=4)
    rng = np.random.default_rng(9)
    b, total = 2, 40
    x = rng.standard_normal((b, total, 8)).astype(np.float32)

    dec = OnlineCTCBeamDecoder(model, params, state, blank_id=5, beam_width=4)
    dec.reset(b)
    prev = [np.zeros((0,), np.int32)] * b
    for pos in range(0, total, 4):
        ck = x[:, pos : pos + 4]
        dec.step(ck, np.asarray([4, 4], np.int32))
        stable = dec.stable_prefixes()
        for row in range(b):
            # monotone growth: previous stable is a prefix of the new one
            n = prev[row].shape[0]
            assert stable[row].shape[0] >= n
            np.testing.assert_array_equal(stable[row][:n], prev[row])
        prev = stable
    final = dec.best()
    for row in range(b):
        n = prev[row].shape[0]
        np.testing.assert_array_equal(final[row][:n], prev[row])


def test_online_ctc_beam_requires_reset_and_unidirectional():
    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder

    model = _model(GRU, num_labels=6)
    params, state = _params(model)
    dec = OnlineCTCBeamDecoder(model, params, state, blank_id=5)
    with pytest.raises(RuntimeError, match="reset"):
        dec.step(np.zeros((1, 4, 8), np.float32), np.asarray([4]))
    with pytest.raises(RuntimeError, match="reset"):
        dec.best()

    bidi = _model(LSTM, bidirectional=True)
    bparams, bstate = bidi.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unidirectional"):
        OnlineCTCBeamDecoder(bidi, bparams, bstate, blank_id=5)


@pytest.mark.parametrize("family", ["tdnn", "cnn"])
@pytest.mark.parametrize("chunk_len", [1, 5, 64])
def test_online_windowed_matches_offline(family, chunk_len):
    """Streaming TDNN/CNN emission (windowed recompute with receptive-
    field lookahead) == offline Decoder on offline-spliced features, at
    any chunking. Completes streaming for every hybrid family."""
    from tfkaldi_tpu.decode.decoder import Decoder
    from tfkaldi_tpu.decode.online import OnlineWindowedDecoder
    from tfkaldi_tpu.frontend.cmvn import splice

    import jax

    dim, c, labels = 6, 1, 7
    if family == "tdnn":
        from tfkaldi_tpu.models import TDNN, TDNNConfig

        model = TDNN(TDNNConfig(
            input_dim=dim * (2 * c + 1), num_labels=labels,
            num_hidden_layers=3, num_hidden_units=16,
            context="-2,-1,0,1,2;-1,0,1;-3,0,3",
        ))
        assert (model.left_receptive, model.right_receptive) == (6, 6)
    else:
        from tfkaldi_tpu.models import CNN, CNNConfig

        model = CNN(CNNConfig(
            input_dim=dim * (2 * c + 1), num_labels=labels,
            filters="8,8", kernels="5x3;3x3", pool="2,1",
            num_channels=2 * c + 1, num_hidden_layers=1,
            num_hidden_units=16,
        ))
        assert (model.left_receptive, model.right_receptive) == (3, 3)
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.4
    )
    prior = np.full((labels,), 1.0 / labels, np.float32)

    rng = np.random.default_rng(9)
    b, total = 3, 41
    lengths = np.asarray([41, 23, 2], np.int32)
    feats = rng.standard_normal((b, total, dim)).astype(np.float32)
    for row, n in enumerate(lengths):
        feats[row, n:] = 0

    offline = np.asarray(
        Decoder(model, params, state, prior).compute_batch(
            np.asarray(splice(feats, c)), lengths
        )
    )

    dec = OnlineWindowedDecoder(model, params, state, prior, context_width=c)
    dec.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, total, chunk_len):
        ck = feats[:, pos : pos + chunk_len]
        cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
        likes, nnew = dec.step(ck, cl)
        for row in range(b):
            got[row].append(likes[row, : nnew[row]])
    likes, nnew = dec.flush()
    for row in range(b):
        got[row].append(likes[row, : nnew[row]])
    for row in range(b):
        g = np.concatenate(got[row], axis=0)
        assert g.shape[0] == lengths[row]
        np.testing.assert_allclose(
            g, offline[row, : lengths[row]], rtol=0, atol=2e-5,
            err_msg=f"{family} chunk={chunk_len} row={row}",
        )


def test_online_windowed_property_random_chunkings():
    """Randomized chunk splits over the windowed TDNN streamer: equality
    with offline for every cut pattern (property-style over the buffer /
    window index arithmetic)."""
    from tfkaldi_tpu.decode.decoder import Decoder
    from tfkaldi_tpu.decode.online import OnlineWindowedDecoder
    from tfkaldi_tpu.frontend.cmvn import splice
    from tfkaldi_tpu.models import TDNN, TDNNConfig

    import jax

    dim, c, labels = 5, 2, 6
    model = TDNN(TDNNConfig(
        input_dim=dim * (2 * c + 1), num_labels=labels,
        num_hidden_layers=2, num_hidden_units=12, context="-2,0,2;-1,0,1",
    ))
    params, state = model.init(jax.random.PRNGKey(7))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(8), params["out"]["w"].shape) * 0.4
    )
    prior = np.full((labels,), 1.0 / labels, np.float32)
    rng = np.random.default_rng(17)
    b, total = 2, 29
    lengths = np.asarray([29, 13], np.int32)
    feats = rng.standard_normal((b, total, dim)).astype(np.float32)
    for row, n in enumerate(lengths):
        feats[row, n:] = 0
    offline = np.asarray(
        Decoder(model, params, state, prior).compute_batch(
            np.asarray(splice(feats, c)), lengths
        )
    )
    for trial in range(4):
        cuts = sorted(rng.choice(np.arange(1, total), size=rng.integers(1, 7),
                                 replace=False).tolist())
        bounds = [0] + cuts + [total]
        dec = OnlineWindowedDecoder(model, params, state, prior,
                                    context_width=c)
        dec.reset(b)
        got = [[] for _ in range(b)]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            ck = feats[:, lo:hi]
            cl = np.clip(lengths - lo, 0, hi - lo).astype(np.int32)
            likes, nnew = dec.step(ck, cl)
            for row in range(b):
                got[row].append(likes[row, : nnew[row]])
        likes, nnew = dec.flush()
        for row in range(b):
            got[row].append(likes[row, : nnew[row]])
            g = np.concatenate(got[row], axis=0)
            assert g.shape[0] == lengths[row], (trial, bounds, row)
            np.testing.assert_allclose(
                g, offline[row, : lengths[row]], rtol=0, atol=2e-5,
                err_msg=f"trial={trial} bounds={bounds} row={row}",
            )
