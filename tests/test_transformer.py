"""Transformer/Conformer acoustic model family (models/transformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import Transformer, TransformerConfig
from tfkaldi_tpu.models.transformer import sinusoidal_positions
from tfkaldi_tpu.train import Trainer, TrainerConfig


def _model(**over):
    cfg = dict(
        input_dim=8, num_labels=5, num_blocks=2, d_model=16, num_heads=2,
        ffn_dim=32,
    )
    cfg.update(over)
    return Transformer(TransformerConfig(**cfg))


def _rand_params(model, seed=0):
    params, state = model.init(jax.random.PRNGKey(seed))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(seed + 1), params["out"]["w"].shape)
        * 0.3
    )
    return params, state


def test_config_validation():
    with pytest.raises(ValueError, match="divisible"):
        TransformerConfig(input_dim=8, num_labels=5, d_model=16, num_heads=3)
    with pytest.raises(ValueError, match="odd"):
        TransformerConfig(
            input_dim=8, num_labels=5, conformer=True, conv_kernel=4
        )


def test_shapes_state_and_zero_init_output():
    model = _model(conformer=True)
    params, state = model.init(jax.random.PRNGKey(0))
    assert state["bn_conv_mean"].shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(params["out"]["w"]), 0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 8)), jnp.float32)
    lengths = jnp.asarray([12, 7], jnp.int32)
    logits, new_state = model.apply(params, state, x, lengths, train=True,
                                    dropout_rng=jax.random.PRNGKey(1))
    assert logits.shape == (2, 12, 5)
    # zero-init output layer -> zero logits at init (family convention)
    np.testing.assert_allclose(np.asarray(logits), 0.0, atol=1e-6)
    # training updates conformer conv BN stats
    assert not np.allclose(np.asarray(new_state["bn_conv_mean"]), 0.0)


@pytest.mark.parametrize("conformer", [False, True])
def test_padding_invariance(conformer):
    """Valid-frame logits must not depend on the amount OR the content of
    padding (masked attention keys, masked conv input, inter-block
    re-masking)."""
    model = _model(conformer=conformer)
    params, state = _rand_params(model)
    rng = np.random.default_rng(1)
    b, t, f = 3, 20, 8
    lengths = np.asarray([20, 13, 4], np.int32)
    x = rng.standard_normal((b, t, f)).astype(np.float32)

    base, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(lengths),
                          train=False)
    base = np.asarray(base)

    # garbage in the padding
    x_garbage = x.copy()
    for row, n in enumerate(lengths):
        x_garbage[row, n:] = 1e3 * rng.standard_normal((t - n, f))
    got, _ = model.apply(params, state, jnp.asarray(x_garbage),
                         jnp.asarray(lengths), train=False)
    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[row, :n], base[row, :n], rtol=0, atol=1e-5
        )

    # longer padding
    x_long = np.concatenate([x, np.zeros((b, 9, f), np.float32)], axis=1)
    got, _ = model.apply(params, state, jnp.asarray(x_long),
                         jnp.asarray(lengths), train=False)
    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[row, :n], base[row, :n], rtol=0, atol=1e-5
        )


def test_rows_are_independent():
    model = _model()
    params, state = _rand_params(model)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    lengths = jnp.asarray([10, 10], jnp.int32)
    a, _ = model.apply(params, state, jnp.asarray(x), lengths, train=False)
    x2 = x.copy()
    x2[1] = rng.standard_normal((10, 8))
    b, _ = model.apply(params, state, jnp.asarray(x2), lengths, train=False)
    np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(b)[0])
    assert not np.allclose(np.asarray(a)[1], np.asarray(b)[1])


def test_numpy_oracle_single_block():
    """Full forward (1 block, plain transformer) against an independent
    numpy implementation: in_proj+PE -> preLN MHSA -> preLN FFN -> final
    LN -> output layer."""
    model = _model(num_blocks=1, d_model=8, num_heads=2, ffn_dim=12)
    params, state = _rand_params(model, seed=5)
    rng = np.random.default_rng(3)
    b, t, f = 2, 6, 8
    lengths = np.asarray([6, 4], np.int32)
    x = rng.standard_normal((b, t, f)).astype(np.float32)

    got, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(lengths),
                         train=False)
    got = np.asarray(got)

    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)

    def ln(h, g, bb, eps=1e-6):
        m = h.mean(-1, keepdims=True)
        v = ((h - m) ** 2).mean(-1, keepdims=True)
        return (h - m) / np.sqrt(v + eps) * g + bb

    mask = (np.arange(t)[None, :] < lengths[:, None])
    h = x.astype(np.float64) @ p["in_proj"]["w"] + p["in_proj"]["b"]
    h = h + sinusoidal_positions(t, 8).astype(np.float64)
    h = h * mask[:, :, None]
    blk = p["blocks"][0]

    z = ln(h, blk["ln_attn"]["g"], blk["ln_attn"]["b"])
    a = blk["attn"]
    q = (z @ a["wq"] + a["bq"]).reshape(b, t, 2, 4)
    k = (z @ a["wk"] + a["bk"]).reshape(b, t, 2, 4)
    v = (z @ a["wv"] + a["bv"]).reshape(b, t, 2, 4)
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(4.0)
    scores = np.where(mask[:, None, None, :], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ctx = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, 8)
    h = h + (ctx @ a["wo"] + a["bo"])

    z = ln(h, blk["ln_ffn"]["g"], blk["ln_ffn"]["b"])
    u = z @ blk["ffn"]["w1"] + blk["ffn"]["b1"]
    u = u / (1 + np.exp(-u))  # swish
    h = h + (u @ blk["ffn"]["w2"] + blk["ffn"]["b2"])
    h = h * mask[:, :, None]

    h = ln(h, p["ln_final"]["g"], p["ln_final"]["b"])
    want = h @ p["out"]["w"] + p["out"]["b"]

    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            got[row, :n], want[row, :n], rtol=0, atol=2e-4
        )


def test_dropout_needs_rng_and_is_deterministic():
    model = _model(dropout=0.5)
    params, state = _rand_params(model)
    x = jnp.ones((1, 4, 8), jnp.float32)
    lengths = jnp.asarray([4], jnp.int32)
    with pytest.raises(ValueError, match="dropout_rng"):
        model.apply(params, state, x, lengths, train=True)
    a, _ = model.apply(params, state, x, lengths, train=True,
                       dropout_rng=jax.random.PRNGKey(7))
    b_, _ = model.apply(params, state, x, lengths, train=True,
                        dropout_rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_reinit_output_layer():
    model = _model()
    params, _ = _rand_params(model)
    out = model.reinit_output_layer(params)
    np.testing.assert_array_equal(np.asarray(out["out"]["w"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(out["blocks"][0]["attn"]["wq"]),
        np.asarray(params["blocks"][0]["attn"]["wq"]),
    )


@pytest.mark.parametrize("conformer", [False, True])
def test_trains_on_learnable_synthetic(conformer):
    model = _model(conformer=conformer, num_blocks=2)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.02, num_steps=50))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    label_map = rng.standard_normal((8, 5))
    x = rng.standard_normal((8, 30, 8)).astype(np.float32)
    y = np.argmax(x @ label_map, axis=-1).astype(np.int32)
    lengths = np.full(8, 30, np.int32)
    batch = PaddedBatch(jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths),
                        jnp.asarray(lengths))
    losses = []
    for _ in range(25):
        state, loss = trainer.update(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:: max(len(losses) // 5, 1)]


def test_nnet_selector_and_full_train_decode(tmp_path):
    """`model = transformer` drives the whole pipeline: controller
    training, prior, batched likelihood decode to ark."""
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.io import ArkReader, ArkWriter
    from tfkaldi_tpu.nnet import Nnet

    featdir, alifile, info = make_featdir(tmp_path, learnable=True)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "xfnet", "model": "transformer", "context_width": "0",
        "num_blocks": "2", "d_model": "16", "num_heads": "2",
        "ffn_dim": "32", "conformer": "True",
        "add_layer_period": "0", "starting_step": "0", "nonlin": "relu",
        "l2_norm": "False", "dropout": "1", "batch_norm": "True",
        "num_epochs": "2", "initial_learning_rate": "0.01",
        "learning_rate_decay": "1", "batch_size": "4",
        "numutterances_per_minibatch": "-1", "valid_batches": "1",
        "valid_frequency": "4", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "10", "visualise": "False",
    }

    def reader():
        return FeatureReader(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 0, 60
        )

    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader(), coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    net.train(disp)

    writer = ArkWriter(str(tmp_path / "likes.scp"), str(tmp_path / "likes.ark"))
    n = net.decode(reader(), writer)
    assert n == 12
    back = ArkReader(str(tmp_path / "likes.scp"))
    _, mat, _ = back.read_next_utt()
    assert mat.shape[1] == info["num_labels"] and np.isfinite(mat).all()


def test_layerwise_init_rejected():
    from configparser import ConfigParser

    from tfkaldi_tpu.nnet import Nnet

    cfg = ConfigParser()
    cfg["directories"] = {"expdir": "/tmp/xfnet-reject"}
    cfg["nnet"] = {
        "name": "x", "model": "transformer", "context_width": "0",
        "add_layer_period": "5",
    }
    with pytest.raises(ValueError, match="layerwise"):
        Nnet(cfg, input_dim=8, num_labels=5)


# ----------------------------------------------------------------------
# time-restricted attention + streaming
# ----------------------------------------------------------------------


def test_right_context_zero_is_causal():
    """With attention_right_context = 0 (+ causal conv), changing future
    frames must not change current logits."""
    model = _model(conformer=True, causal_conv=True, conv_kernel=5,
                   left_context=4, right_context=0)
    params, state = _rand_params(model)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 12, 8)).astype(np.float32)
    lengths = jnp.asarray([12], jnp.int32)
    base, _ = model.apply(params, state, jnp.asarray(x), lengths, train=False)
    x2 = x.copy()
    x2[0, 7:] = rng.standard_normal((5, 8))
    got, _ = model.apply(params, state, jnp.asarray(x2), lengths, train=False)
    np.testing.assert_array_equal(np.asarray(got)[0, :7], np.asarray(base)[0, :7])
    assert not np.allclose(np.asarray(got)[0, 7:], np.asarray(base)[0, 7:])


def test_left_context_restricts_attention():
    """A 1-block model with left_context = L must ignore frames older
    than L (the single attention layer is the only time mixing)."""
    model = _model(num_blocks=1, left_context=3, right_context=0)
    params, state = _rand_params(model)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 10, 8)).astype(np.float32)
    lengths = jnp.asarray([10], jnp.int32)
    base, _ = model.apply(params, state, jnp.asarray(x), lengths, train=False)
    x2 = x.copy()
    x2[0, 0] = rng.standard_normal(8)  # frame 0 is outside frame 9's [6, 9]
    got, _ = model.apply(params, state, jnp.asarray(x2), lengths, train=False)
    np.testing.assert_array_equal(np.asarray(got)[0, 9], np.asarray(base)[0, 9])
    assert not np.allclose(np.asarray(got)[0, 0], np.asarray(base)[0, 0])


def test_validate_streamable():
    with pytest.raises(ValueError, match="right_context"):
        _model().validate_streamable()
    with pytest.raises(ValueError, match="right_context"):
        _model(left_context=4, right_context=2).validate_streamable()
    with pytest.raises(ValueError, match="causal_conv"):
        _model(conformer=True, left_context=4,
               right_context=0).validate_streamable()
    _model(left_context=4, right_context=0).validate_streamable()
    _model(conformer=True, causal_conv=True, conv_kernel=5, left_context=0,
           right_context=0).validate_streamable()


@pytest.mark.parametrize("conformer", [False, True])
@pytest.mark.parametrize("splits", [[4, 8, 20], [1] * 32, [20, 12], [32]])
def test_stream_equals_offline(conformer, splits):
    """apply_stream over any chunking == offline apply at valid frames
    (cached keys + causal conv cache + per-row positions)."""
    model = _model(
        conformer=conformer, causal_conv=conformer, conv_kernel=5,
        left_context=6, right_context=0, num_blocks=2,
    )
    params, state = _rand_params(model)
    rng = np.random.default_rng(8)
    b, total = 3, 32
    lengths = np.asarray([32, 19, 3], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)
    for row, n in enumerate(lengths):
        x[row, n:] = 0

    offline, _ = model.apply(params, state, jnp.asarray(x),
                             jnp.asarray(lengths), train=False)

    carry = model.init_stream_carry(b)
    outs = []
    pos = 0
    for tc in splits:
        chunk = x[:, pos : pos + tc]
        chunk_len = np.clip(lengths - pos, 0, chunk.shape[1]).astype(np.int32)
        logits, carry = model.apply_stream(
            params, state, jnp.asarray(chunk), jnp.asarray(chunk_len), carry
        )
        outs.append(np.asarray(logits))
        pos += chunk.shape[1]
    streamed = np.concatenate(outs, axis=1)[:, :total]

    for row, n in enumerate(lengths):
        np.testing.assert_allclose(
            streamed[row, :n], np.asarray(offline)[row, :n], rtol=0, atol=2e-5
        )


def test_streaming_ctc_decoder_accepts_streamable_conformer():
    """The online decoders accept a streamable conformer and reproduce
    offline best-path CTC, chunked."""
    from tfkaldi_tpu.decode import CTCDecoder
    from tfkaldi_tpu.decode.online import OnlineCTCDecoder

    model = _model(
        num_labels=6, conformer=True, causal_conv=True, conv_kernel=5,
        left_context=6, right_context=0, num_blocks=2,
    )
    params, state = _rand_params(model, seed=9)
    rng = np.random.default_rng(10)
    b, total = 2, 24
    lengths = np.asarray([24, 13], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)
    for row, n in enumerate(lengths):
        x[row, n:] = 0

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline = CTCDecoder(model, params, state, _IdCoder(), 5).decode_batch(
        x, lengths
    )

    dec = OnlineCTCDecoder(model, params, state, blank_id=5)
    dec.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, total, 8):
        ck = x[:, pos : pos + 8]
        cl = np.clip(lengths - pos, 0, 8).astype(np.int32)
        for row, ids in enumerate(dec.step(ck, cl)):
            got[row].extend(ids.tolist())
    for row in range(b):
        np.testing.assert_array_equal(np.asarray(got[row], np.int32), offline[row])


def test_online_decoder_rejects_unstreamable_transformer():
    from tfkaldi_tpu.decode.online import OnlineCTCDecoder

    model = _model()
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="right_context"):
        OnlineCTCDecoder(model, params, state, blank_id=4)


# ----------------------------------------------------------------------
# stacking front-end (subsample, CTC only)
# ----------------------------------------------------------------------


def test_subsample_shapes_and_output_lengths():
    model = _model(subsample=4, num_blocks=1)
    params, state = model.init(jax.random.PRNGKey(0))
    assert params["in_proj"]["w"].shape == (8 * 4, 16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 22, 8)),
                    jnp.float32)
    lengths = jnp.asarray([22, 9], jnp.int32)
    logits, _ = model.apply(params, state, x, lengths, train=False)
    assert logits.shape == (2, 6, 5)  # ceil(22/4) with pad -> 24/4
    np.testing.assert_array_equal(
        np.asarray(model.output_lengths(lengths)), [6, 3]
    )
    assert model.subsample_factor == 4
    with pytest.raises(ValueError, match="subsample"):
        _model(subsample=0)
    # a subsampled model streams when (and only when) causal
    with pytest.raises(ValueError, match="context"):
        _model(subsample=4).validate_streamable()
    _model(subsample=4, left_context=4, right_context=0).validate_streamable()


@pytest.mark.parametrize("chunk", [1, 2, 3, 7])
def test_subsample_streaming_equals_offline(chunk):
    """The stacking front-end streams exactly: buffered raw frames emit
    complete groups as they fill, ``apply_stream_flush`` emits the final
    zero-padded partial group, and the concatenated valid positions equal
    the offline forward — at any chunking, with ragged per-row lengths
    (including ones that are not multiples of s)."""
    model = _model(subsample=2, num_blocks=2, conformer=True, conv_kernel=3,
                   causal_conv=True, left_context=4, right_context=0)
    params, state = _rand_params(model, seed=31)
    rng = np.random.default_rng(32)
    b, t = 3, 11
    x = rng.standard_normal((b, t, 8)).astype(np.float32)
    lens = np.asarray([11, 8, 5], np.int32)
    off, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(lens),
                         train=False)
    off = np.asarray(off)
    out_lens = np.asarray(model.output_lengths(jnp.asarray(lens)))

    carry = model.init_stream_carry(b)
    got = [[] for _ in range(b)]
    for start in range(0, t, chunk):
        piece = x[:, start : start + chunk]
        n = np.clip(lens - start, 0, piece.shape[1]).astype(np.int32)
        n_out = np.asarray(model.stream_output_lengths(carry, jnp.asarray(n)))
        out, carry = model.apply_stream(
            params, state, jnp.asarray(piece), jnp.asarray(n), carry
        )
        out = np.asarray(out)
        for r in range(b):
            got[r].extend(out[r, : n_out[r]])
    fo, nf, carry = model.apply_stream_flush(params, state, carry)
    fo, nf = np.asarray(fo), np.asarray(nf)
    for r in range(b):
        if nf[r]:
            got[r].append(fo[r, 0])
    for r in range(b):
        g = np.asarray(got[r])
        assert g.shape[0] == out_lens[r]
        np.testing.assert_allclose(
            g, off[r, : out_lens[r]], rtol=1e-5, atol=1e-5,
            err_msg=f"chunk={chunk} row={r}",
        )
    # a second flush is a no-op (buffer already drained)
    _, nf2, _ = model.apply_stream_flush(params, state, carry)
    assert int(np.asarray(nf2).sum()) == 0


def test_subsample_padding_content_invariance():
    """Padding content must not leak into the boundary stacked group."""
    model = _model(subsample=4, num_blocks=1, conformer=True,
                   causal_conv=True, conv_kernel=5)
    params, state = _rand_params(model)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 16, 8)).astype(np.float32)
    lengths = np.asarray([16, 10], np.int32)  # row 1 boundary group straddles
    base, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(lengths),
                          train=False)
    x2 = x.copy()
    for row, n in enumerate(lengths):
        x2[row, n:] = 1e3 * rng.standard_normal((16 - n, 8))
    got, _ = model.apply(params, state, jnp.asarray(x2), jnp.asarray(lengths),
                         train=False)
    out_n = np.asarray(model.output_lengths(jnp.asarray(lengths)))
    for row in range(2):
        np.testing.assert_allclose(
            np.asarray(got)[row, : out_n[row]],
            np.asarray(base)[row, : out_n[row]], rtol=0, atol=1e-5,
        )


def test_subsample_ctc_trains_and_ce_rejected():
    model = _model(subsample=2, num_blocks=2, num_labels=6)
    trainer = Trainer(model, TrainerConfig(
        init_learning_rate=0.02, num_steps=50, loss_type="ctc", ctc_blank_id=5,
    ))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(12)
    x = rng.standard_normal((4, 30, 8)).astype(np.float32)
    y = rng.integers(0, 5, (4, 5)).astype(np.int32)
    in_len = np.full(4, 30, np.int32)
    tgt_len = np.full(4, 5, np.int32)
    batch = PaddedBatch(jnp.asarray(x), jnp.asarray(y), jnp.asarray(in_len),
                        jnp.asarray(tgt_len))
    losses = []
    for _ in range(20):
        state, loss = trainer.update(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[::5]

    ce_trainer = Trainer(model, TrainerConfig(init_learning_rate=0.01))
    ce_state = ce_trainer.init_state(jax.random.PRNGKey(0))
    y_frames = rng.integers(0, 6, (4, 30)).astype(np.int32)
    ce_batch = PaddedBatch(jnp.asarray(x), jnp.asarray(y_frames),
                           jnp.asarray(in_len), jnp.asarray(in_len))
    with pytest.raises(ValueError, match="CTC-only"):
        ce_trainer.update(ce_state, ce_batch)


def test_subsample_ctc_decode_uses_output_lengths():
    from tfkaldi_tpu.decode import CTCDecoder

    model = _model(subsample=4, num_blocks=1, num_labels=6)
    params, state = _rand_params(model, seed=7)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    dec = CTCDecoder(model, params, state, _IdCoder(), 5, beam_width=2)
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    lengths = np.asarray([20, 7], np.int32)
    out = dec.decode_batch(x, lengths)
    # at most ceil(n/4) emissions per row (5 and 2 output frames)
    assert len(out) == 2
    assert out[0].shape[0] <= 5 and out[1].shape[0] <= 2


def test_subsample_requires_ctc_in_facade():
    from configparser import ConfigParser

    from tfkaldi_tpu.nnet import Nnet

    cfg = ConfigParser()
    cfg["directories"] = {"expdir": "/tmp/xf-sub-reject"}
    cfg["nnet"] = {
        "name": "x", "model": "conformer", "context_width": "0",
        "subsample": "4", "add_layer_period": "0",
    }
    with pytest.raises(ValueError, match="loss = ctc"):
        Nnet(cfg, input_dim=8, num_labels=5)


@pytest.mark.parametrize("chunk", [3, 5])
def test_subsampled_ctc_streaming_equals_offline(chunk):
    """Streaming greedy AND prefix-beam CTC over the causal SUBSAMPLED
    conformer equal the offline decoders (whose lattice includes the
    ceil tail group), chunked arbitrarily, with finish() draining the
    front-end buffer."""
    from tfkaldi_tpu.decode import CTCDecoder
    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder, OnlineCTCDecoder

    model = _model(
        num_labels=6, conformer=True, causal_conv=True, conv_kernel=3,
        left_context=6, right_context=0, num_blocks=2, subsample=2,
    )
    params, state = _rand_params(model, seed=41)
    rng = np.random.default_rng(42)
    b, total = 2, 13
    lengths = np.asarray([13, 9], np.int32)
    x = rng.standard_normal((b, total, 8)).astype(np.float32)
    for row, n in enumerate(lengths):
        x[row, n:] = 0

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    off_greedy = CTCDecoder(model, params, state, _IdCoder(), 5).decode_batch(
        x, lengths
    )
    off_beam = CTCDecoder(
        model, params, state, _IdCoder(), 5, beam_width=3
    ).decode_batch(x, lengths)

    dec = OnlineCTCDecoder(model, params, state, blank_id=5)
    dec.reset(b)
    got = [[] for _ in range(b)]
    for pos in range(0, total, chunk):
        ck = x[:, pos : pos + chunk]
        cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
        for row, ids in enumerate(dec.step(ck, cl)):
            got[row].extend(ids.tolist())
    for row, ids in enumerate(dec.finish()):
        got[row].extend(ids.tolist())
    for row in range(b):
        np.testing.assert_array_equal(
            np.asarray(got[row], np.int32), off_greedy[row],
            err_msg=f"greedy chunk={chunk} row={row}",
        )

    beam = OnlineCTCBeamDecoder(model, params, state, blank_id=5,
                                beam_width=3)
    beam.reset(b)
    for pos in range(0, total, chunk):
        ck = x[:, pos : pos + chunk]
        cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
        beam.step(ck, cl)
    final = beam.finish()
    for row in range(b):
        np.testing.assert_array_equal(
            final[row], off_beam[row],
            err_msg=f"beam chunk={chunk} row={row}",
        )


@pytest.mark.parametrize("s", [2, 3, 5])
def test_subsample_streaming_property(s):
    """Randomized chunk splits × ragged lengths × subsample factors: the
    buffered stacking front-end + flush equals offline for EVERY
    chunking (property-style over the trickiest index arithmetic)."""
    model = _model(subsample=s, num_blocks=1, conformer=True, conv_kernel=3,
                   causal_conv=True, left_context=3, right_context=0,
                   d_model=12, num_heads=2, ffn_dim=16)
    params, state = _rand_params(model, seed=50 + s)
    rng = np.random.default_rng(60 + s)
    b, t = 3, 17
    x = rng.standard_normal((b, t, 8)).astype(np.float32)
    lens = np.asarray(sorted(rng.integers(1, t + 1, b))[::-1], np.int32)
    lens[0] = t
    off, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(lens),
                         train=False)
    off = np.asarray(off)
    out_lens = np.asarray(model.output_lengths(jnp.asarray(lens)))

    for trial in range(4):
        # random chunk split of [0, t)
        cuts = sorted(rng.choice(np.arange(1, t), size=rng.integers(1, 6),
                                 replace=False).tolist())
        bounds = [0] + cuts + [t]
        carry = model.init_stream_carry(b)
        got = [[] for _ in range(b)]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            piece = x[:, lo:hi]
            n = np.clip(lens - lo, 0, hi - lo).astype(np.int32)
            n_out = np.asarray(
                model.stream_output_lengths(carry, jnp.asarray(n))
            )
            out, carry = model.apply_stream(
                params, state, jnp.asarray(piece), jnp.asarray(n), carry
            )
            out = np.asarray(out)
            for r in range(b):
                got[r].extend(out[r, : n_out[r]])
        fo, nf, carry = model.apply_stream_flush(params, state, carry)
        fo, nf = np.asarray(fo), np.asarray(nf)
        for r in range(b):
            if nf[r]:
                got[r].append(fo[r, 0])
            g = np.asarray(got[r])
            assert g.shape[0] == out_lens[r], (s, trial, bounds, r)
            np.testing.assert_allclose(
                g, off[r, : out_lens[r]], rtol=1e-5, atol=1e-5,
                err_msg=f"s={s} trial={trial} bounds={bounds} row={r}",
            )
