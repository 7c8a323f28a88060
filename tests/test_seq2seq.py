"""Attention encoder-decoder (models/seq2seq.py + decode/seq2seq.py).

Pins: teacher-forcing causality, padding invariance in both axes, the
EOS target construction, label smoothing arithmetic, beam search against
an independent host oracle (same candidate layout and tie-breaks, python
loops), greedy == beam-1, monotone-in-K best scores, overfit-recovery,
mesh step equality, and the facade/CLI seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.decode.seq2seq import Seq2SeqBeamDecoder
from tfkaldi_tpu.models.seq2seq import AttentionSeq2Seq, Seq2SeqConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig

V = 4
_NEG = -1e30


def tiny_model(seed=0, enc_type="lstm", **kw):
    extra = ()
    if enc_type in ("transformer", "conformer"):
        extra = (("num_blocks", "2"), ("d_model", "12"), ("num_heads", "2"),
                 ("ffn_dim", "16"), ("conv_kernel", "3"))
        if "subsample" in kw:
            extra += (("subsample", str(kw.pop("subsample"))),)
    cfg = Seq2SeqConfig(
        input_dim=5, num_labels=V, enc_type=enc_type,
        enc_layers=1, enc_units=8, enc_extra=extra,
        dec_blocks=2, d_model=12, num_heads=2, ffn_dim=16, **kw,
    )
    model = AttentionSeq2Seq(cfg)
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state


def synth(rng, b=3, t=9, u=3):
    x = jnp.asarray(rng.standard_normal((b, t, 5)).astype(np.float32))
    xl = np.full((b,), t, np.int32)
    xl[1] = t - 3
    y = jnp.asarray(rng.integers(0, V, (b, u)).astype(np.int32))
    yl = np.asarray([u, 1, 2], np.int32)[:b]
    return x, jnp.asarray(xl), y, jnp.asarray(yl)


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in np.asarray(ids))


def test_causality():
    """Changing labels at positions >= u must not change logits at u
    (strictly causal decoder self-attention)."""
    model, params, state = tiny_model()
    # the output head is zero-init (all logits 0 would hide any leak);
    # randomize it so differences are observable
    params["out"]["w"] = jax.random.normal(
        jax.random.PRNGKey(99), params["out"]["w"].shape
    )
    rng = np.random.default_rng(1)
    x, xl, y, yl = synth(rng)
    full_yl = jnp.full_like(yl, y.shape[1])  # all positions attendable
    base, _ = model.apply_seq2seq(params, state, x, xl, y, full_yl, train=False)
    y2 = y.at[:, 2].set((y[:, 2] + 1) % V)
    got, _ = model.apply_seq2seq(params, state, x, xl, y2, full_yl, train=False)
    # logits at positions 0..2 predict labels 0..2 from inputs SOS+y[:2]
    np.testing.assert_allclose(
        np.asarray(got[:, :3]), np.asarray(base[:, :3]), rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(got[:, 3]), np.asarray(base[:, 3]))


def test_padding_invariance_both_axes():
    """Input-frame padding and label padding past the lengths must not
    change the summed loss."""
    model, params, state = tiny_model(seed=2)
    rng = np.random.default_rng(3)
    x, xl, y, yl = synth(rng)
    trainer = Trainer(model, TrainerConfig(loss_type="attention"))

    def loss(xa, ya):
        batch = PaddedBatch(jnp.asarray(xa), jnp.asarray(ya), xl, yl)
        val, _ = trainer._loss_sum(params, state, batch, train=False, rng=None)
        return float(val[0]) if isinstance(val, tuple) else float(val)

    base = loss(x, y)
    x_big = np.concatenate(
        [np.asarray(x), rng.standard_normal((3, 4, 5)).astype(np.float32) * 9],
        axis=1,
    )
    y_big = np.concatenate(
        [np.asarray(y), rng.integers(0, V, (3, 2)).astype(np.int32)], axis=1
    )
    assert loss(x_big, y_big) == pytest.approx(base, rel=1e-4)


def test_loss_uniform_at_init():
    """Zero-init output head → exactly uniform predictions, so the summed
    loss is (#valid positions) · ln(V+1) regardless of smoothing (the
    smoothed loss of a uniform predictor equals the unsmoothed one)."""
    model, params, state = tiny_model(seed=4, label_smoothing=0.1)
    rng = np.random.default_rng(5)
    x, xl, y, yl = synth(rng)
    trainer = Trainer(model, TrainerConfig(loss_type="attention"))
    batch = PaddedBatch(x, y, xl, yl)
    loss, _ = trainer._loss_sum(params, state, batch, train=False, rng=None)
    n_pos = int(np.sum(np.asarray(yl) + 1))
    assert float(loss) == pytest.approx(n_pos * np.log(V + 1), rel=1e-5)


def test_overfit_recovers_transcript():
    """A tiny model overfit on one batch decodes the training labels."""
    model, params, state = tiny_model(seed=6, label_smoothing=0.0)
    rng = np.random.default_rng(7)
    b, t = 2, 8
    x = jnp.asarray(rng.standard_normal((b, t, 5)).astype(np.float32))
    xl = jnp.full((b,), t, jnp.int32)
    y = jnp.asarray([[1, 3, 2], [0, 2, 1]], jnp.int32)
    yl = jnp.asarray([3, 3], jnp.int32)
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=3e-2, num_steps=1000,
                             loss_type="attention"),
    )
    st = trainer.init_state(jax.random.PRNGKey(8))
    batch = PaddedBatch(x, y, xl, yl)
    for i in range(150):
        st, loss = trainer.update(st, batch, jax.random.PRNGKey(9 + i))
    dec = Seq2SeqBeamDecoder(
        model, st.params, st.model_state, _IdCoder(), beam_width=2,
        max_tokens=6,
    )
    got = dec.decode_batch(np.asarray(x), np.asarray(xl))
    for row in range(b):
        np.testing.assert_array_equal(got[row], np.asarray(y[row]))


# ---------------------------------------------------------------------------
# host oracle for the beam
# ---------------------------------------------------------------------------


def _oracle_beam(model, params, state, feats_row, length, k, max_tokens):
    memory, _ = model.encode(
        params, state, jnp.asarray(feats_row[None]),
        jnp.asarray([length], jnp.int32), train=False,
    )
    mem_valid = (
        jnp.arange(memory.shape[1])[None, :]
        < model.output_lengths(jnp.asarray([length], jnp.int32))[:, None]
    )
    eos = model.sos_eos_id
    v_total = model.vocab_size

    def next_logp(prefix):
        toks = np.full((1, max_tokens + 1), 0, np.int32)
        toks[0, 0] = eos  # SOS
        toks[0, 1 : 1 + len(prefix)] = prefix
        valid = np.arange(max_tokens + 1)[None, :] <= len(prefix)
        logits = model.decode_step_logits(
            params, jnp.asarray(toks), jnp.asarray(valid), memory, mem_valid,
        )
        return np.asarray(
            jax.nn.log_softmax(logits[0, len(prefix)], axis=-1)
        )

    slots = [dict(tokens=(), score=0.0, fin=False)]
    for _ in range(k - 1):
        slots.append(dict(tokens=(), score=_NEG, fin=False))
    for _ in range(max_tokens):
        cands = []
        for ki, s in enumerate(slots):
            base = ki * (v_total + 1)
            cands.append((s["score"] if s["fin"] else _NEG, base, ki, 0))
            lp = None if s["fin"] else next_logp(s["tokens"])
            for v in range(v_total):
                sc = _NEG if s["fin"] else s["score"] + lp[v]
                if len(s["tokens"]) >= max_tokens and v != eos:
                    sc = _NEG
                cands.append((sc, base + 1 + v, ki, 1 + v))
        cands.sort(key=lambda c: (-c[0], c[1]))
        new = []
        for sc, _, parent, choice in cands[:k]:
            p = slots[parent]
            if choice == 0:
                new.append(dict(tokens=p["tokens"], score=sc, fin=True))
            elif choice == 1 + eos:
                new.append(dict(tokens=p["tokens"], score=sc, fin=True))
            else:
                new.append(dict(tokens=p["tokens"] + (choice - 1,),
                                score=sc, fin=False))
        slots = new
    for s in slots:
        if not s["fin"] and s["score"] > _NEG / 2:
            s["score"] += float(next_logp(s["tokens"])[eos])
    best = max(slots, key=lambda s: s["score"])
    return np.asarray(best["tokens"], np.int32), best["score"]


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_matches_host_oracle(seed):
    model, params, state = tiny_model(seed=seed)
    rng = np.random.default_rng(seed + 20)
    x, xl, _, _ = synth(rng, b=2, t=7)
    k, L = 3, 4
    dec = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=k, max_tokens=L
    )
    nbest = dec.decode_batch_nbest(np.asarray(x), np.asarray(xl))
    for row in range(2):
        want_ids, want_score = _oracle_beam(
            model, params, state, np.asarray(x)[row], int(xl[row]), k, L
        )
        got_ids, got_score = nbest[row][0]
        np.testing.assert_array_equal(got_ids, want_ids)
        assert got_score == pytest.approx(want_score, abs=1e-3)


def test_beam1_and_monotone_scores():
    model, params, state = tiny_model(seed=9)
    rng = np.random.default_rng(10)
    x, xl, _, _ = synth(rng)
    prev = None
    for k in (1, 2, 4):
        dec = Seq2SeqBeamDecoder(
            model, params, state, _IdCoder(), beam_width=k, max_tokens=5
        )
        best = [h[0][1] for h in dec.decode_batch_nbest(np.asarray(x), np.asarray(xl))]
        if prev is not None:
            for a, b in zip(best, prev):
                assert a >= b - 1e-4
        prev = prev if prev is not None else best
        prev = best


@pytest.mark.parametrize("enc_type", ["gru", "conformer"])
def test_encoder_families(enc_type):
    """Every sequence encoder plugs in; subsampled conformer memory
    respects output_lengths."""
    kw = {"subsample": 2} if enc_type == "conformer" else {}
    model, params, state = tiny_model(seed=11, enc_type=enc_type, **kw)
    rng = np.random.default_rng(12)
    x, xl, y, yl = synth(rng, t=10)
    logits, _ = model.apply_seq2seq(params, state, x, xl, y, yl, train=False)
    assert bool(jnp.isfinite(logits).all())
    dec = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=2, max_tokens=4
    )
    dec.decode_batch(np.asarray(x), np.asarray(xl))


def test_mesh_step_matches_single_device():
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state

    model, _, _ = tiny_model(seed=13)
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=1e-2, num_steps=10,
                             loss_type="attention"),
    )
    rng = np.random.default_rng(14)
    x, _, y, _ = synth(rng, b=8)
    batch = PaddedBatch(
        x, y, jnp.full((8,), x.shape[1], jnp.int32),
        jnp.asarray(rng.integers(1, 4, (8,)).astype(np.int32)),
    )
    state = trainer.init_state(jax.random.PRNGKey(15))
    _, loss_single = trainer.update(state, batch, jax.random.PRNGKey(16))
    mesh = make_mesh(jax.devices()[:4])
    state_m = shard_state(trainer.init_state(jax.random.PRNGKey(15)), mesh)
    batch_m = shard_batch(batch, mesh)
    _, loss_mesh = trainer.update(state_m, batch_m, jax.random.PRNGKey(16))
    np.testing.assert_allclose(
        float(loss_mesh), float(loss_single), rtol=1e-5, atol=1e-6
    )


def test_facade_pairing_and_build(tmp_path):
    from configparser import ConfigParser

    from tfkaldi_tpu.nnet import Nnet

    for model, loss in (("seq2seq", "ctc"), ("lstm", "attention")):
        cfg = ConfigParser()
        cfg.read_dict({
            "directories": {"expdir": str(tmp_path)},
            "nnet": {"name": "s", "model": model, "loss": loss,
                     "context_width": "0"},
        })
        with pytest.raises(ValueError, match="seq2seq"):
            Nnet(cfg, input_dim=4, num_labels=V)

    cfg = ConfigParser()
    cfg.read_dict({
        "directories": {"expdir": str(tmp_path)},
        "nnet": {
            "name": "s", "model": "seq2seq", "loss": "attention",
            "context_width": "0", "enc_type": "lstm",
            "num_hidden_layers": "1", "num_hidden_units": "8",
            "dec_blocks": "1", "d_model": "12", "num_heads": "2",
            "ffn_dim": "16",
        },
    })
    net = Nnet(cfg, input_dim=5, num_labels=V)
    assert isinstance(net.model, AttentionSeq2Seq)
    assert net.model.config.enc_bidirectional


# ---------------------------------------------------------------------------
# dense shallow fusion inside the jitted beam
# ---------------------------------------------------------------------------


class _Fusion:
    """Hand-built fusion table over labels + EOS (the attention column
    layout); zeros by default."""

    def __init__(self, num_labels, order=2):
        self.order = order
        self.num_context_ids = num_labels + 1
        self.bos_id = num_labels
        self.table = np.zeros(
            ((num_labels + 1) ** (order - 1), num_labels + 1), np.float32
        )


def test_zero_fusion_is_identity():
    model, params, state = tiny_model(seed=40)
    rng = np.random.default_rng(41)
    x, xl, _, _ = synth(rng)
    base = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3, max_tokens=5
    )
    fused = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3, max_tokens=5,
        fusion_table=_Fusion(V),
    )
    for a, b in zip(base.decode_batch_nbest(np.asarray(x), np.asarray(xl)),
                    fused.decode_batch_nbest(np.asarray(x), np.asarray(xl))):
        for (ai, asc), (bi, bsc) in zip(a, b):
            np.testing.assert_array_equal(ai, bi)
            assert asc == pytest.approx(bsc, abs=1e-4)


def test_eos_hungry_lm_empties_transcripts():
    """A fusion table that rewards only </s> makes the empty hypothesis
    win immediately."""
    model, params, state = tiny_model(seed=42)
    rng = np.random.default_rng(43)
    x, xl, _, _ = synth(rng)
    f = _Fusion(V)
    f.table[:, :V] = -1e6  # labels despised
    f.table[:, V] = 10.0  # EOS adored
    dec = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3, max_tokens=5,
        fusion_table=f,
    )
    for ids in dec.decode_batch(np.asarray(x), np.asarray(xl)):
        assert ids.size == 0


def test_fusion_table_width_checked():
    model, params, state = tiny_model(seed=44)
    bad = _Fusion(V)
    bad.table = bad.table[:, :V]  # missing the EOS column
    with pytest.raises(ValueError, match="EOS"):
        Seq2SeqBeamDecoder(
            model, params, state, _IdCoder(), beam_width=2,
            fusion_table=bad,
        )


def test_cached_step_matches_grid():
    """The KV-cached autoregressive step must reproduce the teacher-forced
    grid forward position by position (same prefixes, same memory)."""
    model, params, state = tiny_model(seed=50)
    # randomize the zero-init head so differences are visible
    params["out"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(51), params["out"]["w"].shape
    )
    rng = np.random.default_rng(52)
    n, t, L = 3, 7, 5
    x = jnp.asarray(rng.standard_normal((n, t, 5)).astype(np.float32))
    xl = jnp.asarray([7, 5, 6], jnp.int32)
    memory, _ = model.encode(params, state, x, xl, train=False)
    mem_valid = (
        jnp.arange(memory.shape[1])[None, :]
        < model.output_lengths(xl)[:, None]
    )
    tokens = jnp.asarray(
        np.concatenate(
            [np.full((n, 1), model.sos_eos_id, np.int32),
             rng.integers(0, V, (n, L)).astype(np.int32)], axis=1
        )
    )  # [N, L+1], SOS-led
    token_valid = jnp.ones((n, L + 1), bool)
    grid = model.decode_step_logits(
        params, tokens, token_valid, memory, mem_valid, train=False
    )  # [N, L+1, V]

    cross_k, cross_v = model.cross_kv(params, memory)
    cache = model.init_decode_cache(n, L)
    for s in range(L + 1):
        step_logits, cache = model.decode_step_cached(
            params, tokens[:, s], jnp.asarray(s, jnp.int32), cache,
            cross_k, cross_v, mem_valid,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(grid[:, s]),
            rtol=1e-5, atol=1e-5, err_msg=f"position {s}",
        )


# ---------------------------------------------------------------------------
# joint CTC-attention multitask + attention rescoring
# ---------------------------------------------------------------------------


def test_joint_loss_arithmetic_and_training():
    """loss = (1-w)·attention CE + w·CTC over the shared encoder; the CTC
    head actually trains."""
    import optax as _optax

    w = 0.3
    model, params, state = tiny_model(seed=60, ctc_weight=w,
                                      label_smoothing=0.0)
    rng = np.random.default_rng(61)
    x, xl, y, yl = synth(rng, t=10)
    trainer = Trainer(model, TrainerConfig(loss_type="attention"))
    batch = PaddedBatch(x, y, xl, yl)
    total, _ = trainer._loss_sum(params, state, batch, train=False, rng=None)

    # reconstruct from the public pieces
    att_logits, ctc_logits, _ = model.apply_joint(
        params, state, x, xl, y, yl, train=False
    )
    b, u1, _ = att_logits.shape
    eos = model.sos_eos_id
    tgt = np.concatenate([np.asarray(y), np.zeros((b, 1), np.int32)], axis=1)
    for row in range(b):
        tgt[row, int(yl[row])] = eos
    logp = np.asarray(jax.nn.log_softmax(att_logits, axis=-1))
    att_sum = 0.0
    for row in range(b):
        for u in range(int(yl[row]) + 1):
            att_sum -= logp[row, u, tgt[row, u]]
    t_enc = ctc_logits.shape[1]
    pad = (np.arange(t_enc)[None, :] >= np.asarray(xl)[:, None]).astype(np.float32)
    lpad = (np.arange(y.shape[1])[None, :] >= np.asarray(yl)[:, None]).astype(np.float32)
    ctc_sum = float(np.sum(np.asarray(_optax.ctc_loss(
        ctc_logits, jnp.asarray(pad), y, jnp.asarray(lpad), blank_id=eos
    ))))
    assert float(total) == pytest.approx((1 - w) * att_sum + w * ctc_sum,
                                         rel=1e-5)

    # both heads train
    st = trainer.init_state(jax.random.PRNGKey(62))
    head0 = np.asarray(st.params["ctc_head"]["w"]).copy()
    first = None
    for i in range(10):
        st, loss = trainer.update(st, batch, jax.random.PRNGKey(63 + i))
        first = first if first is not None else float(loss)
    assert float(loss) < first
    assert not np.allclose(np.asarray(st.params["ctc_head"]["w"]), head0)


def test_attention_rescoring_recovers_and_weights_behave():
    """Two-pass rescoring on an overfit joint model recovers the training
    transcripts; weight extremes select pure-CTC / pure-attention
    rankings without NaNs from unfilled n-best slots."""
    from tfkaldi_tpu.decode.seq2seq import CTCRescoreDecoder

    model, params, state = tiny_model(seed=64, ctc_weight=0.3,
                                      label_smoothing=0.0)
    rng = np.random.default_rng(65)
    b, t = 2, 12
    x = jnp.asarray(rng.standard_normal((b, t, 5)).astype(np.float32))
    xl = jnp.full((b,), t, jnp.int32)
    y = jnp.asarray([[1, 3, 2], [0, 2, 1]], jnp.int32)
    yl = jnp.asarray([3, 3], jnp.int32)
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=3e-2, num_steps=1000,
                             loss_type="attention"),
    )
    st = trainer.init_state(jax.random.PRNGKey(66))
    batch = PaddedBatch(x, y, xl, yl)
    for i in range(200):
        st, _ = trainer.update(st, batch, jax.random.PRNGKey(67 + i))
    for w in (0.0, 0.5, 1.0):
        dec = CTCRescoreDecoder(
            model, st.params, st.model_state, _IdCoder(),
            beam_width=4, rescore_weight=w,
        )
        got = dec.decode_batch(np.asarray(x), np.asarray(xl))
        for row in range(b):
            np.testing.assert_array_equal(
                got[row], np.asarray(y[row]), err_msg=f"w={w} row={row}"
            )


def test_rescoring_requires_joint_model():
    from tfkaldi_tpu.decode.seq2seq import CTCRescoreDecoder

    model, params, state = tiny_model(seed=68)  # ctc_weight = 0
    with pytest.raises(ValueError, match="ctc_weight"):
        CTCRescoreDecoder(model, params, state, _IdCoder())


def test_fused_beam_matches_host_oracle():
    """Device attention beam WITH dense fusion == the host oracle with
    the same table lookup (labels AND the EOS column, including the
    forced closing) — pins where the LM term enters."""
    model, params, state = tiny_model(seed=70)
    rng = np.random.default_rng(71)
    x, xl, _, _ = synth(rng, b=2, t=7)
    f = _Fusion(V, order=2)
    f.table = rng.standard_normal(f.table.shape).astype(np.float32) * 0.7
    k, L = 3, 4
    dec = Seq2SeqBeamDecoder(
        model, params, state, _IdCoder(), beam_width=k, max_tokens=L,
        fusion_table=f,
    )
    nbest = dec.decode_batch_nbest(np.asarray(x), np.asarray(xl))

    def lm_row(prefix):
        last = prefix[-1] if prefix else f.bos_id
        return f.table[last]

    eos = model.sos_eos_id
    v_total = model.vocab_size
    for row in range(2):
        memory, _ = model.encode(
            params, state, jnp.asarray(np.asarray(x)[row][None]),
            jnp.asarray([int(xl[row])], jnp.int32), train=False,
        )
        mem_valid = (
            jnp.arange(memory.shape[1])[None, :]
            < model.output_lengths(jnp.asarray([int(xl[row])], jnp.int32))[:, None]
        )

        def next_logp(prefix):
            toks = np.full((1, L + 1), 0, np.int32)
            toks[0, 0] = eos
            toks[0, 1 : 1 + len(prefix)] = prefix
            valid = np.arange(L + 1)[None, :] <= len(prefix)
            logits = model.decode_step_logits(
                params, jnp.asarray(toks), jnp.asarray(valid), memory,
                mem_valid,
            )
            return np.asarray(jax.nn.log_softmax(logits[0, len(prefix)]))

        slots = [dict(tokens=(), score=0.0, fin=False)]
        for _ in range(k - 1):
            slots.append(dict(tokens=(), score=_NEG, fin=False))
        for _ in range(L):
            cands = []
            for ki, s in enumerate(slots):
                base = ki * (v_total + 1)
                cands.append((s["score"] if s["fin"] else _NEG, base, ki, 0))
                lp = None if s["fin"] else next_logp(s["tokens"]) + lm_row(s["tokens"])
                for v in range(v_total):
                    sc = _NEG if s["fin"] else s["score"] + lp[v]
                    if len(s["tokens"]) >= L and v != eos:
                        sc = _NEG
                    cands.append((sc, base + 1 + v, ki, 1 + v))
            cands.sort(key=lambda c: (-c[0], c[1]))
            new = []
            for sc, _, parent, choice in cands[:k]:
                p = slots[parent]
                if choice == 0 or choice == 1 + eos:
                    new.append(dict(tokens=p["tokens"], score=sc, fin=True))
                else:
                    new.append(dict(tokens=p["tokens"] + (choice - 1,),
                                    score=sc, fin=False))
            slots = new
        for s in slots:
            if not s["fin"] and s["score"] > _NEG / 2:
                s["score"] += float(
                    (next_logp(s["tokens"]) + lm_row(s["tokens"]))[eos]
                )
        best = max(slots, key=lambda s: s["score"])
        got_ids, got_score = nbest[row][0]
        np.testing.assert_array_equal(
            got_ids, np.asarray(best["tokens"], np.int32)
        )
        assert got_score == pytest.approx(best["score"], abs=1e-3)
