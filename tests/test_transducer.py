"""Transducer family: model, rnnt training, greedy decode, streaming.

Covers: lattice-loss training on a learnable synthetic task (loss drop +
greedy recovery), padding invariance of the joint forward, the batched
jitted greedy search vs an independent sequential host loop, microbatch
equivalence, and streamed == offline greedy at arbitrary chunkings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.decode.transducer import OnlineTransducerDecoder, TransducerDecoder
from tfkaldi_tpu.models import Transducer, TransducerConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig

V = 4  # real labels (blank = V)


def tiny_config(**kw):
    base = dict(
        input_dim=V,
        num_labels=V,
        enc_layers=1,
        enc_units=16,
        pred_layers=1,
        pred_units=16,
        embed_dim=8,
        joint_units=16,
        scan_unroll=1,
    )
    base.update(kw)
    return TransducerConfig(**base)


def synth_batch(rng, b=8, t=12, u=3):
    """Labels are visible in the input: frame f shows the one-hot of the
    label active at that time (each label spans t//u frames)."""
    labels = rng.integers(0, V, (b, u)).astype(np.int32)
    inputs = np.zeros((b, t, V), np.float32)
    span = t // u
    for i in range(b):
        for j in range(u):
            inputs[i, j * span : (j + 1) * span, labels[i, j]] = 1.0
    return PaddedBatch(
        inputs,
        labels,
        np.full((b,), t, np.int32),
        np.full((b,), u, np.int32),
    )


def test_rnnt_training_learns_and_decodes():
    model = Transducer(tiny_config())
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=3e-2, num_steps=300, loss_type="rnnt")
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = synth_batch(rng)
    first = None
    for _ in range(300):
        state, loss = trainer.update(state, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.3 * first, (first, float(loss))

    dec = TransducerDecoder(model, state.params, state.model_state, coder=None)
    hyps = dec.decode_batch(batch.inputs, batch.input_lengths)
    correct = sum(
        np.array_equal(h, batch.targets[i]) for i, h in enumerate(hyps)
    )
    assert correct >= len(hyps) - 1, [
        (h.tolist(), batch.targets[i].tolist()) for i, h in enumerate(hyps)
    ]


def test_loss_padding_invariance():
    """Extra T/U padding (arbitrary content) must not change the loss."""
    model = Transducer(tiny_config())
    params, mstate = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    base = synth_batch(rng, b=3, t=10, u=3)

    from tfkaldi_tpu.ops.rnnt_loss import rnnt_loss

    def per_seq(batch):
        logits, _ = model.apply_transducer(
            params, mstate, batch.inputs, batch.input_lengths,
            batch.targets, batch.target_lengths, train=False,
        )
        return np.asarray(
            rnnt_loss(logits, batch.targets, batch.input_lengths,
                      batch.target_lengths, model.blank_id)
        )

    want = per_seq(base)
    pad_t, pad_u = 5, 2
    b, t, f = base.inputs.shape
    inputs = rng.standard_normal((b, t + pad_t, f)).astype(np.float32)
    inputs[:, :t] = base.inputs
    targets = rng.integers(0, V, (b, base.targets.shape[1] + pad_u)).astype(np.int32)
    targets[:, : base.targets.shape[1]] = base.targets
    padded = PaddedBatch(inputs, targets, base.input_lengths, base.target_lengths)
    np.testing.assert_allclose(per_seq(padded), want, rtol=2e-5, atol=2e-5)


def _host_greedy(model, params, feats, length, max_symbols):
    """Independent sequential greedy: one utterance, python control flow."""
    enc = np.asarray(
        model.encode(params, {}, feats[None], np.array([length], np.int32),
                     train=False)[0]
    )[0]
    carry = model.init_pred_carry(1)
    proj, carry = model.predict_step(
        params, jnp.full((1,), model.blank_id, jnp.int32),
        jnp.ones((1,), bool), carry,
    )
    out = []
    for t in range(length):
        for _ in range(max_symbols):
            logits = np.asarray(
                model.joint_step(params, jnp.asarray(enc[t][None]), proj)
            )
            tok = int(logits.argmax())
            if tok == model.blank_id:
                break
            out.append(tok)
            proj, carry = model.predict_step(
                params, jnp.array([tok], jnp.int32), jnp.ones((1,), bool), carry
            )
    return np.asarray(out, np.int32)


def test_batched_greedy_matches_sequential_oracle():
    model = Transducer(tiny_config())
    params, mstate = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    b, t = 5, 9
    feats = rng.standard_normal((b, t, V)).astype(np.float32) * 2
    lengths = np.array([9, 7, 9, 4, 1], np.int32)
    dec = TransducerDecoder(model, params, mstate, coder=None, max_symbols_per_frame=3)
    got = dec.decode_batch(feats, lengths)
    for i in range(b):
        want = _host_greedy(model, params, feats[i], int(lengths[i]), 3)
        np.testing.assert_array_equal(got[i], want)


def test_microbatched_equals_whole_batch():
    model = Transducer(tiny_config())
    rng = np.random.default_rng(3)
    batch = synth_batch(rng, b=8)
    losses = []
    for k in (1, 4):
        trainer = Trainer(
            model,
            TrainerConfig(init_learning_rate=1e-2, num_steps=10,
                          loss_type="rnnt", micro_batches=k),
        )
        state = trainer.init_state(jax.random.PRNGKey(4))
        state, loss = trainer.update(state, batch, jax.random.PRNGKey(5))
        losses.append(float(loss))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


def test_streaming_equals_offline():
    model = Transducer(tiny_config())
    params, mstate = model.init(jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    b, t = 3, 12
    feats = rng.standard_normal((b, t, V)).astype(np.float32) * 2
    lengths = np.array([12, 8, 5], np.int32)

    offline = TransducerDecoder(model, params, mstate, coder=None).decode_batch(
        feats, lengths
    )

    for chunk in (1, 3, 5, t):
        dec = OnlineTransducerDecoder(model, params, mstate)
        dec.reset(b)
        acc = [[] for _ in range(b)]
        for start in range(0, t, chunk):
            piece = feats[:, start : start + chunk]
            n = np.clip(lengths - start, 0, piece.shape[1]).astype(np.int32)
            for row, ids in enumerate(dec.step(piece, n)):
                acc[row].extend(ids.tolist())
        for row in range(b):
            np.testing.assert_array_equal(
                np.asarray(acc[row], np.int32), offline[row],
                err_msg=f"chunk={chunk} row={row}",
            )


def test_online_rejects_bidirectional_encoder():
    model = Transducer(tiny_config(enc_bidirectional=True))
    params, mstate = model.init(jax.random.PRNGKey(7))
    with pytest.raises(ValueError, match="unidirectional"):
        OnlineTransducerDecoder(model, params, mstate)


def test_mesh_step_matches_single_device():
    """rnnt training step sharded over the data axis == single-device."""
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state

    model = Transducer(tiny_config())
    trainer = Trainer(
        model,
        TrainerConfig(init_learning_rate=1e-2, num_steps=10, loss_type="rnnt"),
    )
    batch = synth_batch(np.random.default_rng(8), b=8)
    state = trainer.init_state(jax.random.PRNGKey(9))
    _, loss_single = trainer.update(state, batch, jax.random.PRNGKey(10))

    mesh = make_mesh(jax.devices()[:4])
    state_m = shard_state(trainer.init_state(jax.random.PRNGKey(9)), mesh)
    batch_m = shard_batch(batch, mesh)
    _, loss_mesh = trainer.update(state_m, batch_m, jax.random.PRNGKey(10))
    np.testing.assert_allclose(
        float(loss_mesh), float(loss_single), rtol=1e-5, atol=1e-6
    )


def test_facade_rejects_mismatched_model_loss():
    from configparser import ConfigParser

    from tfkaldi_tpu.nnet import Nnet

    for model, loss in (("transducer", "ctc"), ("lstm", "rnnt")):
        cfg = ConfigParser()
        cfg.read_dict({
            "directories": {"expdir": "/tmp/x"},
            "nnet": {"name": "n", "model": model, "loss": loss,
                     "context_width": "0"},
        })
        with pytest.raises(ValueError, match="transducer"):
            Nnet(cfg, input_dim=4, num_labels=4)


def test_streaming_transducer_transcriber_equals_offline():
    """StreamingTransducerTranscriber (audio chunks → features → CMVN →
    greedy transducer) ends at exactly the offline pipeline's transcripts."""
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.frontend import FeatureExtractor, FeatureOpts, OnlineFeatureExtractor
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")

    rng = np.random.default_rng(12)
    lengths = np.asarray([8000, 5003])
    sig = (rng.standard_normal((2, 8000)) * 3000).astype(np.float32)
    for row, n in enumerate(lengths):
        sig[row, n:] = 0

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    model = Transducer(tiny_config(input_dim=10))
    params, mstate = model.init(jax.random.PRNGKey(13))

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline_ids = TransducerDecoder(
        model, params, mstate, _IdCoder()
    ).decode_batch(off_norm, off_nf)
    offline_text = [_IdCoder().decode(ids) for ids in offline_ids]

    tx = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(ext), model, params, mstate, _IdCoder(), cmvn=stats
    )
    tx.reset(2)
    for pos in range(0, 8000, 1000):
        c = sig[:, pos : pos + 1000]
        cl = np.clip(lengths - pos, 0, c.shape[1])
        partial = tx.push(c, cl)
        assert len(partial) == 2  # partials available mid-stream
    final = tx.finish()
    assert final == offline_text
