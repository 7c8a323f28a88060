"""Conformer-transducer: self-attention encoders inside the RNN-T family.

The modern production streaming recipe — a conformer encoder (optionally
with the stacking subsample front-end) feeding the transducer lattice.
Composition of machinery each tested on its own (models/transformer.py,
models/transducer.py, ops/rnnt_loss.py); these tests pin the seams:
subsampled lattice lengths, encoder BN state threading, padding
invariance, greedy/beam decode, exact causal streaming, and the facade.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.decode.transducer import (
    OnlineTransducerDecoder,
    TransducerDecoder,
)
from tfkaldi_tpu.decode.transducer_beam import TransducerBeamDecoder
from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig

V = 4


def conf_config(subsample=1, streaming=False, **kw):
    extra = {
        "num_blocks": "2",
        "d_model": "16",
        "num_heads": "2",
        "ffn_dim": "24",
        "conv_kernel": "3",
        "subsample": str(subsample),
    }
    if streaming:
        extra["attention_left_context"] = "4"
        extra["attention_right_context"] = "0"
        extra["causal_conv"] = "True"
    return TransducerConfig(
        input_dim=5, num_labels=V, enc_type="conformer",
        pred_layers=1, pred_units=8, embed_dim=4, joint_units=12,
        joint_chunk_t=3, enc_extra=tuple(extra.items()), **kw,
    )


def synth_batch(rng, b=3, t=12, u=3):
    x = rng.standard_normal((b, t, 5)).astype(np.float32)
    xl = np.full((b,), t, np.int32)
    xl[1] = t - 3
    y = rng.integers(0, V, (b, u)).astype(np.int32)
    yl = np.asarray([u, 1, 2], np.int32)[:b]
    return PaddedBatch(jnp.asarray(x), jnp.asarray(y),
                       jnp.asarray(xl), jnp.asarray(yl))


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in np.asarray(ids))


@pytest.mark.parametrize("subsample", [1, 2])
def test_trains_and_threads_bn_state(subsample):
    """Loss is finite and decreases; the conformer's BN running stats
    (model_state['enc']) actually update through the fused score path."""
    model = Transducer(conf_config(subsample=subsample))
    assert model.subsample_factor == subsample
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=5e-2, num_steps=50,
                             loss_type="rnnt"),
    )
    batch = synth_batch(np.random.default_rng(0))
    state = trainer.init_state(jax.random.PRNGKey(1))
    mean0 = np.asarray(state.model_state["enc"]["bn_conv_mean"]).copy()
    first = None
    for i in range(8):
        state, loss = trainer.update(state, batch, jax.random.PRNGKey(2 + i))
        assert np.isfinite(float(loss))
        first = first if first is not None else float(loss)
    assert float(loss) < first
    mean1 = np.asarray(state.model_state["enc"]["bn_conv_mean"])
    assert not np.allclose(mean0, mean1), "encoder BN state never updated"


def test_subsampled_lattice_matches_materialized():
    """With subsample = 2 the lattice T axis is the ceil(n/2) encoder
    frames; fused scores == materialized logits path on those frames."""
    from tfkaldi_tpu.ops.rnnt_loss import (
        mask_label_scores,
        rnnt_alpha_loss,
        rnnt_loss,
    )

    model = Transducer(conf_config(subsample=2))
    params, mstate = model.init(jax.random.PRNGKey(3))
    batch = synth_batch(np.random.default_rng(4), t=11)  # odd → ceil
    enc_lens = model.output_lengths(batch.input_lengths)
    np.testing.assert_array_equal(np.asarray(enc_lens), [6, 4, 6])

    logits, _ = model.apply_transducer(
        params, mstate, batch.inputs, batch.input_lengths,
        batch.targets, batch.target_lengths, train=False,
    )
    assert logits.shape[1] == 6  # ceil(11 / 2)
    want = rnnt_loss(logits, batch.targets, enc_lens,
                     batch.target_lengths, model.blank_id)
    lpb, lpl, _ = model.lattice_scores(
        params, mstate, batch.inputs, batch.input_lengths,
        batch.targets, batch.target_lengths, train=False,
    )
    got = rnnt_alpha_loss(
        lpb, mask_label_scores(lpl, batch.target_lengths),
        enc_lens, batch.target_lengths,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_padding_invariance():
    """Extra input-frame padding must not change the per-seq loss
    (masked attention + masked conv + subsample boundary masking)."""
    from tfkaldi_tpu.ops.rnnt_loss import mask_label_scores, rnnt_alpha_loss

    model = Transducer(conf_config(subsample=2))
    params, mstate = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    batch = synth_batch(rng, t=10)

    def per_seq(b):
        lpb, lpl, _ = model.lattice_scores(
            params, mstate, b.inputs, b.input_lengths,
            b.targets, b.target_lengths, train=False,
        )
        return np.asarray(rnnt_alpha_loss(
            lpb, mask_label_scores(lpl, b.target_lengths),
            model.output_lengths(b.input_lengths), b.target_lengths,
        ))

    base = per_seq(batch)
    x_big = np.concatenate(
        [np.asarray(batch.inputs),
         rng.standard_normal((3, 5, 5)).astype(np.float32) * 9], axis=1
    )
    padded = PaddedBatch(jnp.asarray(x_big), batch.targets,
                         batch.input_lengths, batch.target_lengths)
    np.testing.assert_allclose(per_seq(padded), base, rtol=1e-4, atol=1e-5)


def test_greedy_and_beam_decode():
    """Both decoders run the conformer encoder (beam-1 == greedy) and
    respect the subsampled frame budget."""
    model = Transducer(conf_config(subsample=2))
    params, mstate = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 10, 5)).astype(np.float32)
    lens = np.asarray([10, 7], np.int32)
    greedy = TransducerDecoder(
        model, params, mstate, _IdCoder()
    ).decode_batch(x, lens)
    beam1 = TransducerBeamDecoder(
        model, params, mstate, _IdCoder(), beam_width=1
    ).decode_batch(x, lens)
    for g, b in zip(greedy, beam1):
        np.testing.assert_array_equal(g, b)
        assert len(g) <= 5 * 4  # ceil(10/2) frames * max_symbols
    # wider beam runs too
    TransducerBeamDecoder(
        model, params, mstate, _IdCoder(), beam_width=3
    ).decode_batch(x, lens)


@pytest.mark.parametrize("chunk", [1, 4])
def test_streaming_equals_offline(chunk):
    """A causal conformer encoder (left-context attention, causal conv,
    subsample = 1) streams exactly: chunked greedy == offline greedy."""
    model = Transducer(conf_config(streaming=True))
    params, mstate = model.init(jax.random.PRNGKey(9))
    rng = np.random.default_rng(10)
    b, t = 2, 9
    x = rng.standard_normal((b, t, 5)).astype(np.float32)
    lens = np.asarray([t, t - 2], np.int32)
    offline = TransducerDecoder(
        model, params, mstate, _IdCoder()
    ).decode_batch(x, lens)

    dec = OnlineTransducerDecoder(model, params, mstate)
    dec.reset(b)
    acc = [[] for _ in range(b)]
    for start in range(0, t, chunk):
        piece = x[:, start : start + chunk]
        n = np.clip(lens - start, 0, piece.shape[1]).astype(np.int32)
        for row, ids in enumerate(dec.step(piece, n)):
            acc[row].extend(ids.tolist())
    for row in range(b):
        np.testing.assert_array_equal(
            np.asarray(acc[row], np.int32), offline[row],
            err_msg=f"chunk={chunk} row={row}",
        )


@pytest.mark.parametrize("chunk", [1, 3])
def test_subsampled_streaming_equals_offline(chunk):
    """The production config — causal conformer WITH the subsampling
    front-end — streams exactly: chunked greedy + finish() equals the
    offline greedy decode (whose lattice includes the ceil tail group)."""
    model = Transducer(conf_config(subsample=2, streaming=True))
    params, mstate = model.init(jax.random.PRNGKey(21))
    rng = np.random.default_rng(22)
    b, t = 2, 9
    x = rng.standard_normal((b, t, 5)).astype(np.float32)
    lens = np.asarray([9, 7], np.int32)
    offline = TransducerDecoder(
        model, params, mstate, _IdCoder()
    ).decode_batch(x, lens)

    dec = OnlineTransducerDecoder(model, params, mstate)
    dec.reset(b)
    acc = [[] for _ in range(b)]
    for start in range(0, t, chunk):
        piece = x[:, start : start + chunk]
        n = np.clip(lens - start, 0, piece.shape[1]).astype(np.int32)
        for row, ids in enumerate(dec.step(piece, n)):
            acc[row].extend(ids.tolist())
    for row, ids in enumerate(dec.finish()):
        acc[row].extend(ids.tolist())
    for row in range(b):
        np.testing.assert_array_equal(
            np.asarray(acc[row], np.int32), offline[row],
            err_msg=f"chunk={chunk} row={row}",
        )


@pytest.mark.parametrize("chunk", [2, 4])
def test_subsampled_streaming_beam_equals_offline(chunk):
    """Same for the beam: chunked fused state + finish() == offline."""
    from tfkaldi_tpu.decode.transducer_beam import (
        OnlineTransducerBeamDecoder,
        TransducerBeamDecoder,
    )

    model = Transducer(conf_config(subsample=2, streaming=True))
    params, mstate = model.init(jax.random.PRNGKey(23))
    rng = np.random.default_rng(24)
    b, t = 2, 8
    x = rng.standard_normal((b, t, 5)).astype(np.float32)
    lens = np.asarray([8, 5], np.int32)
    want = TransducerBeamDecoder(
        model, params, mstate, _IdCoder(), beam_width=3, max_tokens=64
    ).decode_batch(x, lens)
    online = OnlineTransducerBeamDecoder(
        model, params, mstate, beam_width=3, max_tokens=64
    )
    online.reset(b)
    for start in range(0, t, chunk):
        piece = x[:, start : start + chunk]
        n = np.clip(lens - start, 0, piece.shape[1]).astype(np.int32)
        online.step(piece, n)
    got = online.finish()
    for gi, wi in zip(got, want):
        np.testing.assert_array_equal(gi, wi)


def test_noncausal_conformer_rejects_streaming():
    model = Transducer(conf_config(subsample=1))
    params, mstate = model.init(jax.random.PRNGKey(11))
    with pytest.raises(ValueError, match="causal|context"):
        OnlineTransducerDecoder(model, params, mstate)


def test_facade_builds_conformer_transducer(tmp_path):
    """`model = transducer` + `enc_type = conformer` through the config
    system builds the self-attention encoder."""
    from configparser import ConfigParser

    from tfkaldi_tpu.nnet import Nnet

    cfg = ConfigParser()
    cfg.read_dict({
        "directories": {"expdir": str(tmp_path)},
        "nnet": {
            "name": "ct", "model": "transducer", "loss": "rnnt",
            "context_width": "0", "enc_type": "conformer",
            "num_blocks": "2", "d_model": "16", "num_heads": "2",
            "ffn_dim": "24", "conv_kernel": "3", "subsample": "2",
            "pred_units": "8", "embed_dim": "4", "joint_units": "12",
        },
    })
    net = Nnet(cfg, input_dim=5, num_labels=V)
    from tfkaldi_tpu.models.transformer import Transformer

    assert isinstance(net.model.encoder, Transformer)
    assert net.model.encoder.config.conformer
    assert net.model.subsample_factor == 2
