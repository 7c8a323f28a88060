"""LSTM acoustic model: shapes, padding invariance, training, CTC pairing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import LSTM, RNNConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig


def _model(bidirectional=False, layers=2, hidden=16, in_dim=8, out=5):
    return LSTM(
        RNNConfig(
            input_dim=in_dim,
            num_labels=out,
            num_layers=layers,
            hidden_units=hidden,
            bidirectional=bidirectional,
            scan_unroll=1,  # unrolling only pays on TPU; keep CI compiles fast
        )
    )


def test_forward_shapes():
    model = _model(bidirectional=True)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 12, 8)).astype(np.float32))
    logits, _ = model.apply(params, state, x, jnp.asarray([12, 7, 3]), train=False)
    assert logits.shape == (3, 12, 5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_padding_invariance(bidirectional):
    """Valid-frame logits must not change when more padding is appended —
    the carry freeze makes even the backward direction immune."""
    model = _model(bidirectional=bidirectional)
    # non-zero output layer so logits reflect the recurrence
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.3
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    lengths = jnp.asarray([10, 6])
    short, _ = model.apply(params, state, jnp.asarray(x), lengths, train=False)

    x_pad = np.concatenate([x, rng.standard_normal((2, 5, 8)).astype(np.float32)], 1)
    x_pad[0, 10:] = 0.0
    x_pad[1, 6:] = 7.7  # garbage in the padding must not matter
    long, _ = model.apply(params, state, jnp.asarray(x_pad), lengths, train=False)

    np.testing.assert_allclose(
        np.asarray(short[0, :10]), np.asarray(long[0, :10]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(short[1, :6]), np.asarray(long[1, :6]), atol=1e-5
    )


def test_lstm_trains_with_frame_ce():
    """The generic Trainer drives the LSTM unchanged; loss decreases on a
    learnable frame-labeling task (label = sign of a running input sum)."""
    rng = np.random.default_rng(0)
    b, t, f = 8, 20, 4
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    y = (np.cumsum(x[:, :, 0], axis=1) > 0).astype(np.int32)
    batch = PaddedBatch(x, y, np.full(b, t, np.int32), np.full(b, t, np.int32))

    model = _model(in_dim=f, out=2, hidden=16, layers=1)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.05, num_steps=80))
    state = trainer.init_state(jax.random.PRNGKey(0))
    losses = []
    for i in range(80):
        state, loss = trainer.update(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::20]


def test_lstm_ctc_nnet_facade(tmp_path):
    """`model = lstm` + `loss = ctc` through the Nnet facade end to end."""
    import os
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import FeatureReader, TextBatchDispenser, TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, _, info = make_featdir(tmp_path, utts_per_speaker=4)
    with open(os.path.join(featdir, "text"), "w") as f:
        for utt in info["utts"]:
            f.write(f"{utt} HI\n")
    coder = TextCoder(aurora4_normalizer)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "lstmctc", "model": "lstm", "loss": "ctc", "bidirectional": "True",
        "scan_unroll": "1",
        "context_width": "1", "num_hidden_units": "16", "num_hidden_layers": "1",
        "add_layer_period": "0", "starting_step": "0", "nonlin": "relu",
        "l2_norm": "False", "dropout": "1", "batch_norm": "False",
        "num_epochs": "1", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "0",
        "valid_frequency": "100", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "100", "visualise": "False",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    disp = TextBatchDispenser(reader, coder, 4, os.path.join(featdir, "text"))
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    state = net.train(disp)
    assert int(state.step) > 0

    reader2 = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    out = str(tmp_path / "text.out")
    n = net.decode_text(reader2, coder, out)
    assert n == len(info["utts"])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device mesh")
def test_lstm_trains_on_mesh():
    """LSTM params replicate on the mesh; batch shards over 'data'."""
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state

    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    b, t, f = 8, 12, 4
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    y = rng.integers(0, 3, (b, t)).astype(np.int32)
    batch = shard_batch(
        PaddedBatch(x, y, np.full(b, t, np.int32), np.full(b, t, np.int32)), mesh
    )
    model = _model(in_dim=f, out=3, hidden=8, layers=1, bidirectional=True)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.01, num_steps=10))
    state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    state, loss = trainer.update(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
