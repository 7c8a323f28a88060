"""TDNN acoustic model family (models/tdnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import TDNN, TDNNConfig
from tfkaldi_tpu.models.tdnn import parse_context, _shift
from tfkaldi_tpu.train import Trainer, TrainerConfig


def test_parse_context():
    assert parse_context("-2,-1,0,1,2;-1,0,1;0", 3) == ((-2, -1, 0, 1, 2), (-1, 0, 1), (0,))
    # short specs repeat the last group; single group applies everywhere
    assert parse_context("-1,0,1", 3) == ((-1, 0, 1),) * 3
    assert parse_context("-3,0,3;0", 4) == ((-3, 0, 3), (0,), (0,), (0,))
    with pytest.raises(ValueError):
        parse_context("", 2)


def test_shift_zero_fill():
    x = jnp.arange(2 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 1)
    fwd = np.asarray(_shift(x, 1))
    np.testing.assert_array_equal(fwd[0, :, 0], [1, 2, 3, 0])
    bwd = np.asarray(_shift(x, -2))
    np.testing.assert_array_equal(bwd[0, :, 0], [0, 0, 0, 1])


def _model(**over):
    cfg = dict(
        input_dim=8, num_labels=5, num_hidden_layers=3, num_hidden_units=16,
        context="-2,-1,0,1,2;-1,0,1;-3,0,3",
    )
    cfg.update(over)
    return TDNN(TDNNConfig(**cfg))


def test_shapes_and_state():
    model = _model()
    params, state = model.init(jax.random.PRNGKey(0))
    # layer input widths follow the per-layer offset counts
    assert params["hidden"][0]["w"].shape == (8 * 5, 16)
    assert params["hidden"][1]["w"].shape == (16 * 3, 16)
    assert params["hidden"][2]["w"].shape == (16 * 3, 16)
    x = jnp.zeros((2, 12, 8))
    lengths = jnp.asarray([12, 7], jnp.int32)
    logits, new_state = model.apply(params, state, x, lengths, train=True)
    assert logits.shape == (2, 12, 5)
    assert new_state["bn_mean"].shape == (3, 16)


def test_padding_invariance():
    """Garbage in the padding region must not change valid-frame logits
    (input masking + masked BN + interlayer re-masking + zero-fill
    shifts). The output head is randomized — zero-init logits are all
    zero and would hide any hidden-layer leak (which is exactly how the
    input-masking bug this test now pins survived round 3's first
    version)."""
    model = _model()
    params, state = model.init(jax.random.PRNGKey(1))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["out"]["w"].shape) * 0.1
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 20, 8)).astype(np.float32))
    lengths = jnp.asarray([20, 11, 5], jnp.int32)
    frame_ok = (jnp.arange(20)[None, :] < lengths[:, None])[..., None]
    poisoned = jnp.where(frame_ok, x, 1e3)
    la, _ = model.apply(params, state, jnp.where(frame_ok, x, 0.0), lengths, train=True)
    lb, _ = model.apply(params, state, poisoned, lengths, train=True)
    mask = np.asarray(frame_ok)[:, :, 0]
    np.testing.assert_allclose(
        np.asarray(la)[mask], np.asarray(lb)[mask], atol=1e-5
    )


def test_receptive_field_uses_context():
    """A frame's logits must depend on its neighbors (the whole point of
    the time-delay splices)."""
    model = _model(batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(2))
    # break the zero-init output head so logits reflect the hidden stack
    params["out"]["w"] = jax.random.normal(jax.random.PRNGKey(3), params["out"]["w"].shape) * 0.1
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    lengths = jnp.asarray([16], jnp.int32)
    la, _ = model.apply(params, state, x, lengths, train=False)
    x2 = x.at[0, 4].add(1.0)  # perturb frame 4 only
    lb, _ = model.apply(params, state, x2, lengths, train=False)
    diff = np.abs(np.asarray(la - lb))[0].max(axis=1)
    assert diff[4] > 0
    assert diff[2] > 0 and diff[6] > 0, "context frames unaffected — no splicing?"
    # total receptive field of (-2..2)+(-1..1)+(-3,0,3): +-6 frames —
    # frames at distance > 6 from the perturbation stay bit-identical
    assert diff[11] == 0 and diff[12] == 0 and diff[15] == 0


def test_trains_on_learnable_synthetic():
    model = _model()
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.02, num_steps=50))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    label_map = rng.standard_normal((8, 5))
    x = rng.standard_normal((8, 30, 8)).astype(np.float32)
    y = np.argmax(x @ label_map, axis=-1).astype(np.int32)
    lengths = np.full(8, 30, np.int32)
    batch = PaddedBatch(jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths), jnp.asarray(lengths))
    losses = []
    for _ in range(25):
        state, loss = trainer.update(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:: max(len(losses) // 5, 1)]


def test_nnet_selector_and_full_train_decode(tmp_path):
    """`model = tdnn` drives the whole pipeline: controller training,
    prior, batched likelihood decode to ark."""
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
        "name": "tdnnnet", "model": "tdnn", "context_width": "0",
        "num_hidden_units": "16", "num_hidden_layers": "3",
        "tdnn_context": "-2,-1,0,1,2;-1,0,1;-3,0,3",
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
    cfg["directories"] = {"expdir": "/tmp/x"}
    cfg["nnet"] = {"name": "t", "model": "tdnn", "context_width": "0",
                   "add_layer_period": "5"}
    with pytest.raises(ValueError, match="layerwise"):
        Nnet(cfg, input_dim=8, num_labels=5)