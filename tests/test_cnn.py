"""CNN acoustic model family (models/cnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import CNN, CNNConfig
from tfkaldi_tpu.models.cnn import _parse_kernels
from tfkaldi_tpu.train import Trainer, TrainerConfig


def test_parse_kernels():
    assert _parse_kernels("9x3;3x3", 2) == ((9, 3), (3, 3))
    # short specs repeat the last entry
    assert _parse_kernels("3x3", 3) == ((3, 3),) * 3
    with pytest.raises(ValueError):
        _parse_kernels("9", 1)
    with pytest.raises(ValueError):
        _parse_kernels("", 1)


def _model(**over):
    cfg = dict(
        input_dim=16, num_labels=5, filters="8,12", kernels="5x3;3x3",
        pool="2,1", num_channels=1, num_hidden_layers=2, num_hidden_units=16,
    )
    cfg.update(over)
    return CNN(CNNConfig(**cfg))


def test_shapes_and_state():
    model = _model()
    params, state = model.init(jax.random.PRNGKey(0))
    assert params["conv"][0]["w"].shape == (5, 3, 1, 8)
    assert params["conv"][1]["w"].shape == (3, 3, 8, 12)
    # freq 16 → pool 2 → 8, pool 1 → 8; flattened conv out = 8*12
    assert model.config.conv_output_dim() == 8 * 12
    assert params["hidden"][0]["w"].shape == (8 * 12, 16)
    x = jnp.zeros((2, 12, 16))
    lengths = jnp.asarray([12, 7], jnp.int32)
    logits, new_state = model.apply(params, state, x, lengths, train=True)
    assert logits.shape == (2, 12, 5)
    assert new_state["bn_conv_mean"][0].shape == (8,)
    assert new_state["bn_mean"].shape == (2, 16)


def test_splice_channels_reshape():
    """context_width splices become conv channels: input [B,T,S*F] with
    S copies must reach the conv as S channels of the raw F bands."""
    model = _model(input_dim=3 * 16, num_channels=3, filters="4", kernels="1x1",
                   pool="1", num_hidden_layers=0, batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(0))
    # 1x1 kernel that only passes channel s through filter s (identity-ish)
    w = np.zeros((1, 1, 3, 4), np.float32)
    w[0, 0, 0, 0] = 1.0  # filter 0 reads channel 0 (the t-1 splice copy)
    w[0, 0, 2, 1] = 1.0  # filter 1 reads channel 2 (the t+1 splice copy)
    params["conv"][0]["w"] = jnp.asarray(w)
    params["out"]["w"] = jnp.eye(16 * 4, 5, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 3, 16)).astype(np.float32)  # [B,T,S,F]
    logits, _ = model.apply(
        params, state, jnp.asarray(x.reshape(1, 6, 48)),
        jnp.asarray([6], jnp.int32), train=False,
    )
    # h after conv is [B,T,F,C] flattened [F*C]; out.w = eye picks h[..., :5]
    # which is relu(channel-0 copy) of bands 0 (C=4 → band f occupies 4 slots)
    expect_band0_ch0 = np.maximum(x[0, :, 0, 0], 0.0)  # filter 0 ← splice copy 0
    np.testing.assert_allclose(np.asarray(logits)[0, :, 0], expect_band0_ch0, rtol=1e-5)
    expect_band0_ch1 = np.maximum(x[0, :, 2, 0], 0.0)  # filter 1 ← splice copy 2
    np.testing.assert_allclose(np.asarray(logits)[0, :, 1], expect_band0_ch1, rtol=1e-5)


def test_conv_oracle_numpy():
    """The conv stack matches a direct numpy SAME-conv for a single layer."""
    model = _model(filters="6", kernels="3x3", pool="1", num_hidden_layers=0,
                   batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(1))
    params["out"]["w"] = jnp.eye(16 * 6, 5, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 16)).astype(np.float32)
    logits, _ = model.apply(
        params, state, jnp.asarray(x), jnp.asarray([8], jnp.int32), train=False
    )
    w = np.asarray(params["conv"][0]["w"])  # [3,3,1,6]
    xp = np.pad(x[0], ((1, 1), (1, 1)))  # SAME zero pad (time, freq)
    out = np.zeros((8, 16, 6), np.float32)
    for t in range(8):
        for f in range(16):
            patch = xp[t : t + 3, f : f + 3]  # [3,3]
            out[t, f] = np.einsum("tf,tfo->o", patch, w[:, :, 0, :])
    out = np.maximum(out, 0.0).reshape(8, -1)
    np.testing.assert_allclose(np.asarray(logits)[0], out[:, :5], rtol=2e-5, atol=2e-5)


def test_padding_invariance():
    """Garbage in the padding region must not change valid-frame logits
    (input masking + masked BN + interlayer re-masking + zero-fill SAME
    time padding). Randomized output head — zero-init logits would hide
    a hidden-layer leak."""
    model = _model()
    params, state = model.init(jax.random.PRNGKey(1))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["out"]["w"].shape) * 0.1
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 20, 16)).astype(np.float32))
    lengths = jnp.asarray([20, 11, 5], jnp.int32)
    frame_ok = (jnp.arange(20)[None, :] < lengths[:, None])[..., None]
    poisoned = jnp.where(frame_ok, x, 1e3)
    la, _ = model.apply(params, state, jnp.where(frame_ok, x, 0.0), lengths, train=True)
    lb, _ = model.apply(params, state, poisoned, lengths, train=True)
    mask = np.asarray(frame_ok)[:, :, 0]
    np.testing.assert_allclose(np.asarray(la)[mask], np.asarray(lb)[mask], atol=1e-5)


def test_receptive_field_time_kernel():
    """A frame's logits depend on neighbors within the conv time kernels
    and on nothing beyond."""
    model = _model(batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(2))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(3), params["out"]["w"].shape) * 0.1
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16)).astype(np.float32))
    lengths = jnp.asarray([16], jnp.int32)
    la, _ = model.apply(params, state, x, lengths, train=False)
    lb, _ = model.apply(params, state, x.at[0, 4].add(1.0), lengths, train=False)
    diff = np.abs(np.asarray(la - lb))[0].max(axis=1)
    assert diff[4] > 0
    assert diff[3] > 0 and diff[5] > 0, "neighbor frames unaffected — no time conv?"
    # 5x3 then 3x3 SAME convs: time radius (5//2)+(3//2)=3; beyond is exact
    assert diff[0] == 0 and diff[8] == 0 and diff[15] == 0


def test_trains_on_learnable_synthetic():
    model = _model()
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.02, num_steps=50))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    label_map = rng.standard_normal((16, 5))
    x = rng.standard_normal((8, 30, 16)).astype(np.float32)
    y = np.argmax(x @ label_map, axis=-1).astype(np.int32)
    lengths = np.full(8, 30, np.int32)
    batch = PaddedBatch(jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths), jnp.asarray(lengths))
    losses = []
    for _ in range(25):
        state, loss = trainer.update(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:: max(len(losses) // 5, 1)]


def test_nnet_selector_and_full_train_decode(tmp_path):
    """`model = cnn` drives the whole pipeline: controller training,
    prior, batched likelihood decode to ark — with splice channels."""
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
        "name": "cnnnet", "model": "cnn", "context_width": "1",
        "cnn_filters": "8,8", "cnn_kernels": "5x3;3x3", "cnn_pool": "2,1",
        "num_hidden_units": "16", "num_hidden_layers": "2",
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
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
        )

    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader(), coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    # splice copies became channels: 3 channels of the raw feat dim
    assert net.model.config.num_channels == 3
    assert net.model.config.freq_dim == info["feat_dim"]
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
    cfg["nnet"] = {"name": "c", "model": "cnn", "context_width": "0",
                   "add_layer_period": "5"}
    with pytest.raises(ValueError, match="layerwise"):
        Nnet(cfg, input_dim=8, num_labels=5)
