"""GRU family: gru_scan op vs an autodiff oracle, model behavior, pipeline.

The oracle is a plain inline ``lax.scan`` of the same fused-formulation
GRU step (r, z from the recurrent projection; the reset gate applied to
the recurrent candidate projection), differentiated by JAX autodiff —
the same methodology as tests/test_lstm_scan.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import GRU, RNNConfig
from tfkaldi_tpu.ops.gru_scan import gru_scan
from tfkaldi_tpu.train import Trainer, TrainerConfig

T, B, H = 48, 4, 16


def oracle_scan(gx, wh, mask, cd):
    whc = wh.astype(cd)

    def step(h, xs):
        gxt, m = xs
        gh = jax.lax.dot_general(
            h.astype(cd), whc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ghr, ghz, ghn = jnp.split(gh, 3, axis=1)
        gxr, gxz, gxn = jnp.split(gxt, 3, axis=1)
        r = jax.nn.sigmoid(gxr + ghr)
        z = jax.nn.sigmoid(gxz + ghz)
        n = jnp.tanh(gxn + r * ghn)
        h_new = jnp.where(m, (1.0 - z) * n + z * h, h)
        return h_new, h_new * m

    zeros = jnp.zeros((gx.shape[1], wh.shape[0]), jnp.float32)
    _, ys = jax.lax.scan(step, zeros, (gx, mask), unroll=1)
    return ys


def _data(seed=0):
    rng = np.random.default_rng(seed)
    gx = jnp.asarray(rng.standard_normal((T, B, 3 * H)).astype(np.float32))
    wh = jnp.asarray((rng.standard_normal((H, 3 * H)) / np.sqrt(H)).astype(np.float32))
    lengths = np.array([T, T - 17, 7, 1])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :])[:, :, None].astype(np.float32)
    )
    cot = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    return gx, wh, mask, cot, lengths


@pytest.mark.parametrize("unroll", [1, 4])
def test_forward_matches_oracle(unroll):
    gx, wh, mask, _, _ = _data()
    got = gru_scan(gx, wh, mask, jnp.float32, unroll)
    want = oracle_scan(gx, wh, mask, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


def test_grads_match_autodiff_oracle():
    gx, wh, mask, cot, _ = _data()

    g1 = jax.grad(
        lambda a, b: jnp.sum(gru_scan(a, b, mask, jnp.float32, 1) * cot),
        argnums=(0, 1),
    )(gx, wh)
    g2 = jax.grad(
        lambda a, b: jnp.sum(oracle_scan(a, b, mask, jnp.float32) * cot),
        argnums=(0, 1),
    )(gx, wh)
    for a, b in zip(g1, g2):
        scale = np.max(np.abs(np.asarray(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-4 * scale
        )


def test_padded_steps_get_zero_gradient():
    gx, wh, mask, cot, lengths = _data()
    dgx = jax.grad(
        lambda a: jnp.sum(gru_scan(a, wh, mask, jnp.float32, 1) * cot)
    )(gx)
    dgx = np.asarray(dgx)
    for col, n in enumerate(lengths):
        assert np.all(dgx[n:, col, :] == 0.0), f"utt {col} leaks grads into padding"
        if n > 1:
            assert np.any(dgx[: n - 1, col, :] != 0.0)


def test_reverse_equals_flip_scan_flip():
    gx, wh, mask, cot, _ = _data()

    y1 = gru_scan(gx, wh, mask, jnp.float32, 1, reverse=True)
    y2 = jnp.flip(gru_scan(jnp.flip(gx, 0), wh, jnp.flip(mask, 0), jnp.float32, 1), 0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=0, atol=0)

    def loss_rev(a, b):
        return jnp.sum(gru_scan(a, b, mask, jnp.float32, 1, reverse=True) * cot)

    def loss_flip(a, b):
        ys = gru_scan(jnp.flip(a, 0), b, jnp.flip(mask, 0), jnp.float32, 1)
        return jnp.sum(jnp.flip(ys, 0) * cot)

    g1 = jax.grad(loss_rev, argnums=(0, 1))(gx, wh)
    g2 = jax.grad(loss_flip, argnums=(0, 1))(gx, wh)
    for a, b in zip(g1, g2):
        # the flipped variant contracts the hoisted dwh matmul over (T, B)
        # in the opposite order — f32 reduction-order noise only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=3e-6)


# ----------------------------------------------------------------------
# model level


def _model(bidirectional=False, layers=2, hidden=16, in_dim=8, out=5):
    return GRU(
        RNNConfig(
            input_dim=in_dim, num_labels=out, num_layers=layers,
            hidden_units=hidden, bidirectional=bidirectional, scan_unroll=1,
        )
    )


def test_param_shapes_are_3h():
    model = _model(bidirectional=True)
    params, _ = model.init(jax.random.PRNGKey(0))
    assert params["layers"][0][0]["wx"].shape == (8, 3 * 16)
    assert params["layers"][0][0]["wh"].shape == (16, 3 * 16)
    assert params["layers"][0][0]["b"].shape == (3 * 16,)
    assert np.all(np.asarray(params["layers"][0][0]["b"]) == 0.0)
    # second layer consumes both directions
    assert params["layers"][1][0]["wx"].shape == (32, 3 * 16)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_padding_invariance(bidirectional):
    model = _model(bidirectional=bidirectional)
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


def test_gru_trains_with_frame_ce():
    """Same learnable task as the LSTM test (label = sign of running sum)."""
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


def test_gru_nnet_facade_train_decode(tmp_path):
    """`model = gru` drives the full pipeline: controller training, prior,
    batched likelihood decode to ark."""
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
        "name": "grunet", "model": "gru", "context_width": "1",
        "bidirectional": "True", "scan_unroll": "1",
        "num_hidden_units": "16", "num_hidden_layers": "1",
        "add_layer_period": "0", "starting_step": "0", "nonlin": "relu",
        "l2_norm": "False", "dropout": "1", "batch_norm": "False",
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
    assert isinstance(net.model, GRU)
    net.train(disp)

    writer = ArkWriter(str(tmp_path / "likes.scp"), str(tmp_path / "likes.ark"))
    n = net.decode(reader(), writer)
    assert n == 12
    back = ArkReader(str(tmp_path / "likes.scp"))
    _, mat, _ = back.read_next_utt()
    assert mat.shape[1] == info["num_labels"] and np.isfinite(mat).all()
