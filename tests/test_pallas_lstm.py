"""Interleaved-direction Pallas LSTM kernel vs the XLA custom-VJP scan.

CI has no TPU, so the kernels run through the Pallas interpreter; on the
real chip the same comparisons were measured bit-exact (values and dgx
grads 0.0 absolute; dwh 4e-7 relative from the hoisted matmul's
accumulation order) at T=256, B=32, H=512, bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.ops import pallas_lstm
from tfkaldi_tpu.ops.lstm_scan import lstm_scan
from tfkaldi_tpu.ops.pallas_lstm import lstm_scan_bidi

T, B, H = 16, 8, 128


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_lstm.interpret = True
    yield
    pallas_lstm.interpret = False


def _data(seed=0):
    rng = np.random.default_rng(seed)
    gxf = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    gxb = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    whf = jnp.asarray((rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32))
    whb = jnp.asarray((rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32))
    lengths = np.array([T, T - 3, T // 2, 5, 2, 1, T, T - 1])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :])[:, :, None].astype(np.float32)
    )
    cotf = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    cotb = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    return gxf, gxb, whf, whb, mask, cotf, cotb


def test_forward_matches_xla_scan():
    gxf, gxb, whf, whb, mask, _, _ = _data()
    yf1, yb1 = lstm_scan_bidi(gxf, gxb, whf, whb, mask, jnp.float32, 8)
    yf2 = lstm_scan(gxf, whf, mask, jnp.float32, 1)
    yb2 = lstm_scan(gxb, whb, mask, jnp.float32, 1, reverse=True)
    np.testing.assert_allclose(np.asarray(yf1), np.asarray(yf2), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yb1), np.asarray(yb2), rtol=0, atol=1e-6)


def test_grads_match_xla_scan():
    gxf, gxb, whf, whb, mask, cotf, cotb = _data()

    def loss_pallas(gf, gb, wf, wb):
        yf, yb = lstm_scan_bidi(gf, gb, wf, wb, mask, jnp.float32, 8)
        return jnp.sum(yf * cotf) + jnp.sum(yb * cotb)

    def loss_xla(gf, gb, wf, wb):
        yf = lstm_scan(gf, wf, mask, jnp.float32, 1)
        yb = lstm_scan(gb, wb, mask, jnp.float32, 1, reverse=True)
        return jnp.sum(yf * cotf) + jnp.sum(yb * cotb)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(gxf, gxb, whf, whb)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(gxf, gxb, whf, whb)
    for a, b, name in zip(g1, g2, ("dgxf", "dgxb", "dwhf", "dwhb")):
        scale = np.max(np.abs(np.asarray(b))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5 * scale, err_msg=name
        )


def test_model_pallas_equals_xla():
    """The full BiLSTM model produces the same logits either way."""
    from tfkaldi_tpu.models import LSTM, RNNConfig

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, 12)).astype(np.float32))
    lengths = jnp.asarray([T, T - 3, T // 2, 5, 2, 1, T, T - 1])

    def run(impl):
        model = LSTM(
            RNNConfig(
                input_dim=12, num_labels=7, num_layers=2, hidden_units=H,
                bidirectional=True, scan_unroll=1, scan_impl=impl,
            )
        )
        params, state = model.init(jax.random.PRNGKey(0))
        params["out"]["w"] = (
            jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.3
        )
        logits, _ = model.apply(params, state, x, lengths, train=False)
        return logits

    np.testing.assert_allclose(
        np.asarray(run("pallas")), np.asarray(run("xla")), rtol=0, atol=1e-5
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device mesh")
def test_pallas_trains_on_mesh_data_parallel():
    """The kernels run under GSPMD on a data-sharded batch via their
    custom_partitioning rules; the mesh loss matches the single-device
    XLA-scan loss (same global batch, grads psum over 'data')."""
    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import LSTM, RNNConfig
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    b, t, f = 16, 16, 4
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    y = rng.integers(0, 3, (b, t)).astype(np.int32)
    lengths = np.full(b, t, np.int32)
    lengths[b // 2:] = t - 5
    batch = PaddedBatch(x, y, lengths, lengths)

    def train(impl, on_mesh):
        model = LSTM(
            RNNConfig(input_dim=f, num_labels=3, num_layers=1, hidden_units=H,
                      bidirectional=True, scan_unroll=1, scan_impl=impl)
        )
        trainer = Trainer(model, TrainerConfig(init_learning_rate=0.01, num_steps=10))
        state = trainer.init_state(jax.random.PRNGKey(0))
        bb = batch
        if on_mesh:
            mesh = make_mesh(data=8, model=1)
            state = shard_state(state, mesh)
            bb = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, loss = trainer.update(state, bb, jax.random.PRNGKey(i))
            losses.append(float(loss))
        return losses

    mesh_pallas = train("pallas", on_mesh=True)
    single_xla = train("xla", on_mesh=False)
    np.testing.assert_allclose(mesh_pallas, single_xla, rtol=1e-5)


def test_unsupported_shapes_fall_back():
    """auto falls back to the XLA scan off-TPU / with unaligned shapes;
    forcing pallas with bad shapes raises."""
    from tfkaldi_tpu.models import LSTM, RNNConfig

    model = LSTM(
        RNNConfig(input_dim=4, num_labels=3, num_layers=1, hidden_units=16,
                  bidirectional=True, scan_unroll=1, scan_impl="auto")
    )
    assert not model._use_pallas(t=10, b=3, h_units=16)

    model_forced = LSTM(
        RNNConfig(input_dim=4, num_labels=3, num_layers=1, hidden_units=16,
                  bidirectional=True, scan_unroll=1, scan_impl="pallas")
    )
    with pytest.raises(ValueError, match="scan_impl='pallas'"):
        model_forced._use_pallas(t=10, b=3, h_units=16)


def test_supported_vmem_guard():
    """supported() rejects shapes whose backward-kernel working set
    exceeds the scoped-VMEM cap (measured compile failure at b=256,
    T=256, H=512 on v5e) while keeping the measured-good b=128."""
    from tfkaldi_tpu.ops.pallas_lstm import supported

    assert supported(256, 128, 512)   # measured optimum (1.12M f/s)
    assert not supported(256, 256, 512)   # > 112 MiB working set
    assert supported(256, 32, 1024)
    assert not supported(256, 128, 1024)


def test_auto_gate_checks_local_shard(monkeypatch):
    """Under multiple devices the custom_partitioning rule hands each
    device its LOCAL batch shard, so scan_impl='auto' must validate the
    kernel constraints for b/n_dev, not the global batch."""
    from tfkaldi_tpu.models import LSTM, RNNConfig

    monkeypatch.setattr(pallas_lstm, "available", lambda: True)
    model = LSTM(
        RNNConfig(input_dim=8, num_labels=4, num_layers=1, hidden_units=128,
                  bidirectional=True, scan_unroll=1, scan_impl="auto")
    )
    n_dev = jax.device_count()
    assert n_dev == 8  # conftest: simulated 8-device CPU mesh
    # global B=16 passes the kernel's B%8==0 check, but the worst-case
    # local shard is 2 -> must fall back to the XLA scan
    assert not model._use_pallas(t=64, b=16, h_units=128)
    # global B=64 -> worst-case local shard 8 -> kernel stays eligible
    assert model._use_pallas(t=64, b=64, h_units=128)
