"""Multi-device sharding tests on the simulated 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state
from tfkaldi_tpu.train import Trainer, TrainerConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def _setup(batch_norm=True):
    model = DNN(
        DNNConfig(
            input_dim=24,
            num_labels=10,
            num_hidden_layers=2,
            num_hidden_units=32,
            batch_norm=batch_norm,
        )
    )
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=20))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, t = 8, 16
    lengths = rng.integers(4, t + 1, size=b).astype(np.int32)
    inputs = rng.standard_normal((b, t, 24)).astype(np.float32)
    targets = rng.integers(0, 10, (b, t)).astype(np.int32)
    batch = PaddedBatch(inputs, targets, lengths, lengths)
    return trainer, state, batch


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_mesh_training_step_runs_and_matches_single_device(shape):
    data, model_axis = shape
    trainer, state, batch = _setup()

    # single-device ground truth
    s_ref, loss_ref = trainer.update(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices()[: data * model_axis], data=data, model=model_axis)
    trainer2, state2, _ = _setup()
    sharded_state = shard_state(state2, mesh)
    sharded_batch = shard_batch(batch, mesh)
    s_out, loss = trainer2.update(sharded_state, sharded_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_out.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_params_actually_distributed():
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    trainer, state, batch = _setup()
    sharded = shard_state(state, mesh)
    w = sharded.params["hidden"][0]["w"]
    # hidden weights are column-sharded over the model axis (2 shards)
    assert len({d for d in w.sharding.device_set}) == 8
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(24, 16)}  # 32/2 columns per shard


def test_multi_step_training_descends_on_mesh():
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    trainer, state, batch = _setup(batch_norm=False)
    state = shard_state(state, mesh)
    rng = np.random.default_rng(2)
    losses = []
    for i in range(10):
        inputs = rng.standard_normal((8, 16, 24)).astype(np.float32)
        targets = (inputs.sum(-1) > 0).astype(np.int32)
        lengths = np.full(8, 16, np.int32)
        b = shard_batch(PaddedBatch(inputs, targets, lengths, lengths), mesh)
        state, loss = trainer.update(state, b, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("family", ["tdnn", "cnn", "transformer", "conformer"])
def test_mesh_step_matches_single_device_new_families(family):
    """The TDNN/CNN/Transformer families shard with the same rules (dense
    stack / attention heads / FFN over `model`, conv filters replicated)
    and must match single-device."""
    from tfkaldi_tpu.models import (
        CNN, CNNConfig, TDNN, TDNNConfig, Transformer, TransformerConfig,
    )

    if family in ("transformer", "conformer"):
        model = Transformer(TransformerConfig(
            input_dim=24, num_labels=10, num_blocks=2, d_model=16,
            num_heads=2, ffn_dim=32, conformer=family == "conformer",
        ))
    elif family == "tdnn":
        model = TDNN(TDNNConfig(
            input_dim=24, num_labels=10, num_hidden_layers=2,
            num_hidden_units=32, context="-1,0,1;-3,0,3",
        ))
    else:
        model = CNN(CNNConfig(
            input_dim=24, num_labels=10, filters="4,6", kernels="5x3;3x3",
            pool="2,1", num_channels=1, num_hidden_layers=2,
            num_hidden_units=32,
        ))
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=20))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, t = 8, 16
    lengths = rng.integers(4, t + 1, size=b).astype(np.int32)
    batch = PaddedBatch(
        rng.standard_normal((b, t, 24)).astype(np.float32),
        rng.integers(0, 10, (b, t)).astype(np.int32),
        lengths, lengths,
    )

    s_ref, loss_ref = trainer.update(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    sharded_state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    sharded_batch = shard_batch(batch, mesh)
    s_out, loss = trainer.update(sharded_state, sharded_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(s_out.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
