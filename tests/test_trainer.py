"""Behavior tests for the model + trainer (reference trainer.py semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import DeviceBatcher, PaddedBatch
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig


def _model(**over):
    cfg = dict(
        input_dim=12,
        num_labels=7,
        num_hidden_layers=2,
        num_hidden_units=16,
        nonlin="relu",
    )
    cfg.update(over)
    return DNN(DNNConfig(**cfg))


def _batch(rng, b=4, t=10, f=12, labels=7, lengths=None):
    lengths = np.asarray(lengths if lengths is not None else [t] * b, np.int32)
    inputs = rng.standard_normal((b, t, f)).astype(np.float32)
    for i, l in enumerate(lengths):
        inputs[i, l:] = 0
    targets = rng.integers(0, labels, (b, t)).astype(np.int32)
    for i, l in enumerate(lengths):
        targets[i, l:] = 0
    return PaddedBatch(inputs, targets, lengths, lengths)


def test_forward_shapes_and_padding_zeroing():
    model = _model()
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = _batch(rng, lengths=[10, 7, 3, 10])
    logits, _ = model.apply(params, state, batch.inputs, batch.input_lengths, train=False)
    assert logits.shape == (4, 10, 7)
    # output layer is zero-init → logits must be exactly zero at init
    assert np.all(np.asarray(logits) == 0)


def test_padding_invariance_of_loss_and_grads():
    """Adding more padding must not change the loss or the gradients
    (the reference achieved this with seq2nonseq gathers; we mask)."""
    model = _model()
    trainer = Trainer(model, TrainerConfig(num_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    batch = _batch(rng, b=2, t=8, lengths=[8, 5])
    # same content, extra padding
    wide = PaddedBatch(
        np.pad(batch.inputs, ((0, 0), (0, 6), (0, 0))),
        np.pad(batch.targets, ((0, 0), (0, 6))),
        batch.input_lengths,
        batch.target_lengths,
    )
    s1, l1 = trainer.update(state, batch, jax.random.PRNGKey(2))
    state2 = trainer.init_state(jax.random.PRNGKey(1))
    s2, l2 = trainer.update(state2, wide, jax.random.PRNGKey(2))
    assert np.allclose(float(l1), float(l2), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_padding_invariance_with_batchnorm():
    model = _model(batch_norm=True)
    trainer = Trainer(model, TrainerConfig(num_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    batch = _batch(rng, b=2, t=8, lengths=[8, 5])
    wide = PaddedBatch(
        np.pad(batch.inputs, ((0, 0), (0, 4), (0, 0))),
        np.pad(batch.targets, ((0, 0), (0, 4))),
        batch.input_lengths,
        batch.target_lengths,
    )
    _, l1 = trainer.update(state, batch, jax.random.PRNGKey(2))
    state2 = trainer.init_state(jax.random.PRNGKey(1))
    _, l2 = trainer.update(state2, wide, jax.random.PRNGKey(2))
    assert np.allclose(float(l1), float(l2), atol=1e-5)


def test_grad_accumulation_equivalence():
    """Full-batch vs microbatched accumulation must produce the same update
    (reference semantics: grads summed over microbatches then divided by
    total frames, trainer.py:310-354)."""
    model = _model()  # no BN/dropout so micro-order can't matter
    rng = np.random.default_rng(3)
    batch = _batch(rng, b=8, t=6, lengths=[6, 5, 4, 6, 3, 6, 5, 4])

    t1 = Trainer(model, TrainerConfig(num_steps=10, micro_batches=1))
    t4 = Trainer(model, TrainerConfig(num_steps=10, micro_batches=4))
    s1 = t1.init_state(jax.random.PRNGKey(4))
    s4 = t4.init_state(jax.random.PRNGKey(4))
    s1b, l1 = t1.update(s1, batch, jax.random.PRNGKey(5))
    s4b, l4 = t4.update(s4, batch, jax.random.PRNGKey(5))
    assert np.allclose(float(l1), float(l4), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1b.params), jax.tree.leaves(s4b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_tf_adam_semantics_tiny_model():
    """One step against a hand-rolled numpy replication of the reference's
    optimizer math (trainer.py:108-184): frame-mean, clip, exp-decay LR,
    TF-Adam with eps outside the sqrt."""
    model = _model(num_hidden_layers=1, num_hidden_units=4, input_dim=3, num_labels=2)
    cfg = TrainerConfig(init_learning_rate=0.01, learning_rate_decay=0.5, num_steps=20)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    batch = _batch(rng, b=2, t=4, f=3, labels=2, lengths=[4, 3])

    # numpy forward/backward for the tiny relu net
    w0 = np.asarray(state.params["hidden"][0]["w"], np.float64)
    b0 = np.asarray(state.params["hidden"][0]["b"], np.float64)
    wo = np.asarray(state.params["out"]["w"], np.float64)
    bo = np.asarray(state.params["out"]["b"], np.float64)

    x = batch.inputs.reshape(-1, 3).astype(np.float64)
    y = batch.targets.reshape(-1)
    mask = (np.arange(4)[None, :] < batch.input_lengths[:, None]).reshape(-1)

    z = x @ w0 + b0
    h = np.maximum(z, 0)
    logits = h @ wo + bo
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    dlogits = p.copy()
    dlogits[np.arange(len(y)), y] -= 1
    dlogits *= mask[:, None]
    gwo = h.T @ dlogits
    gbo = dlogits.sum(0)
    dh = dlogits @ wo.T
    dz = dh * (z > 0)
    gw0 = x.T @ dz
    gb0 = dz.sum(0)

    frames = mask.sum()
    step_grads = {"w0": gw0, "b0": gb0, "wo": gwo, "bo": gbo}
    lr = 0.01 * 0.5 ** (0 / 20)
    lr_t = lr * np.sqrt(1 - 0.999) / (1 - 0.9)
    expected = {}
    for name, g in step_grads.items():
        g = np.clip(g / frames, -1, 1)
        m = 0.1 * g
        v = 0.001 * np.square(g)
        expected[name] = -lr_t * m / (np.sqrt(v) + 1e-8)

    new_state, _ = trainer.update(state, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        np.asarray(new_state.params["hidden"][0]["w"]) - w0, expected["w0"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["out"]["w"]) - wo, expected["wo"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["out"]["b"]) - bo, expected["bo"], atol=1e-6
    )


def test_loss_decreases_on_learnable_data():
    """Frames labeled by a simple rule: loss should drop fast."""
    model = _model(batch_norm=True)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.01, num_steps=50))
    state = trainer.init_state(jax.random.PRNGKey(8))
    rng = np.random.default_rng(8)
    losses = []
    for i in range(30):
        inputs = rng.standard_normal((8, 10, 12)).astype(np.float32)
        targets = (inputs.sum(-1) > 0).astype(np.int32)  # label from sign
        lengths = np.full(8, 10, np.int32)
        batch = PaddedBatch(inputs, targets, lengths, lengths)
        state, loss = trainer.update(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_halve_learning_rate_and_layerwise_add():
    model = _model(layerwise_init=True)
    trainer = Trainer(model, TrainerConfig(num_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(9))
    assert float(state.lr_fact) == 1.0
    state = trainer.halve_learning_rate(state)
    assert float(state.lr_fact) == 0.5
    assert int(state.model_state["depth"]) == 0

    # make output weights nonzero, then add a layer: depth+1, out re-zeroed
    state = dataclasses.replace(
        state,
        params={**state.params, "out": jax.tree.map(lambda x: x + 1, state.params["out"])},
    )
    state = trainer.add_layer(state)
    assert int(state.model_state["depth"]) == 1
    assert np.all(np.asarray(state.params["out"]["w"]) == 0)


def test_layerwise_depth_selector_changes_forward():
    model = _model(layerwise_init=True, num_hidden_layers=3)
    params, state = model.init(jax.random.PRNGKey(10))
    # give the output layer nonzero weights so depth matters
    params = {**params, "out": {"w": jnp.ones_like(params["out"]["w"]), "b": params["out"]["b"]}}
    x = np.random.default_rng(0).standard_normal((2, 5, 12)).astype(np.float32)
    lengths = np.asarray([5, 5], np.int32)
    out0, _ = model.apply(params, {**state, "depth": jnp.asarray(0)}, x, lengths, train=False)
    out2, _ = model.apply(params, {**state, "depth": jnp.asarray(2)}, x, lengths, train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out2))


def test_evaluate_frame_weighted_average():
    model = _model()
    trainer = Trainer(model, TrainerConfig(num_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    b1 = _batch(rng, b=2, t=6, lengths=[6, 2])
    b2 = _batch(rng, b=2, t=6, lengths=[3, 3])
    # zero-init output → uniform softmax → loss = ln(num_labels) per frame
    avg = trainer.evaluate(state, [b1, b2])
    assert np.isclose(avg, np.log(7), atol=1e-5)


def test_dropout_only_in_training():
    model = _model(dropout=0.5)
    trainer = Trainer(model, TrainerConfig(num_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(12))
    rng = np.random.default_rng(12)
    batch = _batch(rng)
    # eval is deterministic
    l1, _ = trainer._valid_step(state, batch)
    l2, _ = trainer._valid_step(state, batch)
    assert float(l1) == float(l2)
    # training step runs (dropout rng is used, no crash)
    trainer.update(state, batch, jax.random.PRNGKey(13))
