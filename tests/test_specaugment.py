"""SpecAugment: train-only on-device input masking (beyond the reference)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig


def _setup(spec=True, **over):
    model = DNN(DNNConfig(input_dim=24, num_labels=5, num_hidden_layers=1, num_hidden_units=16))
    cfg = TrainerConfig(
        spec_augment=spec, spec_raw_dim=8, spec_time_masks=2, spec_time_width=6,
        spec_freq_masks=1, spec_freq_width=3, **over,
    )
    return Trainer(model, cfg)


def _batch(seed=0, b=4, t=32, d=24):
    rng = np.random.default_rng(seed)
    return PaddedBatch(
        jnp.asarray(np.abs(rng.standard_normal((b, t, d))).astype(np.float32) + 1.0),
        jnp.asarray(rng.integers(0, 5, (b, t)).astype(np.int32)),
        jnp.asarray(np.array([t, t - 5, t // 2, t - 1], np.int32)),
        jnp.asarray(np.array([t, t - 5, t // 2, t - 1], np.int32)),
    )


def test_masks_zero_bands_and_repeat_over_splice():
    trainer = _setup()
    batch = _batch()
    out = trainer._spec_augment(batch, jax.random.PRNGKey(0))
    x = np.asarray(out.inputs)
    orig = np.asarray(batch.inputs)
    assert (x == 0).any(), "no mask applied"
    # every zeroed element belongs to a full zero row (time mask) or a
    # frequency band repeated across all 3 context copies
    changed = (x == 0) & (orig != 0)
    # frequency bands: column zeroed in copy 0 => same raw column zeroed in
    # every copy (for rows not already time-masked)
    time_masked_rows = np.all(x == 0, axis=2)
    for bi in range(x.shape[0]):
        col_masked = np.all(changed[bi, ~time_masked_rows[bi]], axis=0)
        for raw in range(8):
            cols = [raw, raw + 8, raw + 16]
            states = {bool(col_masked[c]) for c in cols}
            assert len(states) == 1, f"freq band not repeated across splice: {cols}"


def test_augment_is_deterministic_in_rng():
    trainer = _setup()
    batch = _batch()
    a = trainer._spec_augment(batch, jax.random.PRNGKey(7))
    b = trainer._spec_augment(batch, jax.random.PRNGKey(7))
    c = trainer._spec_augment(batch, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a.inputs), np.asarray(b.inputs))
    assert not np.array_equal(np.asarray(a.inputs), np.asarray(c.inputs))


def test_off_by_default_and_eval_untouched():
    on = _setup(spec=True)
    off = _setup(spec=False)
    batch = _batch()
    s_on = on.init_state(jax.random.PRNGKey(0))
    s_off = off.init_state(jax.random.PRNGKey(0))
    # training trajectories diverge (masking changed the inputs). The
    # FIRST step's loss is ln(num_labels) either way — the reference's
    # zero-init output layer makes step-0 logits input-independent — so
    # compare from the second step on.
    s_on, _ = on.update(s_on, batch)
    s_off, _ = off.update(s_off, batch)
    _, l_on = on.update(s_on, batch)
    _, l_off = off.update(s_off, batch)
    assert float(l_on) != float(l_off)
    # evaluation never augments: identical losses
    s_on2 = on.init_state(jax.random.PRNGKey(0))
    s_off2 = off.init_state(jax.random.PRNGKey(0))
    assert on.evaluate(s_on2, [batch]) == off.evaluate(s_off2, [batch])


def test_train_runs_and_losses_stay_finite():
    trainer = _setup()
    batch = _batch()
    state = trainer.init_state(jax.random.PRNGKey(1))
    for _ in range(3):
        state, loss = trainer.update(state, batch)
        assert np.isfinite(float(loss))


def test_resume_replays_identical_masks():
    """The aug keys derive from (state.rng, step): two runs from the same
    seed produce bit-identical params — rollback/resume replay safety."""
    runs = []
    for _ in range(2):
        trainer = _setup()
        state = trainer.init_state(jax.random.PRNGKey(3))
        batch = _batch()
        for _ in range(3):
            state, _ = trainer.update(state, batch)
        runs.append(state)
    for a, b in zip(jax.tree.leaves(runs[0].params), jax.tree.leaves(runs[1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_config_key_wires_through(tmp_path):
    """[nnet] specaugment = True reaches the trainer via Nnet.train."""
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, alifile, info = make_featdir(tmp_path)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "specnet", "context_width": "1", "num_hidden_units": "16",
        "num_hidden_layers": "1", "add_layer_period": "0", "starting_step": "0",
        "nonlin": "relu", "l2_norm": "False", "dropout": "1", "batch_norm": "False",
        "num_epochs": "1", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "1",
        "valid_frequency": "2", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "10", "visualise": "False", "specaugment": "True",
        "spec_time_width": "4", "spec_freq_width": "2",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    state = net.train(disp)
    assert np.isfinite(float(state.lr_fact))
