"""Tests for the training controller's validation-rollback state machine."""

import dataclasses
import glob
import os

import jax
import numpy as np

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import (
    AlignmentBatchDispenser,
    AlignmentCoder,
    DeviceBatcher,
    FeatureReader,
    identity_normalizer,
)
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.train import (
    NnetTrainOptions,
    Trainer,
    TrainerConfig,
    TrainingController,
)
from tfkaldi_tpu.train import checkpoint as ckpt


def _pipeline(
    tmp_path, *, lr, valid_retries, num_epochs=2, check_freq=2, seed=0,
    valid_adapt=True, learnable=False,
):
    featdir, alifile, info = make_featdir(
        tmp_path, num_speakers=2, utts_per_speaker=8, feat_dim=6, num_labels=5,
        seed=seed, learnable=learnable,
    )
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    dispenser = AlignmentBatchDispenser(reader, coder, 4, alifile)
    model = DNN(
        DNNConfig(
            input_dim=6 * 3, num_labels=info["num_labels"], num_hidden_layers=2, num_hidden_units=8
        )
    )
    num_steps = int(dispenser.num_batches * num_epochs)
    trainer = Trainer(
        model, TrainerConfig(init_learning_rate=lr, num_steps=num_steps, micro_batches=2)
    )
    opts = NnetTrainOptions(
        savedir=str(tmp_path / "save"),
        num_epochs=num_epochs,
        batch_size=4,
        valid_batches=1,
        valid_frequency=2,
        valid_adapt=valid_adapt,
        valid_retries=valid_retries,
        check_freq=check_freq,
    )
    controller = TrainingController(trainer, dispenser, DeviceBatcher(bucket_multiple=16), opts)
    return controller, trainer, opts


def test_divergent_lr_triggers_rollback_and_termination(tmp_path):
    """With an absurd learning rate the validation loss must worsen; the
    controller should halve the LR, roll back, and terminate after
    valid_retries attempts (nnet.py:174-207 semantics)."""
    controller, trainer, opts = _pipeline(tmp_path, lr=100.0, valid_retries=1)
    state = controller.train()
    # lr_fact halved at least once (possibly twice: retries+1 halvings)
    assert float(state.lr_fact) < 1.0
    # terminated early: final state stepped back to a validated step
    assert int(state.step) < int(controller.dispenser.num_batches * opts.num_epochs)
    # final artifacts still written
    assert os.path.isdir(os.path.join(opts.savedir, "final"))


def test_checkpoints_written_and_resumable(tmp_path):
    controller, trainer, opts = _pipeline(tmp_path, lr=1e-3, valid_retries=3, valid_adapt=False)
    state = controller.train()
    step_dirs = glob.glob(os.path.join(opts.savedir, "training", "step*"))
    assert step_dirs, "expected periodic checkpoints"
    # restore the final checkpoint and check exact equality with the state
    template = trainer.init_state(jax.random.PRNGKey(0))
    restored = ckpt.restore_state(os.path.join(opts.savedir, "final"), template)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    assert float(restored.lr_fact) == float(state.lr_fact)


def test_prior_written_and_normalized(tmp_path):
    controller, trainer, opts = _pipeline(tmp_path, lr=1e-3, valid_retries=3, valid_adapt=False)
    controller.train()
    prior = np.load(os.path.join(opts.savedir, "prior.npy"))
    np.testing.assert_allclose(prior.sum(), 1.0, rtol=1e-6)
    assert (prior > 0).all()  # synthetic data covers all classes


def test_visualise_writes_event_file(tmp_path):
    """`visualise = True` produces a TensorBoard event file under
    savedir/logdir (reference trainer.py:249-258)."""
    import os
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, alifile, info = make_featdir(tmp_path)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "viznet", "context_width": "1", "num_hidden_units": "16",
        "num_hidden_layers": "1", "add_layer_period": "0", "starting_step": "0",
        "nonlin": "relu", "l2_norm": "False", "dropout": "1", "batch_norm": "False",
        "num_epochs": "1", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "1",
        "valid_frequency": "2", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "10", "visualise": "True",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    net.train(disp)
    logdir = os.path.join(net.savedir, "logdir")
    assert os.path.isdir(logdir)
    assert any(f.startswith("events.out") for f in os.listdir(logdir))


def test_profile_steps_writes_trace(tmp_path):
    """profile_steps > 0 captures a jax.profiler trace under savedir/profile."""
    import os
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, alifile, info = make_featdir(tmp_path)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "profnet", "context_width": "1", "num_hidden_units": "16",
        "num_hidden_layers": "1", "add_layer_period": "0", "starting_step": "0",
        "nonlin": "relu", "l2_norm": "False", "dropout": "1", "batch_norm": "False",
        "num_epochs": "2", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "0",
        "valid_frequency": "100", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "100", "visualise": "False", "profile_steps": "1",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    net.train(disp)
    profile_dir = os.path.join(net.savedir, "profile")
    assert os.path.isdir(profile_dir)
    found = []
    for root, _dirs, files in os.walk(profile_dir):
        found.extend(files)
    assert found  # some trace artifact was written


def test_resume_is_bit_exact(tmp_path):
    """Straight-through training and checkpoint-restart training produce
    identical final parameters (orbax restores the full TrainState; the
    dispenser fast-forward and fold_in(step) rng make the data/rng streams
    deterministic — reference resume semantics, nnet.py:101-141)."""
    import dataclasses

    # run A: straight through
    ctrl_a, _, _ = _pipeline(
        tmp_path / "a", lr=0.01, valid_retries=0, num_epochs=2, check_freq=2,
        valid_adapt=False,
    )
    state_a = ctrl_a.train()

    # run B: same corpus/seed, train fully once (writing step checkpoints),
    # then a FRESH controller resuming from step 2
    ctrl_b1, _, opts_b = _pipeline(
        tmp_path / "b", lr=0.01, valid_retries=0, num_epochs=2, check_freq=2,
        valid_adapt=False, seed=0,
    )
    ctrl_b1.train()
    ctrl_b2, _, _ = _pipeline(
        tmp_path / "b2", lr=0.01, valid_retries=0, num_epochs=2, check_freq=2,
        valid_adapt=False, seed=0,
    )
    # point the resuming controller at run-B's checkpoints
    ctrl_b2.opt = dataclasses.replace(
        ctrl_b2.opt, starting_step=2, savedir=opts_b.savedir
    )
    state_b = ctrl_b2.train()

    assert int(state_a.step) == int(state_b.step) > 2
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_retry_halvings_compound(tmp_path):
    """Consecutive rollback retries must compound the LR halving
    (1/2 -> 1/4): a divergent LR with 2 retries ends at lr_fact <= 1/4
    unless an intermediate validation improved."""
    controller, trainer, opts = _pipeline(tmp_path, lr=500.0, valid_retries=2)
    state = controller.train()
    assert float(state.lr_fact) <= 0.25, float(state.lr_fact)


def test_validated_checkpoint_survives_crash_and_rolls_back(tmp_path):
    """The 'validated' rollback point is persisted to disk on every
    successful validation (reference nnet.py:148-149, 206-207) and restored
    on resume: kill training between validations, resume from the step
    checkpoint, force a validation regression, and check the rollback lands
    bit-exact on the pre-crash validated params."""
    import dataclasses

    class Crash(RuntimeError):
        pass

    # run 1: valid_frequency=2 (validations at steps 2, 4), check_freq=5
    # (step checkpoint at 5), crash during the 6th update (hook step == 5)
    ctrl1, trainer1, opts1 = _pipeline(
        tmp_path, lr=1e-2, valid_retries=0, num_epochs=4, check_freq=5, learnable=True
    )

    def crashing_hook(step, **kw):
        if step == 5:
            raise Crash()

    ctrl1.metrics_hook = crashing_hook
    try:
        ctrl1.train()
        raise AssertionError("expected the crash hook to fire")
    except Crash:
        pass

    validated_dir = os.path.join(opts1.savedir, "training", "validated")
    meta = ckpt.load_validated_meta(validated_dir)
    assert meta is not None and meta["step"] == 4
    template = trainer1.init_state(jax.random.PRNGKey(0))
    validated1 = ckpt.restore_state(validated_dir, template)
    step5 = ckpt.restore_state(
        os.path.join(opts1.savedir, "training", "step5"), template
    )
    # non-trivial: the step-5 checkpoint moved past the validated point
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(step5.params), jax.tree.leaves(validated1.params))
    )

    # run 2: resume at step 5 with a divergent LR; the first validation
    # (step 6) worsens, valid_retries=0 -> roll back to validated + stop
    ctrl2, _, _ = _pipeline(
        tmp_path, lr=500.0, valid_retries=0, num_epochs=4, check_freq=5, learnable=True
    )
    ctrl2.opt = dataclasses.replace(ctrl2.opt, starting_step=5, savedir=opts1.savedir)
    state = ctrl2.train()

    assert int(state.step) == 4
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(validated1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the persisted rollback point carries the compounded (halved) lr_fact
    assert float(state.lr_fact) == 0.5


def test_training_is_deterministic_across_runs(tmp_path):
    """Two identical controller runs (same corpus/seed) produce bit-identical
    params — pins the prefetch worker's ordering and the fold_in(step) rng
    against nondeterminism."""
    states = []
    for sub in ("r1", "r2"):
        ctrl, _, _ = _pipeline(
            tmp_path / sub, lr=0.01, valid_retries=1, num_epochs=2, check_freq=2,
            valid_adapt=True, seed=0,
        )
        states.append(ctrl.train())
    a, b = states
    assert int(a.step) == int(b.step)
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_legacy_checkpoint_without_rng_restores(tmp_path):
    """Checkpoints written before TrainState gained its rng leaf must still
    restore: the missing leaf is backfilled from the template (the
    deterministic fold_in(seed) stream) instead of crashing resume."""
    import dataclasses

    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    model = DNN(DNNConfig(input_dim=12, num_labels=5, num_hidden_layers=2, num_hidden_units=8))
    trainer = Trainer(model, TrainerConfig())
    state = trainer.init_state(jax.random.PRNGKey(3))
    legacy = {
        f.name: getattr(state, f.name)
        for f in dataclasses.fields(state)
        if f.name != "rng"
    }
    path = str(tmp_path / "legacy")
    ckpt.save_state(path, legacy, block=True)
    restored = ckpt.restore_state(path, state)
    assert type(restored).__name__ == "TrainState"
    np.testing.assert_array_equal(np.asarray(restored.rng), np.asarray(state.rng))
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_validated_sidecar_rebaselines(tmp_path):
    """A crash between the validated-state commit and its sidecar write can
    leave a sidecar describing an OLDER step than the stored state. Resume
    must notice the disagreement (the state's own step is the arbiter) and
    re-baseline on the resumed state instead of rewinding too far."""
    import dataclasses
    import json

    class Crash(RuntimeError):
        pass

    ctrl1, trainer1, opts1 = _pipeline(
        tmp_path, lr=1e-2, valid_retries=0, num_epochs=4, check_freq=5, learnable=True
    )

    def crashing_hook(step, **kw):
        if step == 5:
            raise Crash()

    ctrl1.metrics_hook = crashing_hook
    try:
        ctrl1.train()
        raise AssertionError("expected the crash hook to fire")
    except Crash:
        pass

    validated_dir = os.path.join(opts1.savedir, "training", "validated")
    meta_path = validated_dir + ".meta.json"
    meta = ckpt.load_validated_meta(validated_dir)
    assert meta is not None and meta["step"] == 4
    # simulate the stale-sidecar crash window: sidecar says step 2, but the
    # stored state is the step-4 snapshot
    with open(meta_path, "w") as fid:
        json.dump({"loss": meta["loss"], "step": 2}, fid)

    ctrl2, _, _ = _pipeline(
        tmp_path, lr=500.0, valid_retries=0, num_epochs=4, check_freq=5, learnable=True
    )
    ctrl2.opt = dataclasses.replace(ctrl2.opt, starting_step=5, savedir=opts1.savedir)
    state = ctrl2.train()

    # re-baselined at the resumed step (5), so the step-6 regression rolls
    # back there — NOT to the mismatched persisted point (which would land
    # training at step 2/4 and over-rewind the data cursor)
    assert int(state.step) == 5, int(state.step)


def test_average_params_arithmetic():
    import jax.numpy as jnp

    from tfkaldi_tpu.train import checkpoint as ckpt

    a = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([0.0], jnp.bfloat16)}
    b = {"w": jnp.asarray([3.0, 6.0]), "b": jnp.asarray([2.0], jnp.bfloat16)}
    avg = ckpt.average_params([a, b])
    np.testing.assert_allclose(np.asarray(avg["w"]), [2.0, 4.0])
    assert avg["b"].dtype == jnp.bfloat16  # leaf dtypes preserved
    np.testing.assert_allclose(np.asarray(avg["b"], np.float32), [1.0])
    # identity: averaging copies of one tree returns it
    same = ckpt.average_params([a, a, a])
    np.testing.assert_allclose(np.asarray(same["w"]), np.asarray(a["w"]))


def test_average_last_smooths_final(tmp_path):
    """`average_last = N` writes 'final' as the parameter mean of the end
    state and the last N-1 step checkpoints; optimizer state stays the
    end state's."""
    from tfkaldi_tpu.train import checkpoint as ckpt

    controller, trainer, opts = _pipeline(
        tmp_path, lr=0.01, valid_retries=0, valid_adapt=False,
        num_epochs=2, check_freq=2,
    )
    controller.opt = opts = dataclasses.replace(opts, average_last=2)
    state = controller.train()

    tdir = os.path.join(opts.savedir, "training")
    end_step = int(state.step)
    steps = sorted(
        int(d[4:]) for d in os.listdir(tdir)
        if d.startswith("step") and d[4:].isdigit() and int(d[4:]) != end_step
    )
    template = trainer.init_state(jax.random.PRNGKey(0))
    prev = ckpt.restore_state(os.path.join(tdir, f"step{steps[-1]}"), template)
    # the raw (pre-average) end state is the step{end} checkpoint the loop
    # itself wrote (end_step is a check_freq multiple here)
    end_raw = ckpt.restore_state(
        os.path.join(tdir, f"step{end_step}"), template
    )
    final = ckpt.restore_state(os.path.join(opts.savedir, "final"), template)
    want = ckpt.average_params([end_raw.params, prev.params])
    for want_leaf, got in zip(
        jax.tree.leaves(want), jax.tree.leaves(final.params)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want_leaf), rtol=1e-6, atol=1e-7
        )
    # the returned state is the averaged one (what decode will use)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(final.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # and averaging actually changed the model
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(final.params),
                        jax.tree.leaves(end_raw.params))
    )
