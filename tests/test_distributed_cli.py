"""Multi-host CLI driver test: the REAL `python -m tfkaldi_tpu.cli.main`
train_nnet step runs as two OS processes (each 2 simulated CPU devices)
forming one 4-device global mesh via jax.distributed. Each host shards the
shuffled scp, dispenses its half of the global batch, and assembles global
arrays — per-step losses must agree across hosts bit-for-bit and match a
single-process run over the same global batches (VERDICT round 1, item 4)."""

import os
import re
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests.synthetic import make_featdir

_CFG = """[directories]
expdir = {tmp}/exp{tag}
train_features = {tmp}
test_features = {tmp}

[general]
num_jobs = 1
cmd = run.pl

[gmm-features]
name = featdir

[dnn-features]
name = featdir

[nnet]
name = dist_nnet
gmm_name = fake_gmm
context_width = 1
num_hidden_units = 16
num_hidden_layers = 2
add_layer_period = 0
starting_step = 0
nonlin = relu
l2_norm = False
dropout = 1
batch_norm = False
num_epochs = 2
initial_learning_rate = 0.01
learning_rate_decay = 1
batch_size = 4
numutterances_per_minibatch = -1
valid_batches = 1
valid_frequency = 100
valid_adapt = False
valid_retries = 0
check_freq = 100
visualise = False
seed = 0
"""

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    nproc = sys.argv[1]
    if nproc != "1":
        os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:" + sys.argv[3]
        os.environ["JAX_NUM_PROCESSES"] = nproc
        os.environ["JAX_PROCESS_ID"] = sys.argv[2]
    from tfkaldi_tpu.cli.main import main
    sys.exit(main(["--config", sys.argv[4], "--steps", "train_nnet"]))
    """
)


def _setup(tmp_path, tag):
    featdir, alifile, info = make_featdir(
        tmp_path, num_speakers=2, utts_per_speaker=6, feat_dim=6, num_labels=5,
        learnable=True,
    )
    # the train_nnet step expects the GMM boundary artifacts on disk
    # (graph/num_pdfs + merged alignments, reference main.py:123-142)
    gmm_dir = tmp_path / f"exp{tag}" / "fake_gmm"
    (gmm_dir / "graph").mkdir(parents=True, exist_ok=True)
    (gmm_dir / "graph" / "num_pdfs").write_text(str(info["num_labels"]))
    (gmm_dir / "ali").mkdir(exist_ok=True)
    import shutil

    shutil.copyfile(alifile, gmm_dir / "ali" / "pdf.all.gz")
    cfg = tmp_path / f"config{tag}.cfg"
    cfg.write_text(_CFG.format(tmp=tmp_path, tag=tag))
    return cfg


def _run(repo, env, cfg, nproc, port):
    procs = []
    for pid in range(nproc):
        worker = str(cfg) + f".worker{pid}.py"
        with open(worker, "w") as f:
            f.write(_WORKER.format(repo=repo))
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(nproc), str(pid), str(port), str(cfg)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def _losses(out):
    return [
        (int(m.group(1)), float(m.group(2)))
        for m in re.finditer(r"step (\d+)/\d+ loss: ([0-9.]+)", out)
    ]


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only subprocess test")
def test_two_process_cli_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"
    }
    env["PYTHONPATH"] = repo
    port = 12600 + os.getpid() % 1000

    cfg_d = _setup(tmp_path / "dual", "d")
    outs = _run(repo, env, cfg_d, 2, port)
    losses = [_losses(o) for o in outs]
    assert losses[0] and losses[0] == losses[1], (losses[0][:3], losses[1][:3])
    # each host trained on its scp shard
    assert os.path.exists(tmp_path / "dual" / "featdir" / "feats_shuffled.shard0of2.scp")

    cfg_s = _setup(tmp_path / "single", "s")
    (out_s,) = _run(repo, env, cfg_s, 1, port + 1)
    single = _losses(out_s)

    # same global batches (strided shards reassemble the shuffled order) ->
    # same per-step losses up to psum/reduction reassociation
    assert len(single) == len(losses[0]) > 0
    for (s_step, s_loss), (d_step, d_loss) in zip(single, losses[0]):
        assert s_step == d_step
        np.testing.assert_allclose(s_loss, d_loss, rtol=2e-4)


def _setup_adapt(tmp_path, tag, extra: dict):
    cfg_path = _setup(tmp_path, tag)
    text = cfg_path.read_text()
    for key, val in extra.items():
        pat = re.compile(rf"^{key} = .*$", re.M)
        if pat.search(text):
            text = pat.sub(f"{key} = {val}", text)
        else:
            text += f"{key} = {val}\n"
    cfg_path.write_text(text)
    return cfg_path


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only subprocess test")
def test_two_process_cli_validation_rollback(tmp_path):
    """The controller's validation-rollback state machine under REAL
    multi-host execution (2 processes x 2 devices): an aggressive LR makes
    validation worsen, both hosts must take the rollback (restore the
    validated snapshot, rewind their own shard cursors, halve the LR) in
    lockstep, and the full loss trajectory — including the replayed
    steps — must match a single-process run over the same global batches.
    This is the multi-host analog of what dryrun_multichip covers
    single-process (reference control flow: nnet.py:167-207)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"
    }
    env["PYTHONPATH"] = repo
    port = 12600 + (os.getpid() + 31) % 1000

    adapt = {
        "initial_learning_rate": "0.9",  # aggressive: validation worsens
        "valid_adapt": "True",
        "valid_retries": "2",
        "valid_frequency": "2",
        "num_epochs": "4",
    }
    cfg_d = _setup_adapt(tmp_path / "dual", "d", adapt)
    outs = _run(repo, env, cfg_d, 2, port)
    losses = [_losses(o) for o in outs]
    assert losses[0] and losses[0] == losses[1], (losses[0][:3], losses[1][:3])
    # the rollback fired on both hosts, the same number of times
    rb = [out.count("returning to the previously validated model")
          for out in outs]
    assert rb[0] == rb[1] > 0, rb
    # replayed steps appear in the trajectory (a step number repeats)
    steps_d = [s for s, _ in losses[0]]
    assert len(set(steps_d)) < len(steps_d), steps_d

    cfg_s = _setup_adapt(tmp_path / "single", "s", adapt)
    (out_s,) = _run(repo, env, cfg_s, 1, port + 1)
    single = _losses(out_s)
    assert out_s.count("returning to the previously validated model") == rb[0]
    assert [s for s, _ in single] == steps_d
    for (s_step, s_loss), (d_step, d_loss) in zip(single, losses[0]):
        assert s_step == d_step
        np.testing.assert_allclose(s_loss, d_loss, rtol=2e-4)


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only subprocess test")
def test_two_process_cli_checkpoint_resume(tmp_path):
    """Checkpoint-resume across 2 processes x 2 devices: train 2 epochs in
    one uninterrupted run, then reproduce it as run-to-epoch-1 + a second
    CLI invocation resuming from the step checkpoint (starting_step
    rounding + per-host dispenser fast-forward, reference nnet.py:101-108).
    The resumed tail's per-step losses must equal the uninterrupted run's."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"
    }
    env["PYTHONPATH"] = repo
    port = 12600 + (os.getpid() + 63) % 1000

    # uninterrupted 6-step reference trajectory (3 batches/epoch x 2)
    full = {"num_epochs": "2", "check_freq": "2"}
    cfg_full = _setup_adapt(tmp_path / "full", "f", full)
    outs = _run(repo, env, cfg_full, 2, port)
    ref = _losses(outs[0])
    assert _losses(outs[1]) == ref and len(ref) == 6

    # phase 1: stop after epoch 1 (3 steps, checkpoint at step 2)
    cfg_p1 = _setup_adapt(tmp_path / "resume", "r",
                          {"num_epochs": "1", "check_freq": "2"})
    outs1 = _run(repo, env, cfg_p1, 2, port + 1)
    assert len(_losses(outs1[0])) == 3
    # phase 2: same expdir, resume from the step-2 checkpoint (the
    # starting_step=3 request rounds DOWN to it, replaying step 2) and
    # finish epoch 2
    cfg_p2 = _setup_adapt(tmp_path / "resume", "r",
                          {"num_epochs": "2", "check_freq": "2",
                           "starting_step": "3"})
    outs2 = _run(repo, env, cfg_p2, 2, port + 2)
    tail = _losses(outs2[0])
    assert tail == _losses(outs2[1])
    assert [s for s, _ in tail] == [2, 3, 4, 5]
    for (r_step, r_loss), (t_step, t_loss) in zip(ref[2:], tail):
        assert r_step == t_step
        np.testing.assert_allclose(r_loss, t_loss, rtol=1e-6)


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only subprocess test")
def test_two_process_cli_uneven_target_coverage(tmp_path):
    """Strided scp shards with UNEVEN target coverage (one utterance has no
    alignment, as when Kaldi's aligner drops a failed utterance): the hosts'
    raw num_batches differ, so without the allgathered minimum they would
    derive different num_steps and deadlock on mismatched collectives. The
    fixed driver pins min(num_batches) — both processes must finish with
    identical per-step losses and the SHORTER host's step count."""
    import gzip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"
    }
    env["PYTHONPATH"] = repo
    port = 12600 + (os.getpid() + 7) % 1000

    cfg = _setup(tmp_path / "uneven", "u")
    ali = tmp_path / "uneven" / "expu" / "fake_gmm" / "ali" / "pdf.all.gz"
    with gzip.open(ali, "rt") as f:
        lines = f.readlines()
    with gzip.open(ali, "wt") as f:
        f.writelines(lines[1:])  # drop one utterance's alignment
    outs = _run(repo, env, cfg, 2, port)
    losses = [_losses(o) for o in outs]
    assert losses[0] and losses[0] == losses[1], (losses[0][:3], losses[1][:3])
    # 12 utts, one untargeted; host shards of 6 scp entries hold 6 and 5
    # targeted utts -> per-host batches (size 2) 3.0 vs 2.5; agreed
    # num_steps = int(min * num_epochs) = 5
    assert len(losses[0]) == 5, [s for s, _ in losses[0]]
