"""Decode service: model loaded once, jobs processed from the spool,
restart-safe DONE markers."""

import os
import shutil
from configparser import ConfigParser

import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
from tfkaldi_tpu.data.target_normalizers import identity_normalizer
from tfkaldi_tpu.io import ArkReader
from tfkaldi_tpu.nnet import Nnet
from tfkaldi_tpu.serve import DecodeService


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    featdir, alifile, info = make_featdir(tmp)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp / "exp")}
    cfg["nnet"] = {
        "name": "servenet", "context_width": "1", "num_hidden_units": "16",
        "num_hidden_layers": "1", "add_layer_period": "0", "starting_step": "0",
        "nonlin": "relu", "l2_norm": "False", "dropout": "1", "batch_norm": "False",
        "num_epochs": "1", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "0",
        "valid_frequency": "100", "valid_adapt": "False", "valid_retries": "0",
        "check_freq": "100", "visualise": "False",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    net.train(disp)
    return tmp, featdir, net, info


def test_service_processes_jobs_and_is_restart_safe(trained, tmp_path):
    tmp, featdir, net, info = trained
    watch = tmp_path / "watch"
    out = tmp_path / "out"
    service = DecodeService(net, str(watch), str(out), batch_size=4)

    assert service.process_pending() == 0  # empty spool

    # drop two jobs (each a featdir copy)
    for name in ("job_a", "job_b"):
        shutil.copytree(featdir, watch / name)
    assert service.process_pending() == 2
    for name in ("job_a", "job_b"):
        assert (out / name / "DONE").exists()
        r = ArkReader(str(out / name / "feats.scp"))
        assert len(r) == len(info["utts"])
        mat = r.read_utt_data(0)
        assert mat.shape[1] == info["num_labels"] and np.isfinite(mat).all()

    # restart-safety: done jobs are skipped
    assert service.process_pending() == 0

    # a new job after "restart" (fresh service instance reusing the spool)
    service2 = DecodeService(net, str(watch), str(out), batch_size=4)
    shutil.copytree(featdir, watch / "job_c")
    assert service2.process_pending() == 1
    assert (out / "job_c" / "DONE").read_text().strip() == str(len(info["utts"]))


def test_serve_cli_once(trained, tmp_path):
    """`python -m tfkaldi_tpu.cli.serve --once` processes the spool."""
    tmp, featdir, net, info = trained
    from configparser import ConfigParser

    from tfkaldi_tpu.cli.serve import main as serve_main

    # the CLI reads input dim from directories/train_features + dnn name
    cfg = tmp_path / "serve.cfg"
    cfg.write_text(
        f"""[directories]
expdir = {tmp}/exp
train_features = {os.path.dirname(featdir)}

[dnn-features]
name = {os.path.basename(featdir)}

[nnet]
name = servenet
gmm_name = unused
context_width = 1
num_hidden_units = 16
num_hidden_layers = 1
add_layer_period = 0
starting_step = 0
nonlin = relu
l2_norm = False
dropout = 1
batch_norm = False
"""
    )
    # gmm_name path only matters for num_pdfs; provide it
    os.makedirs(tmp / "exp" / "unused" / "graph", exist_ok=True)
    (tmp / "exp" / "unused" / "graph" / "num_pdfs").write_text(
        f"{info['num_labels']}\n"
    )
    watch, out = tmp_path / "w", tmp_path / "o"
    shutil.copytree(featdir, watch / "job1")
    rc = serve_main(
        ["--config", str(cfg), "--watch", str(watch), "--out", str(out), "--once"]
    )
    assert rc == 0
    assert (out / "job1" / "DONE").exists()


def test_service_quarantines_bad_jobs(trained, tmp_path):
    """A malformed job gets a FAILED marker and doesn't wedge the daemon;
    valid jobs in the same sweep still complete."""
    tmp, featdir, net, info = trained
    watch = tmp_path / "w2"
    out = tmp_path / "o2"
    service = DecodeService(net, str(watch), str(out), batch_size=4)

    # malformed: feats.scp present but utt2spk missing
    bad = watch / "bad_job"
    bad.mkdir(parents=True)
    shutil.copyfile(os.path.join(featdir, "feats.scp"), bad / "feats.scp")
    # valid job alongside
    shutil.copytree(featdir, watch / "good_job")

    assert service.process_pending() == 1  # only the good job counts
    assert (out / "good_job" / "DONE").exists()
    failed = out / "bad_job" / "FAILED"
    assert failed.exists() and failed.read_text().strip()
    # quarantined job is skipped on subsequent sweeps
    assert service.process_pending() == 0
    # operator clears the marker to retry (still fails, re-quarantined)
    failed.unlink()
    assert service.process_pending() == 0
    assert failed.exists()
