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


def test_streaming_server_matches_offline_pipeline():
    """StreamingServer: PCM chunks over a real socket -> partials + final;
    final == the offline batched pipeline's transcript."""
    import threading

    import jax

    from tfkaldi_tpu.decode import CTCDecoder, StreamingTranscriber
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import GRU, RNNConfig
    from tfkaldi_tpu.serve import StreamingServer, stream_transcribe

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")
    rng = np.random.default_rng(21)
    n = 6500
    sig = np.zeros((1, 8000), np.float32)
    sig[0, :n] = rng.standard_normal(n).astype(np.float32)
    lengths = np.asarray([n])

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    blank = 7
    model = GRU(RNNConfig(input_dim=10, num_labels=8, num_layers=1,
                          hidden_units=16, bidirectional=False, scan_unroll=1))
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    offline_ids = CTCDecoder(model, params, state, _IdCoder(), blank).decode_batch(
        off_norm, off_nf
    )
    offline_text = _IdCoder().decode(offline_ids[0])

    server = StreamingServer(
        lambda: StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(),
            blank, cmvn=stats,
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # two sequential sessions through the same pooled transcriber:
        # state must fully reset between utterances
        for _ in range(2):
            gen = stream_transcribe(server.host, server.port, sig[0, :n], 1000)
            partials = []
            try:
                while True:
                    partials.append(next(gen))
            except StopIteration as stop:
                final = stop.value
            assert len(partials) == -(-n // 1000)
            assert final == offline_text
    finally:
        server.close()
        t.join(timeout=5)


def test_streaming_server_reports_errors():
    """A malformed message type surfaces as an E reply, and the pooled
    transcriber survives for the next session."""
    import socket as socketlib
    import threading

    import jax

    from tfkaldi_tpu.decode import StreamingTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import GRU, RNNConfig
    from tfkaldi_tpu.serve import (
        MSG_ERROR, StreamingServer, _recv_msg, _send_msg, stream_transcribe,
    )

    ext = FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256),
        8000,
    )
    model = GRU(RNNConfig(input_dim=10, num_labels=8, num_layers=1,
                          hidden_units=16, bidirectional=False, scan_unroll=1))
    params, state = model.init(jax.random.PRNGKey(0))

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    server = StreamingServer(
        lambda: StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, state, _IdCoder(), 7
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socketlib.create_connection((server.host, server.port)) as sock:
            _send_msg(sock, b"Z", b"junk")
            mtype, payload = _recv_msg(sock)
            assert mtype == MSG_ERROR
            assert b"unknown message type" in payload
        # the pool must have recovered the transcriber
        gen = stream_transcribe(
            server.host, server.port,
            np.zeros((4000,), np.float32), 1000,
        )
        try:
            while True:
                next(gen)
        except StopIteration as stop:
            assert isinstance(stop.value, str)
    finally:
        server.close()
        t.join(timeout=5)


@pytest.mark.parametrize("family", ["rnnt_beam", "attention"])
def test_service_text_modes(tmp_path, family):
    """The spool service serves the sequence families too: transducer
    beam search (with dense LM fusion) and the attention decoder both
    emit a text file per job."""
    import jax

    from tfkaldi_tpu.data import TextCoder
    from tfkaldi_tpu.train import Trainer, TrainerConfig
    from tfkaldi_tpu.train import checkpoint as ckpt

    featdir, _, info = make_featdir(tmp_path)
    coder = TextCoder(identity_normalizer)
    arpa = tmp_path / "toy.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\n\n\\1-grams:\n-0.5\tT\t-0.3\n-0.9\t<s>\n"
        "-1.2\t<unk>\n\n\\end\\\n"
    )
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    nnet_cfg = {
        "name": f"serve_{family}", "context_width": "0",
        "num_hidden_layers": "1", "num_hidden_units": "8",
        "batch_size": "4", "num_epochs": "1",
        "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "beam_width": "2", "scan_unroll": "1",
    }
    if family == "rnnt_beam":
        nnet_cfg.update({
            "model": "transducer", "loss": "rnnt", "pred_units": "6",
            "embed_dim": "4", "joint_units": "8",
            "lm_path": str(arpa), "lm_alpha": "0.3",
        })
    else:
        nnet_cfg.update({
            "model": "seq2seq", "loss": "attention", "enc_type": "lstm",
            "dec_blocks": "1", "d_model": "8", "num_heads": "2",
            "ffn_dim": "12", "max_decode_tokens": "10",
            # joint model + two-pass rescoring decode through the service
            "ctc_weight": "0.3", "decode_mode": "rescoring",
            "rescore_weight": "0.5",
        })
    cfg["nnet"] = nnet_cfg
    net = Nnet(cfg, input_dim=info["feat_dim"] , num_labels=coder.num_labels)
    # an (untrained) final checkpoint is enough to exercise the service
    trainer = Trainer(net.model, TrainerConfig(loss_type=net.loss_type))
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt.save_state(os.path.join(net.savedir, "final"), state, block=True)

    watch, out = tmp_path / "watch", tmp_path / "out"
    service = DecodeService(net, str(watch), str(out), coder=coder,
                            batch_size=4)
    shutil.copytree(featdir, watch / "job_t")
    assert service.process_pending() == 1
    text = (out / "job_t" / "text").read_text().splitlines()
    assert len(text) == len(info["utts"])
    assert all(line.split(" ", 1)[0] in info["utts"] for line in text)


def test_streaming_server_transducer_subsampled():
    """The socket server serving the streaming TRANSDUCER transcriber over
    a subsampled causal conformer: final == the offline transducer decode
    (the finish message drains feature AND encoder-front-end buffers)."""
    import threading

    import jax

    from tfkaldi_tpu.decode.transducer import (
        StreamingTransducerTranscriber,
        TransducerDecoder,
    )
    from tfkaldi_tpu.frontend.cmvn import apply_cmvn, cmvn_stats
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.models import Transducer, TransducerConfig
    from tfkaldi_tpu.serve import StreamingServer, stream_transcribe

    rate = 8000
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=10,
                       nfft=256)
    ext = FeatureExtractor(opts, rate, spectrum_precision="high")
    rng = np.random.default_rng(31)
    n = 5200
    sig = np.zeros((1, 6000), np.float32)
    sig[0, :n] = rng.standard_normal(n).astype(np.float32)
    lengths = np.asarray([n])

    off_feats, off_nf = map(np.asarray, ext(sig, lengths))
    stats = cmvn_stats(off_feats, off_nf)
    off_norm = np.asarray(apply_cmvn(off_feats, stats)).astype(np.float32)

    model = Transducer(TransducerConfig(
        input_dim=10, num_labels=6, enc_type="conformer",
        pred_layers=1, pred_units=6, embed_dim=4, joint_units=8,
        enc_extra=(
            ("num_blocks", "2"), ("d_model", "12"), ("num_heads", "2"),
            ("ffn_dim", "16"), ("conv_kernel", "3"),
            ("attention_left_context", "6"), ("attention_right_context", "0"),
            ("causal_conv", "True"), ("subsample", "2"),
        ),
    ))
    params, mstate = model.init(jax.random.PRNGKey(5))

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in np.asarray(ids))

    offline_ids = TransducerDecoder(
        model, params, mstate, _IdCoder()
    ).decode_batch(off_norm, off_nf)
    offline_text = _IdCoder().decode(offline_ids[0])

    server = StreamingServer(
        lambda: StreamingTransducerTranscriber(
            OnlineFeatureExtractor(ext), model, params, mstate, _IdCoder(),
            cmvn=stats,
        ),
        pool_size=1,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        gen = stream_transcribe(server.host, server.port, sig[0, :n], 1000)
        try:
            while True:
                next(gen)
        except StopIteration as stop:
            final = stop.value
        assert final == offline_text
    finally:
        server.close()
        t.join(timeout=5)
