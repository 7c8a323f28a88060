"""`cli.serve --stream`: a trained CTC config served over the
multi-stream socket, driven end to end from the command line.

Covers the config-to-transcriber factory (weights restored from the
final checkpoint, feature chain from [dnn-features], pooled-corpus CMVN)
and the MultiStreamServer behind the CLI flags: concurrent clients'
finals must equal the library-level transcriber on the same audio.
"""

import os
import threading
import time
from configparser import ConfigParser

import jax
import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.nnet import Nnet
from tfkaldi_tpu.train import Trainer, TrainerConfig
from tfkaldi_tpu.train import checkpoint as ckpt

RATE = 8000
CHUNK = 800
FEAT_DIM = 10


@pytest.fixture(scope="module")
def ctc_config(tmp_path_factory):
    """A featdir + trained(-enough) streaming CTC GRU config on disk."""
    tmp = tmp_path_factory.mktemp("stream_cli")
    featdir, _, info = make_featdir(tmp, feat_dim=FEAT_DIM)
    cfg_path = tmp / "stream.cfg"
    cfg_path.write_text(
        f"""[directories]
expdir = {tmp}/exp
train_features = {os.path.dirname(featdir)}

[dnn-features]
name = {os.path.basename(featdir)}
type = fbank
dynamic = nodelta
nfilt = {FEAT_DIM}
nfft = 256

[nnet]
name = streamnet
model = gru
loss = ctc
context_width = 0
num_hidden_layers = 1
num_hidden_units = 16
bidirectional = False
scan_unroll = 1
batch_size = 4
num_epochs = 1
initial_learning_rate = 0.01
learning_rate_decay = 1
"""
    )
    config = ConfigParser()
    assert config.read(str(cfg_path))

    from tfkaldi_tpu.cli.main import resolve_labels

    _ctc, coder, num_labels, _ = resolve_labels(config)
    net = Nnet(config, input_dim=FEAT_DIM, num_labels=num_labels)
    # an (untrained) final checkpoint is enough to exercise the path;
    # spread the output weights so transcripts are non-trivial
    trainer = Trainer(net.model, TrainerConfig(loss_type=net.loss_type))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state.params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), state.params["out"]["w"].shape)
    )
    ckpt.save_state(os.path.join(net.savedir, "final"), state, block=True)
    return str(cfg_path), featdir, config, net, coder


def test_stream_cli_serves_concurrent_clients(ctc_config, tmp_path):
    cfg_path, featdir, config, net, coder = ctc_config
    from tfkaldi_tpu.cli.serve import main as serve_main
    from tfkaldi_tpu.serve import (
        build_streaming_transcriber,
        global_cmvn,
        stream_transcribe,
    )

    port_file = tmp_path / "port"
    stopping = threading.Event()
    rc = []
    t = threading.Thread(
        target=lambda: rc.append(
            serve_main(
                [
                    "--config", cfg_path, "--stream",
                    "--slots", "2", "--chunk-size", str(CHUNK),
                    "--rate", str(RATE), "--port-file", str(port_file),
                ],
                stop=stopping.is_set,
            )
        ),
        daemon=True,
    )
    t.start()
    try:
        deadline = time.time() + 60
        while not port_file.exists() and time.time() < deadline:
            time.sleep(0.05)
        assert port_file.exists(), "server never wrote the port file"
        host, port = port_file.read_text().split()

        rng = np.random.default_rng(17)
        audios = [
            (rng.standard_normal(int(n)) * 0.1).astype(np.float32)
            for n in (4000, 6500, 3000)
        ]

        # expected: the library-level transcriber from the same config
        stats = global_cmvn(featdir)
        expected = []
        for a in audios:
            tx = build_streaming_transcriber(
                net, coder, RATE, dict(config["dnn-features"]), cmvn=stats
            )
            tx.reset(1)
            for pos in range(0, len(a), CHUNK):
                c = a[pos : pos + CHUNK][None, :]
                tx.push(c, np.asarray([c.shape[1]]))
            expected.append(tx.finish()[0])

        finals = [None] * len(audios)

        def client(i):
            gen = stream_transcribe(host, int(port), audios[i], CHUNK)
            try:
                while True:
                    next(gen)
            except StopIteration as s:
                finals[i] = s.value

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(len(audios))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert finals == expected
    finally:
        stopping.set()
        t.join(timeout=10)
    assert rc == [0]


def test_build_streaming_transcriber_rejects_hybrid(ctc_config, tmp_path):
    """Hybrid configs have no streaming text transcriber; the factory must
    say so instead of producing something subtly wrong."""
    _, featdir, config, net, coder = ctc_config
    from tfkaldi_tpu.serve import build_streaming_transcriber

    hybrid = ConfigParser()
    hybrid["directories"] = {"expdir": str(tmp_path / "exp")}
    hybrid["nnet"] = {
        "name": "hyb", "context_width": "0", "num_hidden_layers": "1",
        "num_hidden_units": "8",
    }
    hnet = Nnet(hybrid, input_dim=FEAT_DIM, num_labels=5)
    trainer = Trainer(hnet.model, TrainerConfig())
    ckpt.save_state(
        os.path.join(hnet.savedir, "final"),
        trainer.init_state(jax.random.PRNGKey(0)),
        block=True,
    )
    with pytest.raises(ValueError, match="streaming"):
        build_streaming_transcriber(
            hnet, coder, RATE, dict(config["dnn-features"])
        )


def test_build_streaming_transcriber_rnnt_beam(ctc_config, tmp_path):
    """`beam_width > 1` on an RNN-T config builds the BEAM transducer
    transcriber (frame-synchronous beam + label-time backtrace), and its
    finals/timestamps equal a directly constructed beam transcriber."""
    _, featdir, config, _, coder = ctc_config
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import OnlineFeatureExtractor
    from tfkaldi_tpu.serve import build_streaming_transcriber

    rcfg = ConfigParser()
    rcfg["directories"] = {"expdir": str(tmp_path / "exp")}
    rcfg["nnet"] = {
        "name": "rnnt_beam", "model": "transducer", "loss": "rnnt",
        "context_width": "0", "enc_type": "gru", "num_hidden_layers": "1",
        "num_hidden_units": "12", "bidirectional": "False",
        "pred_layers": "1", "pred_units": "8", "embed_dim": "4",
        "joint_units": "12", "beam_width": "4", "scan_unroll": "1",
    }
    net = Nnet(rcfg, input_dim=FEAT_DIM, num_labels=coder.num_labels)
    trainer = Trainer(net.model, TrainerConfig(loss_type="rnnt"))
    state = trainer.init_state(jax.random.PRNGKey(3))
    ckpt.save_state(os.path.join(net.savedir, "final"), state, block=True)

    tx = build_streaming_transcriber(
        net, coder, RATE, dict(config["dnn-features"])
    )
    assert isinstance(tx, StreamingTransducerTranscriber)
    assert tx.beam_width == 4

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(4000) * 0.1).astype(np.float32)

    def run(transcriber):
        transcriber.reset(1)
        for pos in range(0, len(audio), CHUNK):
            c = audio[pos : pos + CHUNK][None, :]
            transcriber.push(c, np.asarray([c.shape[1]]))
        final = transcriber.finish()[0]
        return final, transcriber.timestamps()[0]

    final, times = run(tx)
    ext = FeatureExtractor(
        FeatureOpts.from_config(dict(config["dnn-features"])), RATE
    )
    want = StreamingTransducerTranscriber(
        OnlineFeatureExtractor(ext), net.model, state.params,
        state.model_state, coder, beam_width=4,
    )
    want_final, want_times = run(want)
    assert final == want_final
    np.testing.assert_allclose(times, want_times)
