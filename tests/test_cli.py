"""CLI driver smoke test: config + steps → features → training → likelihoods.

Exercises the real `python -m tfkaldi_tpu.cli.main` path (in-process) over a
synthetic corpus with a fake GMM expdir standing in for external Kaldi.
"""

import gzip
import os

import numpy as np
import pytest
import scipy.io.wavfile

from tfkaldi_tpu.cli.main import main
from tfkaldi_tpu.io import ArkReader

RATE = 16000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(1)

    # corpus dirs (train == test for simplicity)
    for kind in ("train", "test"):
        datadir = tmp / f"{kind}_data"
        datadir.mkdir()
        wavs = tmp / f"{kind}_wavs"
        wavs.mkdir()
        utts = []
        for s in range(2):
            for u in range(3):
                utt = f"{kind}_spk{s}_u{u}"
                sig = (rng.standard_normal(int(rng.integers(5000, 12000))) * 4000).astype(
                    np.int16
                )
                scipy.io.wavfile.write(wavs / f"{utt}.wav", RATE, sig)
                utts.append((utt, f"spk{s}"))
        with open(datadir / "wav.scp", "w") as f:
            for utt, _ in utts:
                f.write(f"{utt} {wavs}/{utt}.wav\n")
        with open(datadir / "utt2spk", "w") as f:
            for utt, spk in utts:
                f.write(f"{utt} {spk}\n")
        with open(datadir / "spk2utt", "w") as f:
            for s in range(2):
                members = " ".join(u for u, spk in utts if spk == f"spk{s}")
                f.write(f"spk{s} {members}\n")
        with open(datadir / "text", "w") as f:
            for utt, _ in utts:
                f.write(f"{utt} test transcript\n")

    expdir = tmp / "expdir"
    (expdir / "fake_gmm" / "graph").mkdir(parents=True)
    (expdir / "fake_gmm" / "ali").mkdir()
    num_labels = 4
    (expdir / "fake_gmm" / "graph" / "num_pdfs").write_text(f"{num_labels}\n")

    cfg = tmp / "config.cfg"
    cfg.write_text(
        f"""[directories]
train_data = {tmp}/train_data
test_data = {tmp}/test_data
train_features = {tmp}/features/train
test_features = {tmp}/features/test
language = {tmp}/lang
language_test = {tmp}/lang_test
expdir = {expdir}
kaldi_egs = {tmp}/egs

[general]
num_jobs = 2
cmd = run.pl

[gmm-features]
name = feats
type = mfcc
dynamic = nodelta
winlen = 0.025
winstep = 0.01
nfilt = 10
nfft = 512
lowfreq = 0
highfreq = -1
preemph = 0.97
include_energy = False
snip_edges = True
numcep = 6
ceplifter = 22

[dnn-features]
name = feats
type = mfcc
dynamic = nodelta
winlen = 0.025
winstep = 0.01
nfilt = 10
nfft = 512
lowfreq = 0
highfreq = -1
preemph = 0.97
include_energy = False
snip_edges = True
numcep = 6
ceplifter = 22

[mono_gmm]
name = fake_gmm

[tri_gmm]
name = fake_gmm
num_leaves = 100
tot_gauss = 400

[lda_mllt]
name = fake_gmm
context_width = 1
num_leaves = 100
tot_gauss = 400

[nnet]
name = cli_nnet
gmm_name = fake_gmm
context_width = 1
num_hidden_units = 16
num_hidden_layers = 2
add_layer_period = 0
starting_step = 0
monophone = False
nonlin = relu
l2_norm = False
dropout = 1
batch_norm = False
num_epochs = 2
initial_learning_rate = 0.005
learning_rate_decay = 1
batch_size = 3
numutterances_per_minibatch = -1
valid_batches = 1
valid_frequency = 4
valid_adapt = False
valid_retries = 1
check_freq = 4
visualise = False
"""
    )
    return tmp, cfg, num_labels


def test_cli_feature_steps(workspace):
    tmp, cfg, _ = workspace
    rc = main(["--config", str(cfg), "--steps", "gmm_train_features,gmm_test_features"])
    assert rc == 0
    for kind in ("train", "test"):
        featdir = tmp / "features" / kind / "feats"
        assert (featdir / "feats.scp").exists()
        assert (featdir / "cmvn.scp").exists()
        assert (featdir / "maxlength").exists()
        reader = ArkReader(str(featdir / "feats.scp"))
        assert len(reader) == 6
        assert reader.read_utt_data(0).shape[1] == 6  # numcep


def test_cli_train_and_likelihoods(workspace):
    tmp, cfg, num_labels = workspace
    # fake per-job alignment archives (what ali-to-pdf would produce)
    rng = np.random.default_rng(5)
    featdir = tmp / "features" / "train" / "feats"
    reader = ArkReader(str(featdir / "feats.scp"))
    utts = reader.utt_ids
    half = len(utts) // 2
    for j, chunk in enumerate([utts[:half], utts[half:]], start=1):
        with gzip.open(tmp / "expdir" / "fake_gmm" / "ali" / f"pdf.{j}.gz", "wt") as f:
            for utt in chunk:
                t = reader.read_utt(utt).shape[0]
                ali = rng.integers(0, num_labels, size=t)
                f.write(utt + " " + " ".join(map(str, ali)) + "\n")

    rc = main(["--config", str(cfg), "--steps", "train_nnet"])
    assert rc == 0
    savedir = tmp / "expdir" / "cli_nnet"
    assert (savedir / "final").is_dir()
    prior = np.load(savedir / "prior.npy")
    assert prior.shape == (num_labels,)

    # likelihood emission (the Kaldi-free half of test_nnet)
    from configparser import ConfigParser

    from tfkaldi_tpu.data import FeatureReader
    from tfkaldi_tpu.io import ArkWriter
    from tfkaldi_tpu.nnet import Nnet

    config = ConfigParser()
    config.read(cfg)
    test_featdir = tmp / "features" / "test" / "feats"
    maxlen = int((test_featdir / "maxlength").read_text())
    featreader = FeatureReader(
        str(test_featdir / "feats.scp"),
        str(test_featdir / "cmvn.scp"),
        str(test_featdir / "utt2spk"),
        1,
        maxlen,
    )
    decodedir = tmp / "decode_out"
    decodedir.mkdir(exist_ok=True)
    writer = ArkWriter(str(decodedir / "feats.scp"), str(decodedir / "likelihoods.ark"))
    nnet = Nnet(config, input_dim=6, num_labels=num_labels)
    count = nnet.decode(featreader, writer)
    assert count == 6
    likes = ArkReader(str(decodedir / "feats.scp"))
    mat = likes.read_utt(likes.utt_ids[0])
    assert mat.shape[1] == num_labels and np.all(np.isfinite(mat))


def test_cli_ctc_train_and_decode(workspace):
    """`loss = ctc` in [nnet] switches the driver to the character-CTC
    pipeline: TextBatchDispenser training + greedy text decode."""
    tmp, cfg, _ = workspace
    ctc_cfg = tmp / "config_ctc.cfg"
    text = cfg.read_text().replace("name = cli_nnet", "name = cli_ctc_nnet")
    text = text.replace("[nnet]", "[nnet]\nloss = ctc\nnormalizer = aurora4")
    ctc_cfg.write_text(text)

    rc = main(["--config", str(ctc_cfg), "--steps", "train_nnet"])
    assert rc == 0
    assert (tmp / "expdir" / "cli_ctc_nnet" / "final").is_dir()

    rc = main(["--config", str(ctc_cfg), "--steps", "test_nnet"])
    assert rc == 0
    out = tmp / "expdir" / "cli_ctc_nnet" / "decode" / "text"
    lines = out.read_text().splitlines()
    assert len(lines) == 6
    assert all(line.split(" ", 1)[0].startswith("test_spk") for line in lines)


def test_cli_transducer_train_and_decode(workspace):
    """`model = transducer` + `loss = rnnt` drives the RNN-T pipeline:
    TextBatchDispenser training through the lattice loss, then batched
    greedy transducer search emitting a text file."""
    tmp, cfg, _ = workspace
    t_cfg = tmp / "config_rnnt.cfg"
    text = cfg.read_text().replace("name = cli_nnet", "name = cli_rnnt_nnet")
    text = text.replace("num_hidden_layers = 2", "num_hidden_layers = 1")
    text = text.replace(
        "[nnet]",
        "[nnet]\nloss = rnnt\nmodel = transducer\nnormalizer = aurora4\n"
        "pred_units = 16\nembed_dim = 8\njoint_units = 16\nscan_unroll = 1",
    )
    t_cfg.write_text(text)

    rc = main(["--config", str(t_cfg), "--steps", "train_nnet"])
    assert rc == 0
    assert (tmp / "expdir" / "cli_rnnt_nnet" / "final").is_dir()

    rc = main(["--config", str(t_cfg), "--steps", "test_nnet"])
    assert rc == 0
    out = tmp / "expdir" / "cli_rnnt_nnet" / "decode" / "text"
    lines = out.read_text().splitlines()
    assert len(lines) == 6
    assert all(line.split(" ", 1)[0].startswith("test_spk") for line in lines)

    # beam_width > 1 re-decodes the same checkpoint through the batched
    # beam search (decode/transducer_beam.py) behind the same config knob
    # the CTC path uses
    b_cfg = tmp / "config_rnnt_beam.cfg"
    b_cfg.write_text(
        t_cfg.read_text().replace("[nnet]", "[nnet]\nbeam_width = 2")
    )
    rc = main(["--config", str(b_cfg), "--steps", "test_nnet"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 6
    assert all(line.split(" ", 1)[0].startswith("test_spk") for line in lines)

    # lm_path fuses a character ARPA LM into the jitted beam (the dense
    # table path, decode/lm.py::DenseFusionTable)
    arpa = tmp / "toy.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\n\n\\1-grams:\n-0.5\tT\t-0.3\n-0.9\t<s>\n"
        "-1.2\t<unk>\n\n\\end\\\n"
    )
    lm_cfg = tmp / "config_rnnt_lm.cfg"
    lm_cfg.write_text(
        t_cfg.read_text().replace(
            "[nnet]",
            f"[nnet]\nbeam_width = 2\nlm_path = {arpa}\nlm_alpha = 0.3",
        )
    )
    rc = main(["--config", str(lm_cfg), "--steps", "test_nnet"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 6


def test_cli_seq2seq_train_and_decode(workspace):
    """`model = seq2seq` + `loss = attention` drives the encoder-decoder
    pipeline: teacher-forced label-smoothed CE training, then batched
    attention beam search emitting a text file."""
    tmp, cfg, _ = workspace
    s_cfg = tmp / "config_seq2seq.cfg"
    text = cfg.read_text().replace("name = cli_nnet", "name = cli_s2s_nnet")
    text = text.replace("num_hidden_layers = 2", "num_hidden_layers = 1")
    text = text.replace(
        "[nnet]",
        "[nnet]\nloss = attention\nmodel = seq2seq\nnormalizer = aurora4\n"
        "enc_type = lstm\ndec_blocks = 1\nd_model = 16\nnum_heads = 2\n"
        "ffn_dim = 24\nbeam_width = 2\nmax_decode_tokens = 20\n"
        "ctc_weight = 0.3\nscan_unroll = 1",
    )
    s_cfg.write_text(text)

    rc = main(["--config", str(s_cfg), "--steps", "train_nnet"])
    assert rc == 0
    assert (tmp / "expdir" / "cli_s2s_nnet" / "final").is_dir()

    rc = main(["--config", str(s_cfg), "--steps", "test_nnet"])
    assert rc == 0
    out = tmp / "expdir" / "cli_s2s_nnet" / "decode" / "text"
    lines = out.read_text().splitlines()
    assert len(lines) == 6
    assert all(line.split(" ", 1)[0].startswith("test_spk") for line in lines)

    # same checkpoint, two-pass attention-rescoring decode
    r_cfg = tmp / "config_s2s_rescore.cfg"
    r_cfg.write_text(
        s_cfg.read_text().replace(
            "[nnet]", "[nnet]\ndecode_mode = rescoring\nrescore_weight = 0.5"
        )
    )
    rc = main(["--config", str(r_cfg), "--steps", "test_nnet"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 6
