"""Full-pipeline CLI integration: wav corpus → features → (stub) GMM train
→ (stub) forced alignment → DNN training → likelihood emission → (stub)
WFST decode → WER. Every external-Kaldi boundary runs through real
subprocesses against stub scripts (tests/test_fake_kaldi.py pattern); the
TPU side is real."""

import os
import stat
import sys
from configparser import ConfigParser

import numpy as np
import pytest
import scipy.io.wavfile

from tfkaldi_tpu.cli.main import main

RATE = 16000


def _write_exec(path, body):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("#!/bin/bash\nset -e\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def workspace(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    # ---- corpus ----
    for kind in ("train", "test"):
        d = tmp_path / f"{kind}_data"
        d.mkdir()
        w = tmp_path / f"{kind}_wavs"
        w.mkdir()
        utts = []
        for s in range(2):
            for u in range(3):
                utt = f"{kind}s{s}u{u}"
                sig = (rng.standard_normal(int(rng.integers(6000, 12000))) * 3000).astype(
                    np.int16
                )
                scipy.io.wavfile.write(w / f"{utt}.wav", RATE, sig)
                utts.append((utt, f"spk{s}"))
        (d / "wav.scp").write_text("".join(f"{u} {w}/{u}.wav\n" for u, _ in utts))
        (d / "utt2spk").write_text("".join(f"{u} {s}\n" for u, s in utts))
        (d / "spk2utt").write_text(
            "".join(
                f"spk{s} " + " ".join(u for u, sp in utts if sp == f"spk{s}") + "\n"
                for s in range(2)
            )
        )
        (d / "text").write_text("".join(f"{u} hello world\n" for u, _ in utts))

    # ---- fake kaldi egs ----
    egs = tmp_path / "egs"
    bindir = egs / "fakebin"
    path_line = f'export PATH="{bindir}:$PATH"\n'

    _write_exec(
        str(bindir / "run.pl"),
        'while [[ "$1" == --* ]]; do shift 2; done\n'
        "spec=$1; shift\nlog=$1; shift\n"
        'n=${spec##*:}\nfor j in $(seq 1 "$n"); do\n'
        '  thislog=${log//JOB/$j}\n  mkdir -p "$(dirname "$thislog")"\n'
        '  cmd="$*"\n  cmd=${cmd//JOB/$j}\n  bash -c "$cmd" > "$thislog" 2>&1\ndone\n',
    )
    _write_exec(str(bindir / "latgen-faster-mapped"), "cat > /dev/null || true\necho lat\n")
    _write_exec(str(bindir / "copy-feats"), "echo feats\n")

    num_pdfs = 6
    for script in ("train_mono.sh", "train_deltas.sh", "train_lda_mllt.sh"):
        _write_exec(
            str(egs / "steps" / script),
            'while [[ "$1" == --* ]]; do shift 2; done\n'
            'expdir=${!#}\nmkdir -p "$expdir"\necho fake-mdl > "$expdir/final.mdl"\n',
        )
    _write_exec(
        str(egs / "utils" / "mkgraph.sh"),
        'while [[ "$1" == --* ]]; do shift; done\n'
        f'graph=${{!#}}\nmkdir -p "$graph"\necho {num_pdfs} > "$graph/num_pdfs"\n'
        'echo fake-fst > "$graph/HCLG.fst"\necho "a 1" > "$graph/words.txt"\n',
    )
    # align_si stub: delegate to a python helper that reads the featdir and
    # emits frame-length-matched TRANSITION-id alignments per job; the real
    # gmm.align() pipeline (gunzip | ali-to-pdf | gzip) then converts them
    # to pdf-ids through the fake ali-to-pdf (which halves each id)
    helper = tmp_path / "emit_ali.py"
    helper.write_text(
        f"""
import gzip, os, sys
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import numpy as np
from tfkaldi_tpu.io import ArkReader

featdir, alidir, nj = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(alidir, exist_ok=True)
reader = ArkReader(os.path.join(featdir, "feats.scp"))
rng = np.random.default_rng(0)
utts = reader.utt_ids
chunk = -(-len(utts) // nj)
for j in range(nj):
    with gzip.open(os.path.join(alidir, f"ali.{{j + 1}}.gz"), "wt") as f:
        for utt in utts[j * chunk : (j + 1) * chunk]:
            t = reader.read_utt(utt).shape[0]
            # transition ids = 2*pdf so the fake ali-to-pdf halving lands
            # in [0, num_pdfs)
            ali = 2 * rng.integers(0, {num_pdfs}, size=t)
            f.write(utt + " " + " ".join(map(str, ali)) + "\\n")
"""
    )
    _write_exec(
        str(egs / "steps" / "align_si.sh"),
        path_line
        + 'nj=2\nwhile [[ "$1" == --* ]]; do if [[ "$1" == --nj ]]; then nj=$2; fi; shift 2; done\n'
        "featdir=$1; alidir=$4\n"
        f'mkdir -p "$alidir"\ncp "$(dirname "$alidir")/final.mdl" "$alidir/final.mdl" 2>/dev/null || true\n'
        f'{sys.executable} {helper} "$featdir" "$alidir" "$nj"\n',
    )
    # fake ali-to-pdf: transition-ids -> pdf-ids by halving each id
    # (args: final.mdl ark:- ark,t:- — reads stdin, writes stdout)
    _write_exec(
        str(bindir / "ali-to-pdf"),
        'awk \'{ printf "%s", $1; for (i=2; i<=NF; i++) printf " %d", int($i/2); print "" }\'\n',
    )
    _write_exec(
        str(egs / "utils" / "split_data.sh"),
        'data=$1; nj=$2\nfor j in $(seq 1 "$nj"); do\n'
        '  mkdir -p "$data/split$nj/$j"\n'
        '  cp "$data/feats.scp" "$data/split$nj/$j/feats.scp"\ndone\n',
    )
    _write_exec(
        str(egs / "local" / "score.sh"),
        'while [[ "$1" == --* ]]; do shift 2; done\n'
        'decode_dir=${!#}\necho "%WER 5.55 [ 55 / 990 ]" > "$decode_dir/wer_10"\n',
    )
    monkeypatch.setenv("PATH", f"{bindir}:" + os.environ["PATH"])

    # ---- config ----
    cfg = tmp_path / "config.cfg"
    feat_section = """name = feats
type = fbank
dynamic = nodelta
winlen = 0.025
winstep = 0.01
nfilt = 8
nfft = 512
lowfreq = 0
highfreq = -1
preemph = 0.97
include_energy = False
snip_edges = True
numcep = 6
ceplifter = 22
"""
    cfg.write_text(
        f"""[directories]
train_data = {tmp_path}/train_data
test_data = {tmp_path}/test_data
train_features = {tmp_path}/features/train
test_features = {tmp_path}/features/test
language = {tmp_path}/lang
language_test = {tmp_path}/lang_test
expdir = {tmp_path}/exp
kaldi_egs = {egs}

[general]
num_jobs = 2
cmd = run.pl

[gmm-features]
{feat_section}
[dnn-features]
{feat_section}
[mono_gmm]
name = mono_gmm

[tri_gmm]
name = tri_gmm
num_leaves = 10
tot_gauss = 40

[lda_mllt]
name = lda_gmm
context_width = 1
num_leaves = 10
tot_gauss = 40

[nnet]
name = full_nnet
gmm_name = mono_gmm
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
    return tmp_path, cfg


def test_full_pipeline_wav_to_wer(workspace):
    tmp, cfg = workspace
    rc = main(
        [
            "--config",
            str(cfg),
            "--steps",
            "gmm_train_features,gmm_test_features,train_mono,align_mono,"
            "train_tri,align_tri,train_lda,align_lda,train_nnet,test_nnet",
        ]
    )
    assert rc == 0
    # features
    assert (tmp / "features" / "train" / "feats" / "feats.scp").exists()
    # stub GMM artifacts for the whole mono -> tri -> lda chain
    for gmm in ("mono_gmm", "tri_gmm", "lda_gmm"):
        assert (tmp / "exp" / gmm / "final.mdl").exists(), gmm
        assert (tmp / "exp" / gmm / "ali" / "pdf.1.gz").exists(), gmm
    # trained net + prior
    assert (tmp / "exp" / "full_nnet" / "final").is_dir()
    prior = np.load(tmp / "exp" / "full_nnet" / "prior.npy")
    np.testing.assert_allclose(prior.sum(), 1.0, rtol=1e-5)
    # likelihoods + stub decode + scoring
    decodedir = tmp / "exp" / "full_nnet" / "decode"
    assert (decodedir / "likelihoods.ark").exists()
    assert (decodedir / "kaldi_decode" / "wer_10").exists()
