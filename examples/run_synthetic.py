"""End-to-end demo on synthetic data — no Kaldi, no dataset needed.

Generates a tiny wav corpus + fake pdf alignments (standing in for the
Kaldi GMM alignment stage), then runs the real pipeline: batched feature
extraction → CMVN → DNN training (validation rollback, checkpoints,
prior) → batched likelihood decode to a Kaldi ark.

    python examples/run_synthetic.py [workdir]

On a machine without a TPU, run with JAX_PLATFORMS=cpu.
"""

import gzip
import logging
import os
import sys
import tempfile
from configparser import ConfigParser

import numpy as np
import scipy.io.wavfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
from tfkaldi_tpu.data.target_normalizers import identity_normalizer
from tfkaldi_tpu.frontend.prepare_data import compute_cmvn, prepare_data, shuffle_examples
from tfkaldi_tpu.io import ArkReader, ArkWriter
from tfkaldi_tpu.nnet import Nnet

RATE = 16000
NUM_PDFS = 8

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")


def make_corpus(root: str) -> str:
    """wav.scp/utt2spk/spk2utt/text for 2 speakers x 8 utterances."""
    rng = np.random.default_rng(0)
    datadir = os.path.join(root, "data")
    wavdir = os.path.join(root, "wavs")
    os.makedirs(datadir), os.makedirs(wavdir)
    utts = []
    for s in range(2):
        for u in range(8):
            utt = f"spk{s}u{u}"
            sig = (rng.standard_normal(int(rng.integers(8000, 16000))) * 3000).astype(
                np.int16
            )
            scipy.io.wavfile.write(os.path.join(wavdir, f"{utt}.wav"), RATE, sig)
            utts.append((utt, f"spk{s}"))
    with open(os.path.join(datadir, "wav.scp"), "w") as f:
        f.writelines(f"{u} {wavdir}/{u}.wav\n" for u, _ in utts)
    with open(os.path.join(datadir, "utt2spk"), "w") as f:
        f.writelines(f"{u} {s}\n" for u, s in utts)
    with open(os.path.join(datadir, "spk2utt"), "w") as f:
        for s in range(2):
            members = " ".join(u for u, sp in utts if sp == f"spk{s}")
            f.write(f"spk{s} {members}\n")
    return datadir


def fake_alignments(featdir: str, out_path: str) -> None:
    """Frame-level pdf targets (what `ali-to-pdf` would produce)."""
    rng = np.random.default_rng(1)
    reader = ArkReader(os.path.join(featdir, "feats.scp"))
    with gzip.open(out_path, "wt") as f:
        for utt in reader.utt_ids:
            t = reader.read_utt(utt).shape[0]
            ali = rng.integers(0, NUM_PDFS, size=t)
            f.write(utt + " " + " ".join(map(str, ali)) + "\n")
    reader.close()


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="tfkaldi_tpu_")
    os.makedirs(root, exist_ok=True)
    datadir = make_corpus(root)
    featdir = os.path.join(root, "features")

    feat_conf = {
        "type": "fbank", "dynamic": "nodelta", "winlen": "0.025", "winstep": "0.01",
        "nfilt": "20", "nfft": "512", "lowfreq": "0", "highfreq": "-1",
        "preemph": "0.97", "include_energy": "False", "snip_edges": "True",
    }
    print("== feature extraction")
    prepare_data(datadir, featdir, feat_conf)
    compute_cmvn(featdir)
    shuffle_examples(featdir, seed=0)

    alifile = os.path.join(root, "pdf.all.gz")
    fake_alignments(featdir, alifile)

    cfg = ConfigParser()
    cfg["directories"] = {"expdir": os.path.join(root, "exp")}
    cfg["nnet"] = {
        "name": "demo", "context_width": "2", "num_hidden_units": "64",
        "num_hidden_layers": "2", "add_layer_period": "0", "starting_step": "0",
        "nonlin": "relu", "l2_norm": "False", "dropout": "1", "batch_norm": "True",
        "num_epochs": "4", "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "-1", "valid_batches": "1",
        "valid_frequency": "6", "valid_adapt": "True", "valid_retries": "2",
        "check_freq": "6", "visualise": "False",
    }
    maxlen = int(open(os.path.join(featdir, "maxlength")).read())
    reader = FeatureReader(
        os.path.join(featdir, "feats_shuffled.scp"),
        os.path.join(featdir, "cmvn.scp"),
        os.path.join(featdir, "utt2spk"),
        2,
        maxlen,
    )
    coder = AlignmentCoder(identity_normalizer, NUM_PDFS)
    dispenser = AlignmentBatchDispenser(reader, coder, 4, alifile)

    print("== training")
    nnet = Nnet(cfg, input_dim=20, num_labels=NUM_PDFS)
    nnet.train(dispenser)

    print("== decoding")
    reader2 = FeatureReader(
        os.path.join(featdir, "feats.scp"),
        os.path.join(featdir, "cmvn.scp"),
        os.path.join(featdir, "utt2spk"),
        2,
        maxlen,
    )
    decodedir = os.path.join(root, "decode")
    os.makedirs(decodedir, exist_ok=True)
    writer = ArkWriter(
        os.path.join(decodedir, "feats.scp"), os.path.join(decodedir, "likelihoods.ark")
    )
    n = nnet.decode(reader2, writer)
    likes = ArkReader(os.path.join(decodedir, "feats.scp"))
    mat = likes.read_utt(likes.utt_ids[0])
    print(
        f"== done: {n} utterances decoded; log-likelihood matrix {mat.shape}; "
        f"artifacts in {root}"
    )


if __name__ == "__main__":
    main()
