"""End-to-end pipeline tests with a synthetic corpus (no Kaldi).

The fake-Kaldi seam is the filesystem, exactly as in the reference: we lay
down wav.scp/utt2spk/text + a gzipped pdf-alignment archive and drive the
real pipeline code (feature prep → CMVN → shuffle → dispenser → training
controller → likelihood emission) over it.
"""

import gzip
import os
from configparser import ConfigParser

import numpy as np
import pytest
import scipy.io.wavfile

from tests import reference_port as refport
from tfkaldi_tpu.frontend.prepare_data import compute_cmvn, prepare_data, shuffle_examples
from tfkaldi_tpu.io import ArkReader

RATE = 16000


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    """A tiny wav corpus: 2 speakers × 4 utterances, 0.3-0.9 s each."""
    tmp = tmp_path_factory.mktemp("corpus")
    datadir = tmp / "data"
    datadir.mkdir()
    wavdir = tmp / "wavs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    entries = {}
    for s in range(2):
        for u in range(4):
            utt = f"spk{s}_utt{u}"
            n = int(rng.integers(RATE // 3, RATE))
            sig = (rng.standard_normal(n) * 5000).astype(np.int16)
            path = wavdir / f"{utt}.wav"
            scipy.io.wavfile.write(path, RATE, sig)
            entries[utt] = (str(path), sig)
    with open(datadir / "wav.scp", "w") as f:
        for utt, (path, _) in entries.items():
            f.write(f"{utt} {path}\n")
    with open(datadir / "utt2spk", "w") as f:
        for utt in entries:
            f.write(f"{utt} {utt.split('_')[0]}\n")
    with open(datadir / "spk2utt", "w") as f:
        for s in range(2):
            utts = " ".join(u for u in entries if u.startswith(f"spk{s}"))
            f.write(f"spk{s} {utts}\n")
    with open(datadir / "text", "w") as f:
        for utt in entries:
            f.write(f"{utt} hello world\n")
    return datadir, entries


def _feat_conf():
    return {
        "name": "8fbank",
        "type": "fbank",
        "dynamic": "nodelta",
        "winlen": "0.025",
        "winstep": "0.01",
        "nfilt": "8",
        "nfft": "512",
        "lowfreq": "0",
        "highfreq": "-1",
        "preemph": "0.97",
        "include_energy": "False",
        "snip_edges": "True",
        "numcep": "13",
        "ceplifter": "22",
    }


def test_prepare_data_matches_reference_per_utt(wav_corpus, tmp_path):
    datadir, entries = wav_corpus
    featdir = str(tmp_path / "feats")
    maxlen = prepare_data(str(datadir), featdir, _feat_conf(), batch_size=3)
    compute_cmvn(featdir)
    shuffle_examples(featdir, seed=1)

    reader = ArkReader(os.path.join(featdir, "feats.scp"))
    assert reader.utt_ids == list(entries)  # wav.scp order preserved
    lengths = []
    for utt, (_, sig) in entries.items():
        got = reader.read_utt(utt)
        golden = refport.compute(sig.astype(np.float64), RATE, _feat_conf())
        assert got.shape == golden.shape
        np.testing.assert_allclose(got, golden, atol=1e-4, rtol=1e-4)
        lengths.append(golden.shape[0])
    assert maxlen == max(lengths)
    assert int(open(os.path.join(featdir, "maxlength")).read()) == maxlen

    # cmvn stats match per-speaker concatenated sums
    cmvn_reader = ArkReader(os.path.join(featdir, "cmvn.scp"))
    for s in range(2):
        spk_feats = np.concatenate(
            [reader.read_utt(u) for u in entries if u.startswith(f"spk{s}")]
        )
        stats = cmvn_reader.read_utt(f"spk{s}")
        np.testing.assert_allclose(stats[0, :-1], spk_feats.sum(0), rtol=1e-5)
        assert stats[0, -1] == spk_feats.shape[0]

    # metadata copied; shuffled scp is a permutation
    for name in ("utt2spk", "spk2utt", "text", "wav.scp"):
        assert os.path.isfile(os.path.join(featdir, name))
    shuffled = open(os.path.join(featdir, "feats_shuffled.scp")).readlines()
    original = open(os.path.join(featdir, "feats.scp")).readlines()
    assert sorted(shuffled) == sorted(original) and shuffled != original


@pytest.fixture(scope="module")
def trained_pipeline(wav_corpus, tmp_path_factory):
    """prepare features, fake alignments, train 1 epoch via the Nnet facade."""
    datadir, entries = wav_corpus
    tmp = tmp_path_factory.mktemp("exp")
    featdir = str(tmp / "features" / "train" / "8fbank")
    prepare_data(str(datadir), featdir, _feat_conf(), batch_size=4)
    compute_cmvn(featdir)
    shuffle_examples(featdir, seed=2)

    num_labels = 6
    reader = ArkReader(os.path.join(featdir, "feats.scp"))
    alifile = str(tmp / "pdf.all.gz")
    # learnable alignments: label = quantile-binned per-frame feature mean,
    # so training descends, valid_adapt doesn't terminate us, and every
    # class occurs (nonzero prior)
    all_means = np.concatenate([reader.read_utt(u).mean(1) for u in reader.utt_ids])
    edges = np.quantile(all_means, np.linspace(0, 1, num_labels + 1)[1:-1])
    with gzip.open(alifile, "wt") as f:
        for utt in reader.utt_ids:
            ali = np.digitize(reader.read_utt(utt).mean(1), edges)
            f.write(utt + " " + " ".join(map(str, ali)) + "\n")

    config = ConfigParser()
    config["directories"] = {"expdir": str(tmp / "expdir")}
    config["nnet"] = {
        "name": "tiny",
        "context_width": "1",
        "num_hidden_units": "16",
        "num_hidden_layers": "2",
        "add_layer_period": "0",
        "starting_step": "0",
        "nonlin": "relu",
        "l2_norm": "False",
        "dropout": "1",
        "batch_norm": "True",
        "num_epochs": "2",
        "initial_learning_rate": "0.01",
        "learning_rate_decay": "1",
        "batch_size": "4",
        "numutterances_per_minibatch": "2",
        "valid_batches": "1",
        "valid_frequency": "2",
        "valid_adapt": "True",
        "valid_retries": "1",
        "check_freq": "2",
    }
    os.makedirs(str(tmp / "expdir"), exist_ok=True)

    from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.nnet import Nnet

    maxlen = int(open(os.path.join(featdir, "maxlength")).read())
    featreader = FeatureReader(
        os.path.join(featdir, "feats_shuffled.scp"),
        os.path.join(featdir, "cmvn.scp"),
        os.path.join(featdir, "utt2spk"),
        1,
        maxlen,
    )
    coder = AlignmentCoder(identity_normalizer, num_labels)
    dispenser = AlignmentBatchDispenser(featreader, coder, 4, alifile)

    nnet = Nnet(config, input_dim=8, num_labels=num_labels)
    state = nnet.train(dispenser)
    return tmp, featdir, config, nnet, state, num_labels


def test_training_produces_artifacts(trained_pipeline):
    tmp, featdir, config, nnet, state, num_labels = trained_pipeline
    savedir = nnet.savedir
    assert os.path.isdir(os.path.join(savedir, "final"))
    prior = np.load(os.path.join(savedir, "prior.npy"))
    assert prior.shape == (num_labels,)
    np.testing.assert_allclose(prior.sum(), 1.0, rtol=1e-5)
    assert int(state.step) > 0


def test_decode_emits_likelihood_ark(trained_pipeline, tmp_path):
    tmp, featdir, config, nnet, state, num_labels = trained_pipeline
    from tfkaldi_tpu.data import FeatureReader
    from tfkaldi_tpu.io import ArkWriter

    maxlen = int(open(os.path.join(featdir, "maxlength")).read())
    featreader = FeatureReader(
        os.path.join(featdir, "feats.scp"),
        os.path.join(featdir, "cmvn.scp"),
        os.path.join(featdir, "utt2spk"),
        1,
        maxlen,
    )
    decodedir = tmp_path / "decode"
    decodedir.mkdir()
    writer = ArkWriter(str(decodedir / "feats.scp"), str(decodedir / "likelihoods.ark"))
    count = nnet.decode(featreader, writer)
    assert count == 8

    reader = ArkReader(str(decodedir / "feats.scp"))
    for utt in reader.utt_ids:
        likes = reader.read_utt(utt)
        assert likes.shape[1] == num_labels
        assert np.all(np.isfinite(likes))
        # log(posterior/prior): rows should roughly be log-probabilities
        post = np.exp(likes) * np.load(os.path.join(nnet.savedir, "prior.npy"))
        np.testing.assert_allclose(post.sum(1), 1.0, atol=1e-3)


def test_length_banded_shuffle(tmp_path):
    """length_bands sorts by frame count within bands; all lines preserved,
    every band's lengths are contiguous in the sorted order."""
    import numpy as np

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.frontend.prepare_data import shuffle_examples
    from tfkaldi_tpu.io import ArkReader

    featdir, _, info = make_featdir(tmp_path, num_speakers=2, utts_per_speaker=10)
    shuffle_examples(featdir, seed=0, length_bands=4)
    shuffled = open(os.path.join(featdir, "feats_shuffled.scp")).readlines()
    original = open(os.path.join(featdir, "feats.scp")).readlines()
    assert sorted(shuffled) == sorted(original)
    assert shuffled != original  # actually shuffled (20 utts, safe bet)

    # reconstruct band structure: lengths within each contiguous band of 5
    # must all be <= the minimum of... (bands were shuffled, so check that
    # each band's length range doesn't overlap-with-crossing more than
    # banding allows: every band is an interval of the global sorted list)
    reader = ArkReader(os.path.join(featdir, "feats_shuffled.scp"))
    lengths = [reader.read_utt_data(i).shape[0] for i in range(len(reader))]
    band = 5
    all_sorted = sorted(lengths)
    # each band's multiset of lengths equals one contiguous interval chunk
    chunks = [sorted(lengths[i : i + band]) for i in range(0, len(lengths), band)]
    intervals = [all_sorted[i : i + band] for i in range(0, len(all_sorted), band)]
    assert sorted(map(tuple, chunks)) == sorted(map(tuple, intervals))
