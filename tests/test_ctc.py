"""CTC path: loss, training convergence, and greedy decoding.

The reference ships only a broken CTCTrainer (trainer.py:533-570, no
working loss and no decode); these tests pin down our working TPU-native
CTC pipeline (optax.ctc_loss + best-path decode + TextCoder emission).
"""

import os

import jax
import numpy as np
import pytest

from tfkaldi_tpu.data.batching import DeviceBatcher
from tfkaldi_tpu.decode.ctc import collapse_ctc_path
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig


def test_collapse_repeats_and_blanks():
    # path: a a _ a b b _ _ c  (blank=0, labels shifted +1)
    path = np.array([1, 1, 0, 1, 2, 2, 0, 0, 3])
    np.testing.assert_array_equal(collapse_ctc_path(path, blank_id=0), [1, 1, 2, 3])


def test_collapse_empty_and_all_blank():
    assert collapse_ctc_path(np.array([]), 0).size == 0
    assert collapse_ctc_path(np.zeros(5, int), 0).size == 0


def _toy_ctc_problem(num_labels=4, batch=8, t=32, seed=0):
    """Inputs are noisy one-hots of a random frame-level path; targets are
    the collapsed path. A tiny MLP must learn identity → CTC loss drops."""
    rng = np.random.default_rng(seed)
    blank = num_labels  # model emits num_labels+1 classes
    inputs = np.zeros((batch, t, num_labels + 1), np.float32)
    targets, tlens = [], []
    for b in range(batch):
        path = rng.integers(0, num_labels + 1, size=t)  # includes blank frames
        inputs[b, np.arange(t), path] = 4.0
        lab = collapse_ctc_path(path, blank)
        if lab.size == 0:
            lab = np.array([1], np.int32)
            inputs[b, : t // 2, :] = 0
            inputs[b, : t // 2, 1] = 4.0
        targets.append(lab)
        tlens.append(len(lab))
    inputs += rng.standard_normal(inputs.shape).astype(np.float32) * 0.1
    l_pad = max(tlens)
    tgt = np.zeros((batch, l_pad), np.int32)
    for b, lab in enumerate(targets):
        tgt[b, : len(lab)] = lab
    from tfkaldi_tpu.data.batching import PaddedBatch

    return PaddedBatch(
        inputs,
        tgt,
        np.full(batch, t, np.int32),
        np.asarray(tlens, np.int32),
    ), blank


def test_ctc_loss_decreases():
    batch, blank = _toy_ctc_problem()
    num_classes = batch.inputs.shape[-1]
    model = DNN(
        DNNConfig(
            input_dim=num_classes,
            num_labels=num_classes,
            num_hidden_layers=1,
            num_hidden_units=32,
            nonlin="relu",
        )
    )
    trainer = Trainer(
        model,
        TrainerConfig(
            init_learning_rate=0.05,
            num_steps=60,
            loss_type="ctc",
            ctc_blank_id=blank,
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    losses = []
    for i in range(60):
        state, loss = trainer.update(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_ctc_e2e_train_and_decode_text(tmp_path):
    """Full character-CTC slice: synthetic featdir + text → Nnet(loss=ctc)
    train → greedy decode to a Kaldi-style text file."""
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import FeatureReader, TextBatchDispenser, TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, _, info = make_featdir(tmp_path, utts_per_speaker=4)
    # synthetic transcriptions (Kaldi `text` format)
    words = ["HELLO", "WORLD", "SPEECH", "ON TPU"]
    with open(os.path.join(featdir, "text"), "w") as f:
        for i, utt in enumerate(info["utts"]):
            f.write(f"{utt} {words[i % len(words)]}\n")

    coder = TextCoder(aurora4_normalizer)
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "ctcnet",
        "context_width": "1",
        "num_hidden_units": "32",
        "num_hidden_layers": "2",
        "add_layer_period": "0",
        "starting_step": "0",
        "nonlin": "relu",
        "l2_norm": "False",
        "dropout": "1",
        "batch_norm": "False",
        "num_epochs": "2",
        "initial_learning_rate": "0.01",
        "learning_rate_decay": "1",
        "batch_size": "4",
        "numutterances_per_minibatch": "4",
        "valid_batches": "0",
        "valid_frequency": "100",
        "valid_adapt": "False",
        "valid_retries": "0",
        "check_freq": "100",
        "visualise": "False",
        "loss": "ctc",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    dispenser = TextBatchDispenser(reader, coder, 4, os.path.join(featdir, "text"))
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    state = net.train(dispenser)
    assert int(state.step) > 0

    reader2 = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    out = str(tmp_path / "decoded.txt")
    n = net.decode_text(reader2, coder, out)
    lines = open(out).read().splitlines()
    assert n == len(lines) == len(info["utts"])
    for line in lines:
        utt_id = line.split(" ")[0]
        assert utt_id in info["utts"]


def test_decode_text_with_lm_fusion(tmp_path):
    """`[nnet] lm_path` wires ARPA shallow fusion into decode_text; a
    bad beam_width is rejected."""
    from configparser import ConfigParser

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import FeatureReader, TextBatchDispenser, TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.nnet import Nnet

    featdir, _, info = make_featdir(tmp_path, utts_per_speaker=4)
    with open(os.path.join(featdir, "text"), "w") as f:
        for i, utt in enumerate(info["utts"]):
            f.write(f"{utt} {'HELLO' if i % 2 else 'WORLD'}\n")

    coder = TextCoder(aurora4_normalizer)
    # character-level unigram LM over the coder's own alphabet
    chars = [t for t in coder.alphabet]
    lp = -1.5
    lm_lines = ["\\data\\", f"ngram 1={len(chars)}", "", "\\1-grams:"]
    lm_lines += [f"{lp}\t{c}" for c in chars]
    lm_lines += ["", "\\end\\", ""]
    lm_path = tmp_path / "chars.arpa"
    lm_path.write_text("\n".join(lm_lines))

    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "ctclm", "context_width": "1", "num_hidden_units": "16",
        "num_hidden_layers": "1", "add_layer_period": "0",
        "starting_step": "0", "nonlin": "relu", "l2_norm": "False",
        "dropout": "1", "batch_norm": "False", "num_epochs": "1",
        "initial_learning_rate": "0.01", "learning_rate_decay": "1",
        "batch_size": "4", "numutterances_per_minibatch": "4",
        "valid_batches": "0", "valid_frequency": "100",
        "valid_adapt": "False", "valid_retries": "0", "check_freq": "100",
        "visualise": "False", "loss": "ctc",
        "beam_width": "4", "lm_path": str(lm_path),
        "lm_alpha": "0.4", "lm_beta": "0.1",
    }

    def reader():
        return FeatureReader(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp",
            f"{featdir}/utt2spk", 1, 60,
        )

    dispenser = TextBatchDispenser(reader(), coder, 4,
                                   os.path.join(featdir, "text"))
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)
    out = str(tmp_path / "decoded_lm.txt")
    n = net.decode_text(reader(), coder, out)
    assert n == len(open(out).read().splitlines()) == len(info["utts"])

    cfg["nnet"]["beam_width"] = "1"
    net2 = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="beam_width"):
        net2.decode_text(reader(), coder, str(tmp_path / "x.txt"))
