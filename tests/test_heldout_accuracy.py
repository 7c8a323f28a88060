"""Held-out accuracy gates — the in-sandbox WER proxy.

The reference's end goal is a held-out evaluation: ``test_nnet`` decodes
an unseen test set and Kaldi scores WER (main.py:160-198). No Kaldi or
corpus exists in this sandbox, so these tests supply the strongest
available stand-in: a deterministic synthetic corpus with known structure
(distinct spectral signatures per label class, DISJOINT train/test
speakers — tests/synthetic.py::make_class_signature_corpus), a small
model trained per paradigm through the production ``Nnet`` facade, and a
decode of the HELD-OUT split asserted under an error threshold:

- hybrid CE path: held-out framewise state accuracy (the quantity the
  pseudo-likelihoods carry into Kaldi's WFST decode)
- CTC: held-out CER, greedy and beam
- RNN-T: held-out CER, greedy transducer search
- attention seq2seq: held-out CER, beam search

Chance level is 1/num_classes (20%) framewise and ~100% CER; the gates
are far below that. If any paradigm stops generalizing — a loss seam, a
decode seam, or a data-pipeline regression — these fail.
"""

import os
from configparser import ConfigParser

import numpy as np
import pytest

from tests.synthetic import make_class_signature_corpus
from tfkaldi_tpu.data import (
    AlignmentBatchDispenser,
    AlignmentCoder,
    FeatureReader,
    TextBatchDispenser,
    TextCoder,
)
from tfkaldi_tpu.data.target_normalizers import (
    aurora4_normalizer,
    identity_normalizer,
)
from tfkaldi_tpu.nnet import Nnet
from tfkaldi_tpu.utils.wer import edit_distance

CONTEXT_WIDTH = 1  # hybrid splice; sequence models use 0


def _reader(featdir: str, max_length: int, context_width: int = 0) -> FeatureReader:
    return FeatureReader(
        f"{featdir}/feats.scp",
        f"{featdir}/cmvn.scp",
        f"{featdir}/utt2spk",
        context_width,
        max_length,
    )


def _base_cfg(tmp_path, **nnet_overrides) -> ConfigParser:
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    nnet = {
        "name": "heldout",
        "context_width": "0",
        "add_layer_period": "0",
        "starting_step": "0",
        "nonlin": "relu",
        "l2_norm": "False",
        "dropout": "1",
        "batch_norm": "False",
        "learning_rate_decay": "1",
        "numutterances_per_minibatch": "-1",
        "valid_batches": "0",
        "valid_frequency": "1000",
        "valid_adapt": "False",
        "valid_retries": "0",
        "check_freq": "1000",
        "visualise": "False",
    }
    nnet.update({k: str(v) for k, v in nnet_overrides.items()})
    cfg["nnet"] = nnet
    return cfg


def _letters(tokens) -> list[str]:
    """Keep only the single-letter class tokens (drops <sos>/<eos>/<space>
    framing so greedy/beam/teacher-forced outputs score identically)."""
    return [t for t in tokens if len(t) == 1 and "a" <= t <= "z"]


def _corpus_cer(hyp_file: str, ref_texts: dict[str, str]) -> float:
    errors = total = 0
    seen = set()
    with open(hyp_file) as f:
        for line in f:
            utt, _, hyp = line.rstrip("\n").partition(" ")
            assert utt in ref_texts, f"decoded unknown utterance {utt!r}"
            seen.add(utt)
            ref = list(ref_texts[utt])
            hyp_tokens = _letters(hyp.split(" "))
            subs, ins, dels, _ = edit_distance(ref, hyp_tokens)
            errors += subs + ins + dels
            total += len(ref)
    assert seen == set(ref_texts), "decode must cover the whole held-out set"
    return errors / max(total, 1)


def test_heldout_hybrid_framewise_accuracy(tmp_path):
    """Hybrid CE path generalizes: framewise state accuracy on unseen
    speakers well above the 20% chance level."""
    train_dir, test_dir, info = make_class_signature_corpus(tmp_path, seed=11)
    num_labels = info["num_classes"]

    cfg = _base_cfg(
        tmp_path,
        context_width=CONTEXT_WIDTH,
        num_hidden_units=64,
        num_hidden_layers=2,
        num_epochs=8,
        initial_learning_rate=0.01,
        batch_size=8,
    )
    coder = AlignmentCoder(identity_normalizer, num_labels)
    dispenser = AlignmentBatchDispenser(
        _reader(train_dir, info["train"]["max_length"], CONTEXT_WIDTH),
        coder,
        8,
        info["train"]["alifile"],
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=num_labels)
    net.train(dispenser)

    # decode the held-out split: log(post/prior) ark, the exact artifact
    # Kaldi's latgen-faster-mapped would consume (nnet.py:246-289)
    from tfkaldi_tpu.io import ArkReader, ArkWriter

    out_scp = str(tmp_path / "likes.scp")
    writer = ArkWriter(out_scp, str(tmp_path / "likes.ark"))
    n = net.decode(_reader(test_dir, info["test"]["max_length"], CONTEXT_WIDTH), writer)
    assert n == len(info["test"]["alignments"])

    prior = np.load(os.path.join(net.savedir, "prior.npy"))
    reader = ArkReader(out_scp)
    correct = total = 0
    for utt, truth in info["test"]["alignments"].items():
        log_likes = reader.read_utt(utt)
        assert log_likes.shape == (len(truth), num_labels)
        # posterior argmax = argmax(log_likes + log prior)
        pred = np.argmax(log_likes + np.log(prior)[None, :], axis=1)
        correct += int(np.sum(pred == truth))
        total += len(truth)
    acc = correct / total
    assert acc >= 0.85, f"held-out framewise accuracy {acc:.3f} < 0.85"


def test_heldout_ctc_cer_greedy_and_beam(tmp_path):
    """Character CTC generalizes: held-out CER under 15% for both greedy
    and prefix-beam decoding (chance ~ 100%)."""
    train_dir, test_dir, info = make_class_signature_corpus(tmp_path, seed=22)

    cfg = _base_cfg(
        tmp_path,
        loss="ctc",
        model="lstm",
        bidirectional="True",
        num_hidden_units=64,
        num_hidden_layers=1,
        num_epochs=60,
        initial_learning_rate=0.02,
        batch_size=16,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_greedy.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.15, f"held-out greedy CER {cer:.3f} > 0.15"

    # beam search over the same trained model (same facade, beam_width>1)
    cfg["nnet"]["beam_width"] = "4"
    net_beam = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    hyp_beam = str(tmp_path / "decoded_beam.txt")
    net_beam.decode_text(
        _reader(test_dir, info["test"]["max_length"]), coder, hyp_beam
    )
    cer_beam = _corpus_cer(hyp_beam, info["test"]["texts"])
    assert cer_beam <= 0.15, f"held-out beam CER {cer_beam:.3f} > 0.15"


def test_heldout_rnnt_cer(tmp_path):
    """RNN-T generalizes: held-out CER under 22% with the greedy
    transducer search (measured headroom: ~15% CER; speaker diversity is
    the generalization axis, so this corpus uses 8 train speakers)."""
    train_dir, test_dir, info = make_class_signature_corpus(
        tmp_path, seed=33, train_speakers=8, test_speakers=3, utts_per_speaker=12
    )

    cfg = _base_cfg(
        tmp_path,
        loss="rnnt",
        model="transducer",
        enc_type="lstm",
        num_hidden_units=64,
        num_hidden_layers=1,
        pred_layers=1,
        pred_units=32,
        embed_dim=16,
        joint_units=32,
        num_epochs=60,
        initial_learning_rate=0.02,
        batch_size=16,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_rnnt.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.22, f"held-out RNN-T CER {cer:.3f} > 0.22"


def test_heldout_attention_cer(tmp_path):
    """Attention seq2seq generalizes: held-out CER under 22% with the
    autoregressive beam search."""
    train_dir, test_dir, info = make_class_signature_corpus(
        tmp_path, seed=44, train_speakers=8, test_speakers=3, utts_per_speaker=12
    )

    cfg = _base_cfg(
        tmp_path,
        loss="attention",
        model="seq2seq",
        enc_type="lstm",
        bidirectional="True",
        num_hidden_units=48,
        num_hidden_layers=1,
        dec_blocks=1,
        d_model=32,
        num_heads=2,
        ffn_dim=64,
        num_epochs=40,
        initial_learning_rate=0.01,
        batch_size=16,
        beam_width=4,
        max_decode_tokens=12,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_attn.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.22, f"held-out attention CER {cer:.3f} > 0.22"


# ---------------------------------------------------------------------------
# Conformer-s4 gates: the FLAGSHIP production recipes. The shipped configs
# (config/config_AURORA4_{transducer,attention}.cfg, and the conformer CTC
# family the batch-scaling docs tune) are subsample-4 conformer encoders;
# these gates train that exact structure — causal left-context attention +
# causal conv + subsample=4 for the streaming recipes, offline conformer +
# rescoring decode for attention — through the production Nnet facade and
# hold the disjoint-speaker held-out split under a CER threshold, so the
# recipe family the framework tells users to run fails CI if it stops
# generalizing. Reference end goal: /root/reference/main.py:160-198.
# ---------------------------------------------------------------------------

#: the production encoder structure at test scale: conformer blocks with
#: subsample = 4, causal conv and left-context-only attention (the exact
#: streaming shape of config_AURORA4_transducer.cfg)
_CONFORMER_S4 = dict(
    enc_type="conformer",
    num_blocks=2,
    d_model=24,
    num_heads=2,
    ffn_dim=48,
    conv_kernel=3,
    subsample=4,
    attention_left_context=8,
    attention_right_context=0,
    causal_conv="True",
)

#: conformer-s4 corpus: longer per-token bursts so 4x subsampling still
#: leaves >= 2 encoder frames per label (CTC needs T' >= U)
_S4_CORPUS = dict(
    train_speakers=8, test_speakers=3, utts_per_speaker=12,
    frames_min=8, frames_max=14,
)


def test_heldout_conformer_ctc_cer(tmp_path):
    """Streaming conformer-s4 CTC generalizes: held-out CER under 15%
    for greedy and prefix-beam decoding (measured headroom ~3%)."""
    train_dir, test_dir, info = make_class_signature_corpus(
        tmp_path, seed=55, **_S4_CORPUS
    )
    cfg = _base_cfg(
        tmp_path,
        loss="ctc",
        model="conformer",
        **_CONFORMER_S4,
        num_epochs=60,
        initial_learning_rate=0.003,
        batch_size=16,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_conformer_greedy.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.15, f"held-out conformer CTC greedy CER {cer:.3f} > 0.15"

    cfg["nnet"]["beam_width"] = "4"
    net_beam = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    hyp_beam = str(tmp_path / "decoded_conformer_beam.txt")
    net_beam.decode_text(
        _reader(test_dir, info["test"]["max_length"]), coder, hyp_beam
    )
    cer_beam = _corpus_cer(hyp_beam, info["test"]["texts"])
    assert cer_beam <= 0.15, f"held-out conformer CTC beam CER {cer_beam:.3f} > 0.15"


def test_heldout_conformer_transducer_cer(tmp_path):
    """The flagship streaming recipe — causal conformer-s4 RNN-T
    (config_AURORA4_transducer.cfg at test scale) — generalizes:
    held-out CER under 22% (measured headroom ~12%).

    Trains through the PRUNED lattice loss the shipped recipe enables
    (rnnt_prune_s, scaled to the test corpus's label lengths) so the
    gate exercises the exact production loss path, band and all."""
    train_dir, test_dir, info = make_class_signature_corpus(
        tmp_path, seed=66, **_S4_CORPUS
    )
    enc = dict(_CONFORMER_S4, d_model=32, ffn_dim=64)
    cfg = _base_cfg(
        tmp_path,
        loss="rnnt",
        model="transducer",
        **enc,
        pred_layers=1,
        pred_units=32,
        embed_dim=16,
        joint_units=32,
        rnnt_prune_s=4,
        rnnt_prune_band="diagonal",
        num_epochs=100,
        initial_learning_rate=0.003,
        batch_size=16,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_conformer_rnnt.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.22, f"held-out conformer RNN-T CER {cer:.3f} > 0.22"


def test_heldout_conformer_attention_cer(tmp_path):
    """The flagship offline recipe — joint CTC-attention conformer-s4
    with two-pass rescoring decode (config_AURORA4_attention.cfg at test
    scale) — generalizes: held-out CER under 22% (measured headroom ~2%)."""
    train_dir, test_dir, info = make_class_signature_corpus(
        tmp_path, seed=77, **_S4_CORPUS
    )
    # offline attention: full-context conformer (no causal constraints)
    enc = {
        k: v for k, v in _CONFORMER_S4.items()
        if k not in ("attention_left_context", "attention_right_context",
                     "causal_conv")
    }
    cfg = _base_cfg(
        tmp_path,
        loss="attention",
        model="seq2seq",
        **enc,
        dec_blocks=1,
        label_smoothing=0.1,
        ctc_weight=0.3,
        decode_mode="rescoring",
        beam_width=6,
        rescore_weight=0.5,
        max_decode_tokens=12,
        num_epochs=40,
        initial_learning_rate=0.003,
        batch_size=16,
    )
    coder = TextCoder(aurora4_normalizer)
    dispenser = TextBatchDispenser(
        _reader(train_dir, info["train"]["max_length"]),
        coder,
        16,
        f"{train_dir}/text",
    )
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
    net.train(dispenser)

    hyp = str(tmp_path / "decoded_conformer_attn.txt")
    net.decode_text(_reader(test_dir, info["test"]["max_length"]), coder, hyp)
    cer = _corpus_cer(hyp, info["test"]["texts"])
    assert cer <= 0.22, f"held-out conformer attention CER {cer:.3f} > 0.22"
