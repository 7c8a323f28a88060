"""Synthetic Kaldi-style corpus fixtures (no Kaldi needed).

Builds a tiny featdir + alignment archive the way the reference pipeline
would find them on disk (the seam described in SURVEY §4: the files
main.py reads are the natural fake-Kaldi boundary).
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from tfkaldi_tpu.frontend import cmvn as cmvn_mod
from tfkaldi_tpu.io import ArkWriter


def make_featdir(
    tmp_path,
    num_speakers: int = 2,
    utts_per_speaker: int = 6,
    feat_dim: int = 8,
    num_labels: int = 10,
    min_frames: int = 20,
    max_frames: int = 60,
    seed: int = 0,
    learnable: bool = False,
):
    """Create feats.ark/scp, cmvn.ark/scp, utt2spk, spk2utt, maxlength and a
    gzipped pdf alignment archive. Returns (featdir, alifile, info dict).

    ``learnable=True`` derives each frame's pdf label from a fixed random
    linear map of its features (instead of uniform noise), so a trained
    model's validation loss reliably decreases — used by tests that need
    monotone validation improvement rather than chance-level wobble."""
    rng = np.random.default_rng(seed)
    featdir = str(tmp_path / "featdir")
    os.makedirs(featdir, exist_ok=True)

    label_map = rng.standard_normal((feat_dim, num_labels)) if learnable else None

    utts: dict[str, np.ndarray] = {}
    utt2spk: dict[str, str] = {}
    alignments: dict[str, np.ndarray] = {}
    for s in range(num_speakers):
        spk = f"spk{s}"
        for u in range(utts_per_speaker):
            utt = f"{spk}_utt{u}"
            t = int(rng.integers(min_frames, max_frames + 1))
            utts[utt] = (rng.standard_normal((t, feat_dim)) * 2 + s).astype(np.float32)
            utt2spk[utt] = spk
            if learnable:
                alignments[utt] = np.argmax(utts[utt] @ label_map, axis=1).astype(np.int32)
            else:
                alignments[utt] = rng.integers(0, num_labels, size=t).astype(np.int32)

    with ArkWriter(f"{featdir}/feats.scp", f"{featdir}/feats.ark") as w:
        for utt, mat in utts.items():
            w.write_next_utt(utt, mat)

    with ArkWriter(f"{featdir}/cmvn.scp", f"{featdir}/cmvn.ark") as w:
        for s in range(num_speakers):
            spk = f"spk{s}"
            spk_feats = np.concatenate(
                [m for u, m in utts.items() if utt2spk[u] == spk], axis=0
            )
            w.write_next_utt(spk, cmvn_stats_f32(spk_feats))

    with open(f"{featdir}/utt2spk", "w") as f:
        for utt, spk in utt2spk.items():
            f.write(f"{utt} {spk}\n")
    with open(f"{featdir}/spk2utt", "w") as f:
        for s in range(num_speakers):
            spk = f"spk{s}"
            members = " ".join(u for u in utts if utt2spk[u] == spk)
            f.write(f"{spk} {members}\n")
    with open(f"{featdir}/maxlength", "w") as f:
        f.write(str(max(m.shape[0] for m in utts.values())))

    alifile = str(tmp_path / "pdf.all.gz")
    with gzip.open(alifile, "wt") as f:
        for utt, ali in alignments.items():
            f.write(utt + " " + " ".join(str(int(x)) for x in ali) + "\n")

    info = {
        "utts": utts,
        "utt2spk": utt2spk,
        "alignments": alignments,
        "num_labels": num_labels,
        "feat_dim": feat_dim,
    }
    return featdir, alifile, info


def cmvn_stats_f32(feats: np.ndarray) -> np.ndarray:
    return cmvn_mod.cmvn_stats(feats).astype(np.float32)


def make_class_signature_corpus(
    tmp_path,
    num_classes: int = 5,
    feat_dim: int = 16,
    train_speakers: int = 4,
    test_speakers: int = 2,
    utts_per_speaker: int = 12,
    tokens_min: int = 2,
    tokens_max: int = 5,
    frames_min: int = 4,
    frames_max: int = 8,
    signature_scale: float = 3.0,
    speaker_scale: float = 1.0,
    noise: float = 0.5,
    seed: int = 0,
):
    """Deterministic held-out-evaluation corpus: distinct spectral
    signatures per label class, disjoint train/test speakers.

    Each of ``num_classes`` classes (letters ``a``, ``b``, …) owns one
    orthogonal direction in feature space (norm ``signature_scale``); an
    utterance is a random letter sequence, each letter emitting
    ``frames_min..frames_max`` frames of its signature plus a constant
    per-speaker offset (``speaker_scale``) plus white noise (``noise``).
    Test speakers are disjoint from train speakers (fresh offsets), so a
    model that merely memorizes training utterances scores at chance on
    the test half — per-speaker CMVN plus the learned class mapping is
    what generalizes. This is the in-sandbox stand-in for the reference's
    held-out WER evaluation (main.py:160-198).

    Writes two complete featdirs (feats/cmvn/utt2spk/spk2utt/maxlength/
    text + a per-frame class alignment archive for the hybrid path) and
    returns ``(train_featdir, test_featdir, info)`` where ``info`` maps
    each split to its ``{utt: letters}`` texts and ``{utt: frame labels}``
    alignments.
    """
    assert num_classes <= min(feat_dim, 26)
    rng = np.random.default_rng(seed)
    # orthonormal class directions via QR, scaled
    basis, _ = np.linalg.qr(rng.standard_normal((feat_dim, feat_dim)))
    signatures = basis[:, :num_classes].T * signature_scale  # [C, F]
    letters = [chr(ord("a") + c) for c in range(num_classes)]

    info: dict[str, dict] = {"num_classes": num_classes, "feat_dim": feat_dim}
    out_dirs = []
    spk_counter = 0
    for split, n_spk in (("train", train_speakers), ("test", test_speakers)):
        featdir = str(tmp_path / f"{split}_featdir")
        os.makedirs(featdir, exist_ok=True)
        utts: dict[str, np.ndarray] = {}
        utt2spk: dict[str, str] = {}
        texts: dict[str, str] = {}
        alignments: dict[str, np.ndarray] = {}
        speakers = []
        for _ in range(n_spk):
            spk = f"spk{spk_counter}"
            spk_counter += 1
            speakers.append(spk)
            offset = rng.standard_normal(feat_dim) * speaker_scale
            for u in range(utts_per_speaker):
                utt = f"{spk}_utt{u}"
                n_tok = int(rng.integers(tokens_min, tokens_max + 1))
                # no immediate repeats: adjacent identical letters are
                # indistinguishable without an inter-token gap (CTC would
                # structurally merge "aa" -> "a"; real corpora have
                # coarticulation boundaries doing this job)
                toks = []
                for _ in range(n_tok):
                    t = int(rng.integers(0, num_classes))
                    while toks and t == toks[-1]:
                        t = int(rng.integers(0, num_classes))
                    toks.append(t)
                frames, labels = [], []
                for tok in toks:
                    reps = int(rng.integers(frames_min, frames_max + 1))
                    block = (
                        signatures[tok][None, :]
                        + offset[None, :]
                        + rng.standard_normal((reps, feat_dim)) * noise
                    )
                    frames.append(block)
                    labels.extend([int(tok)] * reps)
                utts[utt] = np.concatenate(frames, axis=0).astype(np.float32)
                utt2spk[utt] = spk
                texts[utt] = "".join(letters[int(t)] for t in toks)
                alignments[utt] = np.asarray(labels, np.int32)

        with ArkWriter(f"{featdir}/feats.scp", f"{featdir}/feats.ark") as w:
            for utt, mat in utts.items():
                w.write_next_utt(utt, mat)
        with ArkWriter(f"{featdir}/cmvn.scp", f"{featdir}/cmvn.ark") as w:
            for spk in speakers:
                spk_feats = np.concatenate(
                    [m for u, m in utts.items() if utt2spk[u] == spk], axis=0
                )
                w.write_next_utt(spk, cmvn_stats_f32(spk_feats))
        with open(f"{featdir}/utt2spk", "w") as f:
            for utt, spk in utt2spk.items():
                f.write(f"{utt} {spk}\n")
        with open(f"{featdir}/spk2utt", "w") as f:
            for spk in speakers:
                members = " ".join(u for u in utts if utt2spk[u] == spk)
                f.write(f"{spk} {members}\n")
        with open(f"{featdir}/maxlength", "w") as f:
            f.write(str(max(m.shape[0] for m in utts.values())))
        with open(f"{featdir}/text", "w") as f:
            for utt, txt in texts.items():
                f.write(f"{utt} {txt}\n")
        alifile = f"{featdir}/pdf.all.gz"
        with gzip.open(alifile, "wt") as f:
            for utt, ali in alignments.items():
                f.write(utt + " " + " ".join(str(int(x)) for x in ali) + "\n")

        info[split] = {
            "featdir": featdir,
            "texts": texts,
            "alignments": alignments,
            "alifile": alifile,
            "max_length": max(m.shape[0] for m in utts.values()),
        }
        out_dirs.append(featdir)

    return out_dirs[0], out_dirs[1], info
