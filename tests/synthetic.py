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
