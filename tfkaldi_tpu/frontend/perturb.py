"""Speed-perturbation data augmentation (the classic Kaldi 3-way recipe).

The reference has no data augmentation at all; this implements the
standard ``sp0.9 / 1.0 / 1.1`` corpus expansion (the semantics of Kaldi's
``utils/data/perturb_data_dir_speed.sh`` + sox ``speed f``) directly at
feature-preparation time: each utterance's raw signal is resampled by
factor ``f`` (duration scales by ``1/f``), features are computed on the
resampled signal through the same batched TPU extractor, and the
featdir's ``utt2spk``/``spk2utt``/``text`` metadata are expanded with
``sp{f}-``-prefixed utterance and speaker ids. Factor ``1.0`` keeps the
original ids, so unperturbed keys keep matching any externally produced
artifacts (alignments, segments) exactly.

Because the expansion happens on the *featdir* side and the GMM stages
run over the featdir, Kaldi alignment of the perturbed corpus produces
alignments under the same prefixed keys — the hybrid CE path trains on
the 3-way data with no further plumbing. The text-target losses
(CTC/RNN-T/attention) only need the expanded ``text``, written here.

Enable with ``speed_perturb = 0.9,1.0,1.1`` in a features config section.
"""

from __future__ import annotations

import numpy as np


def parse_factors(spec: str) -> tuple[float, ...]:
    """Parse a ``speed_perturb`` config value ("0.9,1.0,1.1") into factors.

    Duplicates are rejected (two copies of the same factor would collide
    on utterance ids); factors must be positive.
    """
    factors: list[float] = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        f = float(tok)
        if f <= 0:
            raise ValueError(f"speed_perturb factor must be > 0, got {tok!r}")
        if any(abs(f - g) < 1e-12 for g in factors):
            raise ValueError(f"duplicate speed_perturb factor {tok!r}")
        factors.append(f)
    if not factors:
        raise ValueError(f"speed_perturb spec has no factors: {spec!r}")
    return tuple(factors)


def factor_prefix(factor: float) -> str:
    """Kaldi-convention utterance/speaker id prefix: ``sp0.9-``; empty for 1.0."""
    if factor == 1.0:
        return ""
    return f"sp{factor:g}-"


def resample_signal(sig: np.ndarray, factor: float) -> np.ndarray:
    """Resample a 1-D signal by speed ``factor`` (sox ``speed`` semantics).

    Output sample ``i`` reads input time ``i * factor`` by linear
    interpolation; the new length is ``round(n / factor)`` so duration
    scales by ``1/factor``. Factor 1.0 returns the input unchanged
    (bit-exact identity — the unperturbed copy of a 3-way corpus must be
    byte-identical to a run without perturbation).
    """
    if factor == 1.0:
        return sig
    n = len(sig)
    new_len = max(0, int(round(n / factor)))
    if n == 0 or new_len == 0:
        return sig[:0].astype(np.float32)
    pos = np.arange(new_len, dtype=np.float64) * factor
    # clip: round-up lengths can place the last read epsilon past n-1
    pos = np.minimum(pos, n - 1)
    out = np.interp(pos, np.arange(n, dtype=np.float64), sig.astype(np.float64))
    return out.astype(np.float32)


def expand_metadata(datadir: str, featdir: str, factors: tuple[float, ...]) -> None:
    """Write ``utt2spk``/``spk2utt``/``text`` into ``featdir`` with one
    ``sp{f}-``-prefixed copy of every line per factor.

    Speaker ids are prefixed too (perturbed audio has shifted spectral
    statistics, so CMVN must not pool a speaker's perturbed and clean
    copies — the Kaldi convention). ``spk2utt`` is rebuilt from the
    expanded ``utt2spk`` rather than prefixed line-by-line.
    """
    import os

    u2s_path = os.path.join(datadir, "utt2spk")
    utt2spk: list[tuple[str, str]] = []
    if os.path.isfile(u2s_path):
        with open(u2s_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    utt2spk.append((parts[0], parts[1]))
        expanded = [
            (factor_prefix(f) + utt, factor_prefix(f) + spk)
            for f in factors
            for utt, spk in utt2spk
        ]
        with open(os.path.join(featdir, "utt2spk"), "w") as f:
            for utt, spk in expanded:
                f.write(f"{utt} {spk}\n")
        spk2utt: dict[str, list[str]] = {}
        for utt, spk in expanded:
            spk2utt.setdefault(spk, []).append(utt)
        with open(os.path.join(featdir, "spk2utt"), "w") as f:
            for spk, utts in spk2utt.items():
                f.write(f"{spk} {' '.join(utts)}\n")

    text_path = os.path.join(datadir, "text")
    if os.path.isfile(text_path):
        with open(text_path) as f:
            lines = [line.rstrip("\n") for line in f if line.strip()]
        with open(os.path.join(featdir, "text"), "w") as f:
            for fac in factors:
                pre = factor_prefix(fac)
                for line in lines:
                    utt, _, rest = line.partition(" ")
                    f.write(f"{pre}{utt} {rest}\n")
