"""Per-speaker CMVN statistics, normalization, and context splicing.

Equivalents of the reference's ``compute_cmvn`` (prepare_data.py:82-122)
and ``apply_cmvn``/``splice`` (feature_reader.py:91-156), as pure jnp ops
usable inside jitted pipelines.

The stats layout is Kaldi's: a ``[2, dim+1]`` matrix per speaker where
``stats[0, :dim] = Σx``, ``stats[0, dim] = frame count``,
``stats[1, :dim] = Σx²``, ``stats[1, dim] = 0``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cmvn_stats(feats, num_frames=None) -> np.ndarray:
    """Accumulate CMVN stats over one speaker's frames.

    Args:
        feats: ``[T, D]`` matrix, or ``[B, T, D]`` padded batch (in which
            case padding frames must be zeroed — they then contribute
            nothing to the sums) with ``num_frames`` giving real counts.

    Returns:
        ``[2, D+1]`` float64 stats matrix (prepare_data.py:113-118 layout).
    """
    feats = np.asarray(feats, dtype=np.float64)
    if feats.ndim == 2:
        total = feats.shape[0]
        s1 = feats.sum(0)
        s2 = np.square(feats).sum(0)
    else:
        total = int(np.sum(num_frames))
        s1 = feats.sum((0, 1))
        s2 = np.square(feats).sum((0, 1))
    dim = s1.shape[0]
    stats = np.zeros((2, dim + 1))
    stats[0, :dim] = s1
    stats[1, :dim] = s2
    stats[0, dim] = total
    return stats


def apply_cmvn(utt, stats):
    """Mean/variance-normalize with precomputed speaker stats
    (feature_reader.py:91-115): ``(x - mean) / sqrt(E[x²] - mean²)``."""
    stats = jnp.asarray(stats)
    count = stats[0, -1]
    mean = stats[0, :-1] / count
    variance = stats[1, :-1] / count - jnp.square(mean)
    return (utt - mean) / jnp.sqrt(variance)


def splice(utt, context_width: int):
    """Concatenate ±``context_width`` neighbor frames onto each frame.

    ``[T, D] → [T, D*(2c+1)]`` with zero padding at the edges, matching
    feature_reader.py:117-156. Works on ``[T, D]`` or batched ``[B, T, D]``
    inputs (splicing is per-frame so batch padding rows stay zero, except
    for context bleeding from real neighbor frames — callers mask rows
    beyond ``num_frames`` downstream, as training losses do).

    The reference returns None for utterances shorter than ``2c+1`` frames
    (feature_reader.py:131-133); that policy lives in the data layer, not
    here (static shapes).
    """
    c = int(context_width)
    if c == 0:
        return utt
    utt = jnp.asarray(utt)
    time_axis = utt.ndim - 2
    pad = [(0, 0)] * utt.ndim
    pad[time_axis] = (c, c)
    padded = jnp.pad(utt, pad)
    t = utt.shape[time_axis]
    # offset o ∈ [0, 2c]: column block o holds frames shifted by (o - c)
    pieces = []
    for o in range(2 * c + 1):
        sl = [slice(None)] * utt.ndim
        sl[time_axis] = slice(o, o + t)
        pieces.append(padded[tuple(sl)])
    return jnp.concatenate(pieces, axis=-1)
