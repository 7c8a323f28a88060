"""Precomputed feature-space constants: mel filterbank, DCT basis, lifter.

These are tiny float64 numpy constants computed once at setup and baked
into the jitted feature pipeline as (f32) operands of MXU matmuls.
"""

from __future__ import annotations

import numpy as np


def hz2mel(hz):
    """Hz → mel, ``2595*log10(1+hz/700)`` (reference base.py:156-168)."""
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def mel2hz(mel):
    """mel → Hz, inverse of :func:`hz2mel` (reference base.py:170-182)."""
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    nfilt: int, nfft: int, samplerate: int, lowfreq: float = 0, highfreq: float | None = None
) -> np.ndarray:
    """Triangular mel filterbank, ``[nfilt, nfft//2+1]`` float64.

    Bin edges use the reference's ``floor((nfft+1)*hz/samplerate)`` formula
    (base.py:215) and the triangle is evaluated on *bin indices* against the
    (integer) edge bins — not against continuous frequencies — exactly as
    the reference's double loop does (base.py:217-223). Filters whose rising
    or falling edge collapses to zero width contribute nothing on that side.
    """
    highfreq = highfreq or samplerate / 2
    assert highfreq <= samplerate / 2, "highfreq is greater than samplerate/2"

    melpoints = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)

    nbins = nfft // 2 + 1
    i = np.arange(nbins, dtype=np.float64)[None, :]  # [1, nbins]
    b0 = bins[:-2, None]  # left edge per filter  [nfilt, 1]
    b1 = bins[1:-1, None]  # center
    b2 = bins[2:, None]  # right edge

    with np.errstate(divide="ignore", invalid="ignore"):
        rising = (i - b0) / (b1 - b0)
        falling = (b2 - i) / (b2 - b1)
    fbank = np.where((i >= b0) & (i < b1), rising, 0.0)
    fbank = np.where((i >= b1) & (i < b2), falling, fbank)
    return np.nan_to_num(fbank, nan=0.0, posinf=0.0, neginf=0.0)


def dct_ortho_matrix(n: int, numcep: int) -> np.ndarray:
    """Matrix ``D`` of shape ``[n, numcep]`` such that ``x @ D`` equals
    ``scipy.fftpack.dct(x, type=2, axis=1, norm='ortho')[:, :numcep]``
    (the reference's MFCC transform, base.py:55)."""
    k = np.arange(numcep, dtype=np.float64)[None, :]
    t = np.arange(n, dtype=np.float64)[:, None]
    basis = np.cos(np.pi * k * (2.0 * t + 1.0) / (2.0 * n))
    scale = np.full((1, numcep), np.sqrt(2.0 / n))
    scale[0, 0] = np.sqrt(1.0 / n)
    return basis * scale


def lifter_vector(numcep: int, liftering: float) -> np.ndarray:
    """Cepstral lifter ``1 + (L/2)·sin(pi·k/L)`` (reference base.py:225-247);
    all-ones when ``liftering <= 0``."""
    if liftering > 0:
        return 1.0 + (liftering / 2.0) * np.sin(
            np.pi * np.arange(numcep, dtype=np.float64) / liftering
        )
    return np.ones(numcep, dtype=np.float64)
