"""TEST-ONLY ORACLE: mechanical Python-3 port of
/root/reference/processing/sigproc.py (vendored python_speech_features).

The MIT License (MIT) — Copyright (c) 2013 James Lyons. Permission is hereby
granted, free of charge, to any person obtaining a copy of this software and
associated documentation files (the "Software"), to deal in the Software
without restriction [...] THE SOFTWARE IS PROVIDED "AS IS". (Full text in the
reference file, sigproc.py:4-27.)

Port changes: none beyond this header — the module body is already valid
Python 3 (integer truncation via int()/round() is unchanged between 2 and 3
for these call sites; `round` returns float in Py2 and int in Py3, but every
use is wrapped in int() or used as an index-safe integer).
"""

import math

import numpy


def framesig(sig, frame_len, frame_step, winfunc=lambda x: numpy.ones((x,))):
    """Frame a signal into overlapping frames (reference sigproc.py:33-68).
    Default window is rectangular."""

    slen = len(sig)
    frame_len = int(round(frame_len))
    frame_step = int(round(frame_step))
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0*slen - frame_len)/frame_step))

    padlen = int((numframes-1)*frame_step + frame_len)

    zeros = numpy.zeros((padlen - slen,))
    padsignal = numpy.concatenate((sig, zeros))

    indices = (numpy.tile(numpy.arange(0, frame_len), (numframes, 1))
               + numpy.tile(numpy.arange(0, numframes*frame_step, frame_step),
                            (frame_len, 1)).T)
    indices = numpy.array(indices, dtype=numpy.int32)
    frames = padsignal[indices]
    win = numpy.tile(winfunc(frame_len), (numframes, 1))
    return frames*win


def deframesig(frames, siglen, frame_len, frame_step,
               winfunc=lambda x: numpy.ones((x,))):
    """Overlap-add inverse of framesig (reference sigproc.py:70-117)."""

    frame_len = round(frame_len)
    frame_step = round(frame_step)
    numframes = numpy.shape(frames)[0]
    assert numpy.shape(frames)[1] == frame_len, '''"frames" matrix is wrong
        size, 2nd dim is not equal to frame_len'''

    indices = (numpy.tile(numpy.arange(0, frame_len), (numframes, 1))
               + numpy.tile(numpy.arange(0, numframes*frame_step, frame_step),
                            (frame_len, 1)).T)

    indices = numpy.array(indices, dtype=numpy.int32)
    padlen = (numframes-1)*frame_step + frame_len

    if siglen <= 0:
        siglen = padlen

    rec_signal = numpy.zeros((padlen,))
    window_correction = numpy.zeros((padlen,))
    win = winfunc(frame_len)

    for i in range(0, numframes):
        # add a little bit so it is never zero
        window_correction[indices[i, :]] = (window_correction[indices[i, :]]
                                            + win + 1e-15)

        rec_signal[indices[i, :]] = rec_signal[indices[i, :]] + frames[i, :]

    rec_signal = rec_signal/window_correction
    return rec_signal[0:siglen]


def magspec(frames, nfft):
    """|rfft| magnitude spectrum (reference sigproc.py:119-136)."""

    complex_spec = numpy.fft.rfft(frames, nfft)
    return numpy.absolute(complex_spec)


def powspec(frames, nfft):
    """Power spectrum (reference sigproc.py:138-153)."""
    return 1.0/nfft * numpy.square(magspec(frames, nfft))


def logpowspec(frames, nfft, norm=1):
    """Log power spectrum (reference sigproc.py:155-178)."""
    ps = powspec(frames, nfft)
    ps[ps <= 1e-30] = 1e-30
    lps = 10*numpy.log10(ps)
    if norm:
        return lps - numpy.max(lps)
    else:
        return lps


def preemphasis(signal, coeff=0.95):
    """y[n] = x[n] - coeff*x[n-1] (reference sigproc.py:180-191)."""
    return numpy.append(signal[0], signal[1:]-coeff*signal[:-1])
