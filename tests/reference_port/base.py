"""TEST-ONLY ORACLE: mechanical Python-3 port of
/root/reference/processing/base.py (vendored python_speech_features).

The MIT License (MIT) — Copyright (c) 2013 James Lyons (full text in the
reference file, base.py:5-24).

Port changes (each marked # PY3):
- `import sigproc` -> package-relative import
- `xrange` -> `range` (base.py:218-221)
- integer division: the reference runs under Python 2 where `int / int`
  floors — `samplerate/2` (base.py:76,134,151,205) and `nfft/2+1`
  (base.py:217) are ported as `//` to preserve that semantic exactly
  (samplerate is always an int from scipy.io.wavfile).
"""

import numpy
from scipy.fftpack import dct
from scipy.ndimage import convolve1d

from tests.reference_port import sigproc  # PY3: was `import sigproc`


def mfcc(signal, samplerate, conf):
    """MFCC features (reference base.py:37-57)."""

    feat, energy = fbank(signal, samplerate, conf)
    feat = numpy.log(feat)
    feat = dct(feat, type=2, axis=1, norm='ortho')[:, :int(conf['numcep'])]
    feat = lifter(feat, float(conf['ceplifter']))
    return feat, numpy.log(energy)


def fbank(signal, samplerate, conf):
    """Mel filterbank features + per-frame energy (reference base.py:59-98)."""

    highfreq = int(conf['highfreq'])
    if highfreq < 0:
        highfreq = samplerate//2  # PY3: Py2 int division

    signal = sigproc.preemphasis(signal, float(conf['preemph']))
    frames = sigproc.framesig(signal, float(conf['winlen'])*samplerate,
                              float(conf['winstep'])*samplerate)
    pspec = sigproc.powspec(frames, int(conf['nfft']))

    # this stores the total energy in each frame
    energy = numpy.sum(pspec, 1)

    # if energy is zero, we get problems with log
    energy = numpy.where(energy == 0, numpy.finfo(float).eps, energy)

    filterbank = get_filterbanks(int(conf['nfilt']), int(conf['nfft']),
                                 samplerate, int(conf['lowfreq']), highfreq)

    # compute the filterbank energies
    feat = numpy.dot(pspec, filterbank.T)

    # if feat is zero, we get problems with log
    feat = numpy.where(feat == 0, numpy.finfo(float).eps, feat)

    return feat, energy


def logfbank(signal, samplerate, conf):
    """Log mel filterbank features (reference base.py:100-115)."""
    feat, energy = fbank(signal, samplerate, conf)
    return numpy.log(feat), numpy.log(energy)


def ssc(signal, samplerate, conf):
    """Spectral subband centroid features (reference base.py:117-154)."""

    highfreq = int(conf['highfreq'])
    if highfreq < 0:
        highfreq = samplerate//2  # PY3: Py2 int division
    signal = sigproc.preemphasis(signal, float(conf['preemph']))
    frames = sigproc.framesig(signal, float(conf['winlen'])*samplerate,
                              float(conf['winstep'])*samplerate)
    pspec = sigproc.powspec(frames, int(conf['nfft']))

    # this stores the total energy in each frame
    energy = numpy.sum(pspec, 1)

    # if energy is zero, we get problems with log
    energy = numpy.where(energy == 0, numpy.finfo(float).eps, energy)

    filterbank = get_filterbanks(int(conf['nfilt']), int(conf['nfft']),
                                 samplerate, int(conf['lowfreq']), highfreq)

    # compute the filterbank energies
    feat = numpy.dot(pspec, filterbank.T)
    tiles = numpy.tile(numpy.linspace(1, samplerate//2, numpy.size(pspec, 1)),  # PY3: Py2 int division
                       (numpy.size(pspec, 0), 1))

    return numpy.dot(pspec*tiles, filterbank.T) / feat, numpy.log(energy)


def hz2mel(rate):
    """Hz -> Mel (reference base.py:156-168)."""
    return 2595 * numpy.log10(1+rate/700.0)


def mel2hz(mel):
    """Mel -> Hz (reference base.py:170-182)."""
    return 700*(10**(mel/2595.0)-1)


def get_filterbanks(nfilt=20, nfft=512, samplerate=16000, lowfreq=0,
                    highfreq=None):
    """Triangular mel filterbank on fft bins (reference base.py:184-223)."""

    highfreq = highfreq or samplerate//2  # PY3: Py2 int division
    assert highfreq <= samplerate/2, "highfreq is greater than samplerate/2"

    # compute points evenly spaced in mels
    lowmel = hz2mel(lowfreq)
    highmel = hz2mel(highfreq)
    melpoints = numpy.linspace(lowmel, highmel, nfilt+2)

    # our points are in Hz, but we use fft bins, so we have to convert
    #  from Hz to fft bin number
    bins = numpy.floor((nfft+1)*mel2hz(melpoints)/samplerate)

    fbanks = numpy.zeros([nfilt, nfft//2+1])  # PY3: Py2 int division
    for j in range(0, nfilt):  # PY3: was xrange
        for i in range(int(bins[j]), int(bins[j+1])):  # PY3: was xrange
            fbanks[j, i] = (i - bins[j])/(bins[j+1]-bins[j])
        for i in range(int(bins[j+1]), int(bins[j+2])):  # PY3: was xrange
            fbanks[j, i] = (bins[j+2]-i)/(bins[j+2]-bins[j+1])
    return fbanks


def lifter(cepstra, liftering=22):
    """Cepstral lifter (reference base.py:225-247). `liftering` always
    arrives as float(conf['ceplifter']) so `/2` divides identically in
    Python 2 and 3."""
    if liftering > 0:
        _, ncoeff = numpy.shape(cepstra)
        lift = 1+(liftering/2)*numpy.sin(numpy.pi
                                         * numpy.arange(ncoeff)/liftering)
        return lift*cepstra
    else:
        # values of liftering <= 0, do nothing
        return cepstra


def deriv(features):
    """First-order derivative via convolution (reference base.py:249-259)."""
    return convolve1d(features, [2, 1, 0, -1, -2], 0)


def delta(features):
    """Concat first-order derivative (reference base.py:261-271)."""
    return numpy.concatenate((features, deriv(features)), 1)


def ddelta(features):
    """Concat first- and second-order derivatives (reference base.py:273-284)."""
    deltafeat = deriv(features)
    return numpy.concatenate((features, deltafeat, deriv(deltafeat)), 1)
