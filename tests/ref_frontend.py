"""Float64 numpy re-derivation of the reference feature semantics.

DEMOTED TO CROSS-CHECK (round 2): the parity/fuzz suites now run against
``tests/reference_port`` — a mechanical Python-3 port of the actual
reference code — so a shared misreading cannot pass silently. This module
remains as an independent second derivation; ``tests/test_oracle_crosscheck``
fuzzes it against the port to keep both honest.
"""

import math

import numpy as np
from scipy.fftpack import dct
from scipy.ndimage import convolve1d


def ref_preemphasis(signal, coeff):
    return np.append(signal[0], signal[1:] - coeff * np.asarray(signal[:-1], dtype=np.float64))


def ref_framesig(sig, frame_len, frame_step):
    slen = len(sig)
    frame_len_i = int(round(frame_len))
    frame_step_i = int(round(frame_step))
    if slen <= frame_len_i:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len_i) / frame_step_i))
    padlen = int((numframes - 1) * frame_step_i + frame_len_i)
    padsignal = np.concatenate((np.asarray(sig, dtype=np.float64), np.zeros(padlen - slen)))
    indices = (
        np.tile(np.arange(0, frame_len_i), (numframes, 1))
        + np.tile(np.arange(0, numframes * frame_step_i, frame_step_i), (frame_len_i, 1)).T
    )
    return padsignal[indices.astype(np.int32)]  # rectangular window


def ref_powspec(frames, nfft):
    return 1.0 / nfft * np.square(np.absolute(np.fft.rfft(frames, nfft)))


def ref_snip(sig, rate, winlen, winstep):
    num_frames = int((len(sig) - winlen * rate) / (winstep * rate))
    return sig[0 : int(num_frames * winstep * rate + winlen * rate)]


def _ref_mel_fb(nfilt, nfft, samplerate, lowfreq, highfreq):
    def hz2mel(hz):
        return 2595 * np.log10(1 + hz / 700.0)

    def mel2hz(mel):
        return 700 * (10 ** (mel / 2595.0) - 1)

    highfreq = highfreq or samplerate / 2
    melpoints = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(nfilt):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank


def ref_fbank(signal, samplerate, conf):
    highfreq = int(conf["highfreq"])
    if highfreq < 0:
        highfreq = samplerate / 2
    signal = ref_preemphasis(signal, float(conf["preemph"]))
    frames = ref_framesig(
        signal, float(conf["winlen"]) * samplerate, float(conf["winstep"]) * samplerate
    )
    pspec = ref_powspec(frames, int(conf["nfft"]))
    energy = np.sum(pspec, 1)
    energy = np.where(energy == 0, np.finfo(float).eps, energy)
    fb = _ref_mel_fb(int(conf["nfilt"]), int(conf["nfft"]), samplerate, int(conf["lowfreq"]), highfreq)
    feat = np.dot(pspec, fb.T)
    feat = np.where(feat == 0, np.finfo(float).eps, feat)
    return feat, energy


def ref_logfbank(signal, samplerate, conf):
    feat, energy = ref_fbank(signal, samplerate, conf)
    return np.log(feat), np.log(energy)


def _ref_lifter(cepstra, liftering):
    if liftering > 0:
        ncoeff = cepstra.shape[1]
        lift = 1 + (liftering / 2) * np.sin(np.pi * np.arange(ncoeff) / liftering)
        return lift * cepstra
    return cepstra


def ref_mfcc(signal, samplerate, conf):
    feat, energy = ref_fbank(signal, samplerate, conf)
    feat = np.log(feat)
    feat = dct(feat, type=2, axis=1, norm="ortho")[:, : int(conf["numcep"])]
    feat = _ref_lifter(feat, float(conf["ceplifter"]))
    return feat, np.log(energy)


def ref_ssc(signal, samplerate, conf):
    highfreq = int(conf["highfreq"])
    if highfreq < 0:
        highfreq = samplerate / 2
    signal = ref_preemphasis(signal, float(conf["preemph"]))
    frames = ref_framesig(
        signal, float(conf["winlen"]) * samplerate, float(conf["winstep"]) * samplerate
    )
    pspec = ref_powspec(frames, int(conf["nfft"]))
    energy = np.sum(pspec, 1)
    energy = np.where(energy == 0, np.finfo(float).eps, energy)
    fb = _ref_mel_fb(int(conf["nfilt"]), int(conf["nfft"]), samplerate, int(conf["lowfreq"]), highfreq)
    feat = np.dot(pspec, fb.T)
    tiles = np.tile(np.linspace(1, samplerate / 2, pspec.shape[1]), (pspec.shape[0], 1))
    return np.dot(pspec * tiles, fb.T) / feat, np.log(energy)


def ref_deriv(features):
    return convolve1d(features, [2, 1, 0, -1, -2], 0)


def ref_compute(sig, rate, conf):
    """Full FeatureComputer.__call__ equivalent (reference feat.py:42-69)."""
    ftype = conf["type"]
    if conf["snip_edges"] == "True":
        sig = ref_snip(sig, rate, float(conf["winlen"]), float(conf["winstep"]))
    fn = {"fbank": ref_logfbank, "mfcc": ref_mfcc, "ssc": ref_ssc}[ftype]
    feat, energy = fn(np.asarray(sig, dtype=np.float64), rate, conf)
    if conf["include_energy"] == "True":
        feat = np.append(feat, energy[:, np.newaxis], 1)
    if conf["dynamic"] == "delta":
        feat = np.concatenate((feat, ref_deriv(feat)), 1)
    elif conf["dynamic"] == "ddelta":
        d = ref_deriv(feat)
        feat = np.concatenate((feat, d, ref_deriv(d)), 1)
    return feat


def ref_apply_cmvn(utt, stats):
    mean = stats[0, :-1] / stats[0, -1]
    variance = stats[1, :-1] / stats[0, -1] - np.square(mean)
    return np.divide(np.subtract(utt, mean), np.sqrt(variance))


def ref_splice(utt, context_width):
    if utt.shape[0] < 1 + 2 * context_width:
        return None
    T, F = utt.shape
    out = np.zeros([T, F * (1 + 2 * context_width)], dtype=np.float32)
    out[:, context_width * F : (context_width + 1) * F] = utt
    for i in range(context_width):
        out[i + 1 :, (context_width - i - 1) * F : (context_width - i) * F] = utt[: T - i - 1, :]
        out[: T - i - 1, (context_width + i + 1) * F : (context_width + i + 2) * F] = utt[i + 1 :, :]
    return out
