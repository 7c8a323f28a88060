"""ctypes bindings for the native CTC prefix beam search
(native/ctc_beam.cpp). Falls back to the pure-Python implementation in
:mod:`tfkaldi_tpu.decode.ctc_beam` when the toolchain is unavailable."""

from __future__ import annotations

import ctypes

import numpy as np

from tfkaldi_tpu.io.native import NativeLibrary


def _bind(lib) -> None:
    lib.ctc_beam_search.restype = ctypes.c_int32
    lib.ctc_beam_search.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    lib.ctc_beam_search_batch.restype = ctypes.c_int32
    lib.ctc_beam_search_batch.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]


_CTCBEAM = NativeLibrary("libctcbeam.so", "ctc_beam.cpp", _bind)


def available() -> bool:
    return _CTCBEAM.available()


def ctc_beam_search_native(
    log_probs: np.ndarray, blank_id: int, beam_width: int = 16
) -> np.ndarray:
    """Native single-utterance prefix beam search; same contract as
    :func:`tfkaldi_tpu.decode.ctc_beam.ctc_beam_search_py`."""
    lib = _CTCBEAM.load()
    if lib is None:
        raise RuntimeError("native ctc_beam unavailable")
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    t_len, v = lp.shape
    out = np.empty(max(t_len, 1), dtype=np.int32)
    n = lib.ctc_beam_search(lp, t_len, v, int(blank_id), int(beam_width), out, out.size)
    if n < 0:
        raise RuntimeError("ctc_beam_search failed")
    return out[:n].copy()


def ctc_beam_search_batch_native(
    log_probs: np.ndarray, lengths, blank_id: int, beam_width: int = 16
) -> list[np.ndarray]:
    """Batched native search over a padded ``[B, T, V]`` block."""
    lib = _CTCBEAM.load()
    if lib is None:
        raise RuntimeError("native ctc_beam unavailable")
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    b, t_max, v = lp.shape
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    max_out = max(t_max, 1)
    out = np.empty((b, max_out), dtype=np.int32)
    out_lens = np.empty(b, dtype=np.int32)
    rc = lib.ctc_beam_search_batch(
        lp, b, t_max, v, lengths, int(blank_id), int(beam_width), out, max_out, out_lens
    )
    if rc != 0 or (out_lens < 0).any():
        raise RuntimeError("ctc_beam_search_batch failed")
    return [out[i, : out_lens[i]].copy() for i in range(b)]
