"""ctypes bindings for the native bulk ark loader (native/arkio.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence ctypes). Callers must handle :func:`available` being False —
every native path has a pure-Python equivalent in :mod:`tfkaldi_tpu.io.ark`
/ :mod:`tfkaldi_tpu.data.feature_reader`.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libarkio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "arkio.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.warning("native arkio build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("native arkio load failed: %s", e)
            return None
        lib.ark_read_batch.restype = ctypes.c_int
        lib.ark_read_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.ark_read_cmvn_splice_batch.restype = ctypes.c_int
        lib.ark_read_cmvn_splice_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_batch(ark_path: str, offsets, max_rows: int, cols: int):
    """Bulk-read records (all from one ark file) into a padded batch.

    Returns ``(batch [n, max_rows, cols] float32, rows [n] int32)``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native arkio unavailable")
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(offsets)
    out = np.empty((n, max_rows, cols), dtype=np.float32)
    rows = np.empty(n, dtype=np.int32)
    rc = lib.ark_read_batch(
        ark_path.encode(), offsets, n, max_rows, cols, out, rows
    )
    if rc != 0:
        raise IOError(f"ark_read_batch failed with code {rc} on {ark_path}")
    return out, rows


def read_cmvn_splice_batch(
    ark_path: str, offsets, cmvn_stats, context_width: int, max_rows: int, dim: int
):
    """Bulk-read + CMVN + splice into a padded batch.

    Args:
        cmvn_stats: ``[n, 2, dim+1]`` float32 — each utterance's speaker
            stats.

    Returns ``(batch [n, max_rows, dim*(2c+1)] float32, rows [n] int32)``
    where ``rows[i] == -1`` marks an utterance too short to splice.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native arkio unavailable")
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    cmvn_stats = np.ascontiguousarray(cmvn_stats, dtype=np.float32)
    n = len(offsets)
    assert cmvn_stats.shape == (n, 2, dim + 1), cmvn_stats.shape
    out = np.empty((n, max_rows, dim * (2 * context_width + 1)), dtype=np.float32)
    rows = np.empty(n, dtype=np.int32)
    rc = lib.ark_read_cmvn_splice_batch(
        ark_path.encode(), offsets, n, cmvn_stats, context_width, max_rows, dim, out, rows
    )
    if rc != 0:
        raise IOError(f"ark_read_cmvn_splice_batch failed with code {rc} on {ark_path}")
    return out, rows
