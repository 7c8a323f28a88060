"""ctypes bindings for the native bulk ark loader (native/arkio.cpp).

First-party native host runtime — the reference has none (SURVEY §2.3: its
only native layer is external Kaldi via os.system); this replaces its
pure-Python record parsing (processing/ark.py:59-94) on the hot path.

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

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)


class NativeLibrary:
    """Build-on-first-use ctypes loader for a native/ shared library.

    Shared scaffolding for every first-party native component (arkio, CTC
    beam search): compile ``native/<source>`` to ``native/<libname>`` with
    g++ if the .so is missing, load it, run ``bind(lib)`` once to declare
    the ctypes signatures. Thread-safe; failures degrade to ``None`` so
    callers fall back to their pure-Python paths.
    """

    def __init__(self, libname: str, source: str, bind):
        self.lib_path = os.path.join(NATIVE_DIR, libname)
        self.src_path = os.path.join(NATIVE_DIR, source)
        self._bind = bind
        self._lock = threading.Lock()
        self._lib = None
        self._tried = False

    def _build(self) -> bool:
        if not os.path.isfile(self.src_path):
            return False
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                    "-o", self.lib_path, self.src_path,
                ],
                check=True,
                capture_output=True,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            log.warning("native build of %s failed: %s", self.src_path, e)
            return False

    def load(self):
        with self._lock:
            if self._lib is not None or self._tried:
                return self._lib
            self._tried = True
            if not os.path.isfile(self.lib_path) and not self._build():
                return None
            try:
                lib = ctypes.CDLL(self.lib_path)
            except OSError as e:
                log.warning("native load of %s failed: %s", self.lib_path, e)
                return None
            self._bind(lib)
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        return self.load() is not None


def _bind_arkio(lib) -> None:
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


_ARKIO = NativeLibrary("libarkio.so", "arkio.cpp", _bind_arkio)


def _load():
    return _ARKIO.load()


def available() -> bool:
    return _ARKIO.available()


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
