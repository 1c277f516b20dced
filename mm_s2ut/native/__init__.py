"""ctypes bindings for the native audio loader (see audioio.cpp).

The shared library is built on first use with g++ (cached beside the
source); everything degrades gracefully to the pure-Python decoder in
``mm_s2ut.data.audio_io`` when no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "audioio.cpp"
_LIB = Path(__file__).parent / "libmmaudio.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        # Compile to a temp name then os.rename (atomic on POSIX): two
        # processes racing the first-use build must never dlopen a
        # half-written .so. -march=native is safe: the .so is built on
        # first use on the host that runs it, never shipped.
        tmp = _LIB.with_suffix(f".tmp{os.getpid()}.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True, timeout=120,
        )
        os.rename(tmp, _LIB)
        return True
    except Exception as e:  # no compiler / failure → fallback path
        logger.warning("native audio loader build failed: %s", e)
        return False


_lock = threading.Lock()


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lock:  # two threads must not race the build/bind
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        return _bind()


def _bind() -> ctypes.CDLL:
    global _lib
    lib = ctypes.CDLL(str(_LIB))
    lib.mm_decode_wav.restype = ctypes.c_int
    lib.mm_decode_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mm_load_batch.restype = None
    lib.mm_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_wav(path: str, max_samples: int = 1 << 24) -> Tuple[np.ndarray, int]:
    """Decode one wav natively → (float32 mono samples, sample_rate)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = np.zeros(max_samples, np.float32)
    sr = ctypes.c_int(0)
    n = lib.mm_decode_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        raise IOError(f"native wav decode failed ({n}) for {path}")
    return buf[:n].copy(), sr.value


def load_batch(
    paths: List[str], max_samples: int, n_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode → ((n, max_samples) padded float32,
    (n,) lengths, (n,) sample rates). GIL is released during the call."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, max_samples), np.float32)
    lengths = np.zeros(n, np.int32)
    rates = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mm_load_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    bad = np.nonzero(lengths < 0)[0]
    if bad.size:
        raise IOError(f"native decode failed for {[paths[i] for i in bad[:3]]}")
    return out, lengths, rates
