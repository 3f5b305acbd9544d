"""ctypes bindings for the native host ops (csrc/native_ops.cpp).

The shared library is built lazily with g++ on first use and cached next to
the sources. Everything degrades gracefully: ``available()`` is False when no
compiler is present and callers fall back to the pure-Python/JAX paths.
"""
import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).parent / 'csrc'
_LIB_PATH = _CSRC / 'libnative_ops.so'
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # compile to a per-process temp name and atomically rename: multiple
    # spawned preprocessing workers build concurrently on first use, and a
    # non-atomic write would let another process dlopen a truncated .so
    import os
    tmp = _CSRC / f'.libnative_ops.{os.getpid()}.so'
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-pthread', '-std=c++17',
             str(_CSRC / 'native_ops.cpp'), '-o', str(tmp)],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception as e:
        print(f'native_ops build failed: {e}')
        tmp.unlink(missing_ok=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists():
            if not _build():
                return None
        elif (_CSRC / 'native_ops.cpp').stat().st_mtime > _LIB_PATH.stat().st_mtime:
            if not _build():
                # never load a stale .so whose semantics may no longer match
                # the Python/JAX paths; fall back to pure-JAX implementations
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            print(f'native_ops load failed: {e}')
            return None
        lib.duration_dp.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.duration_dp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.duration_dp_range.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.vad_long_silence_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.vad_long_silence_mask.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    import os
    if os.environ.get('TTS_TPU_DISABLE_NATIVE'):
        return False
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def duration_dp(cost: np.ndarray) -> np.ndarray:
    """(m, n) cost grid → (n,) int32 durations summing to m."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float32)
    m, n = cost.shape
    out = np.zeros(n, np.int32)
    lib.duration_dp(_fptr(cost), m, n, _iptr(out))
    return out


def duration_dp_batch(costs: np.ndarray, ms: np.ndarray,
                      ns: np.ndarray, max_workers: int = 8) -> np.ndarray:
    """(B, m_pad, n_pad) padded costs + per-sample dims → (B, n_pad) durations.

    Parallelized with Python threads over C++ range calls: ctypes releases
    the GIL, so the DP scales across cores without native thread management.
    """
    lib = _load()
    costs = np.ascontiguousarray(costs, np.float32)
    b, m_pad, n_pad = costs.shape
    ms = np.ascontiguousarray(ms, np.int32)
    ns = np.ascontiguousarray(ns, np.int32)
    out = np.zeros((b, n_pad), np.int32)
    n_workers = max(1, min(max_workers, b))
    if n_workers == 1:
        lib.duration_dp_batch(_fptr(costs), _iptr(ms), _iptr(ns), b, m_pad,
                              n_pad, _iptr(out))
        return out
    from concurrent.futures import ThreadPoolExecutor
    bounds = np.linspace(0, b, n_workers + 1).astype(int)
    def run(w):
        lib.duration_dp_range(_fptr(costs), _iptr(ms), _iptr(ns),
                              int(bounds[w]), int(bounds[w + 1]), m_pad,
                              n_pad, _iptr(out))
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        list(ex.map(run, range(n_workers)))
    return out


def vad_long_silence_mask(wav: np.ndarray, sampling_rate: int, window_ms: int,
                          moving_average_width: int, max_silence_length: int,
                          energy_threshold_db: float = -48.0) -> np.ndarray:
    """Boolean per-sample keep mask (vad.py::trim_long_silences semantics)."""
    lib = _load()
    wav = np.ascontiguousarray(wav, np.float32)
    mask = np.zeros(len(wav), np.uint8)
    lib.vad_long_silence_mask(
        _fptr(wav), len(wav), sampling_rate, window_ms, moving_average_width,
        max_silence_length, energy_threshold_db,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask.astype(bool)
