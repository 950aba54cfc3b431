"""ctypes bindings for the native (C++) data-layer kernels.

The reference's spike binning is a per-unit Python ``np.histogram`` loop
(util.py:515-538); packing/segmentation are implicit Python list
processing.  The C++ library (native/vlgp_native.cpp) does the same jobs
multithreaded; this module loads it if built and falls back to NumPy
otherwise (call ``build()`` or run ``native/build.sh`` to compile).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional, Sequence

import numpy as np

__all__ = ["available", "build", "bin_spikes", "pack_ragged", "gather_segments"]

_ROOT = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _ROOT / "libvlgp_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vlgp_bin_spikes.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.vlgp_pack_ragged.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.vlgp_gather_segments.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def build() -> bool:
    """Compile the native library in place (g++ required)."""
    try:
        subprocess.run(["sh", str(_ROOT / "build.sh")], check=True,
                       capture_output=True)
        return _load() is not None
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def _nthreads() -> int:
    return max(1, (os.cpu_count() or 1) - 1)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bin_spikes(
    spike_times: Sequence[np.ndarray],
    binwidth: float,
    start: Optional[float] = None,
    stop: Optional[float] = None,
) -> np.ndarray:
    """Bin per-unit spike-time arrays into a (n_units, n_bins) count matrix.

    Multi-unit, multithreaded version of ``util.count`` (util.py:515-538).
    """
    times = [np.asarray(t, np.float64) for t in spike_times]
    allt = np.concatenate(times) if times else np.zeros(0)
    if start is None:
        start = float(allt.min()) if allt.size else 0.0
    if stop is None:
        stop = float(allt.max()) if allt.size else binwidth
    n_bins = max(1, int(np.ceil((stop - start) / binwidth)))
    n_units = len(times)
    out = np.zeros((n_units, n_bins), np.float32)

    lib = _load()
    if lib is None:
        edges = start + np.arange(n_bins + 1) * binwidth
        for u, t in enumerate(times):
            out[u] = np.histogram(t, bins=edges)[0]
        return out

    flat = np.ascontiguousarray(allt)
    offsets = np.zeros(n_units + 1, np.int64)
    np.cumsum([len(t) for t in times], out=offsets[1:])
    lib.vlgp_bin_spikes(
        _ptr(flat, ctypes.c_double), _ptr(offsets, ctypes.c_int64),
        n_units, start, binwidth, n_bins, _ptr(out, ctypes.c_float),
        _nthreads(),
    )
    return out


def pack_ragged(mats: Sequence[np.ndarray], tmax: Optional[int] = None):
    """Pack ragged (L_i, d) matrices into ((n, tmax, d), (n, tmax) mask)."""
    mats = [np.ascontiguousarray(m, np.float32) for m in mats]
    lengths = np.array([m.shape[0] for m in mats], np.int64)
    d = mats[0].shape[1]
    tmax = int(lengths.max()) if tmax is None else tmax
    n = len(mats)
    out = np.zeros((n, tmax, d), np.float32)
    mask = np.zeros((n, tmax), np.float32)

    lib = _load()
    if lib is None:
        for i, m in enumerate(mats):
            L = min(m.shape[0], tmax)
            out[i, :L] = m[:L]
            mask[i, :L] = 1.0
        return out, mask

    src = np.concatenate(mats, axis=0)
    lib.vlgp_pack_ragged(
        _ptr(src, ctypes.c_float), _ptr(lengths, ctypes.c_int64),
        n, tmax, d, _ptr(out, ctypes.c_float), _ptr(mask, ctypes.c_float),
        _nthreads(),
    )
    return out, mask


def gather_segments(src: np.ndarray, trial_idx: np.ndarray, start: np.ndarray,
                    window: int) -> np.ndarray:
    """out[k] = src[trial_idx[k], start[k]:start[k]+window] (zero-padded)."""
    src = np.ascontiguousarray(src, np.float32)
    n, tmax = src.shape[0], src.shape[1]
    d = int(np.prod(src.shape[2:])) if src.ndim > 2 else 1
    trial_idx = np.ascontiguousarray(trial_idx, np.int32)
    start = np.ascontiguousarray(start, np.int32)
    n_seg = len(trial_idx)
    out = np.zeros((n_seg, window) + src.shape[2:], np.float32)

    lib = _load()
    if lib is None:
        for k in range(n_seg):
            i, s = int(trial_idx[k]), int(start[k])
            L = min(window, tmax - s)
            if L > 0:
                out[k, :L] = src[i, s : s + L]
        return out

    lib.vlgp_gather_segments(
        _ptr(src.reshape(n, tmax, d), ctypes.c_float),
        _ptr(trial_idx, ctypes.c_int32), _ptr(start, ctypes.c_int32),
        n_seg, tmax, window, d, _ptr(out.reshape(n_seg, window, d), ctypes.c_float),
        _nthreads(),
    )
    return out
