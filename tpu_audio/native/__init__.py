"""Native (C++) host-side audio runtime, loaded via ctypes.

Compiled lazily from ``audioio.cpp`` on first use; every entry point has a
pure-NumPy fallback so the package works without a toolchain. The reference
gets the analogous layer from AVFoundation (AVAudioConverter resampling,
AudioUtils.swift:130; mic-format conversion, PCMStreamConverter.swift:24).

Set ``TPU_AUDIO_NO_NATIVE=1`` to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

__all__ = ["lib", "available", "polyphase", "pcm16_to_f32", "mix_to_mono"]

_SRC = Path(__file__).with_name("audioio.cpp")
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_dir() -> Path:
    d = Path(__file__).parent / "_build"
    d.mkdir(exist_ok=True)
    return d


def _compile() -> Path | None:
    so = _build_dir() / "libtpuaudio.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None (no compiler / disabled)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TPU_AUDIO_NO_NATIVE") == "1":
        return None
    so = _compile()
    if so is None:
        return None
    try:
        L = ctypes.CDLL(str(so))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    L.ta_polyphase.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                               f32p, ctypes.c_int32, ctypes.c_int32,
                               ctypes.c_int64, f32p]
    L.ta_pcm16_to_f32.argtypes = [i16p, ctypes.c_int64, f32p]
    L.ta_f32_to_pcm16.argtypes = [f32p, ctypes.c_int64, i16p]
    L.ta_mix_to_mono.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p]
    _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def polyphase(buf: np.ndarray, start0: int, orig_r: int,
              kernel: np.ndarray, n_frames: int) -> np.ndarray | None:
    """out[m, j] = dot(buf[start0 + m*orig_r : +k_taps], kernel[j]).

    Returns the flattened [n_frames * new_r] output, or None when the
    native library is unavailable (caller falls back to NumPy).
    """
    L = lib()
    if L is None or n_frames <= 0:
        return None
    new_r, k_taps = kernel.shape
    buf = np.ascontiguousarray(buf, np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    out = np.empty(n_frames * new_r, np.float32)
    L.ta_polyphase(_ptr(buf, ctypes.c_float), start0, orig_r,
                   _ptr(kernel, ctypes.c_float), new_r, k_taps,
                   n_frames, _ptr(out, ctypes.c_float))
    return out


def pcm16_to_f32(x: np.ndarray) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.size, np.float32)
    L.ta_pcm16_to_f32(_ptr(x, ctypes.c_int16), x.size,
                      _ptr(out, ctypes.c_float))
    return out.reshape(x.shape)


def mix_to_mono(x: np.ndarray) -> np.ndarray | None:
    """[T, C] float32 -> [T] mono mean."""
    L = lib()
    if L is None or x.ndim != 2:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape[0], np.float32)
    L.ta_mix_to_mono(_ptr(x, ctypes.c_float), x.shape[0], x.shape[1],
                     _ptr(out, ctypes.c_float))
    return out
