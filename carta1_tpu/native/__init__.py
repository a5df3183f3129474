"""Native C++ host tier: ctypes bindings with build-on-first-use.

Provides OpenMP-parallel batched sound-unit (de)serialization and PCM
conversion for the host paths (file IO, exact engine, corpus drivers).
Falls back silently to the NumPy implementations when no C++ toolchain is
available (`is_available()` reports the outcome).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from carta1_tpu import constants as C

_SRC = os.path.join(os.path.dirname(__file__), "carta1_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcarta1_native.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile the shared library if missing/stale.  Returns error or None."""
    try:
        if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return None
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
            _SRC, "-o", _LIB_PATH + ".tmp",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            return proc.stderr[:2000]
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return None
    except (OSError, subprocess.SubprocessError) as e:
        return str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.carta1_pack_frames.argtypes = [i32p, i32p, i32p, i32p, i32p, ctypes.c_int64, u8p]
        lib.carta1_unpack_frames.argtypes = [u8p, ctypes.c_int64, i32p, i32p, i32p, i32p, i32p]
        lib.carta1_float_to_int16.argtypes = [f32p, ctypes.c_int64, i16p]
        lib.carta1_int16_to_float.argtypes = [i16p, ctypes.c_int64, f32p]
        lib.carta1_native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _i32(a: np.ndarray):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pack_frames(fd) -> np.ndarray | None:
    """FrameData -> uint8 [F, 212], or None if native tier unavailable."""
    lib = _load()
    if lib is None:
        return None
    fd = fd.to_numpy()
    nframes = fd.num_frames
    out = np.zeros((nframes, C.SOUND_UNIT_SIZE), np.uint8)
    n_bfu = np.ascontiguousarray(fd.n_bfu, np.int32)
    bm = np.ascontiguousarray(fd.block_modes, np.int32)
    sf = np.ascontiguousarray(fd.scale_factors, np.int32)
    wl = np.ascontiguousarray(fd.word_lengths, np.int32)
    q = np.ascontiguousarray(fd.quantized, np.int32)
    lib.carta1_pack_frames(
        n_bfu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        wl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nframes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def unpack_frames(units: np.ndarray):
    """uint8 [F, 212] -> FrameData, or None if native tier unavailable."""
    from carta1_tpu.framedata import FrameData

    lib = _load()
    if lib is None:
        return None
    units = np.ascontiguousarray(units, np.uint8)
    nframes = units.shape[0]
    n_bfu = np.zeros(nframes, np.int32)
    bm = np.zeros((nframes, 3), np.int32)
    sf = np.zeros((nframes, C.NUM_BFUS), np.int32)
    wl = np.zeros((nframes, C.NUM_BFUS), np.int32)
    q = np.zeros((nframes, C.NUM_BFUS, C.MAX_BFU_SIZE), np.int32)
    lib.carta1_unpack_frames(
        units.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nframes,
        n_bfu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        wl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return FrameData(n_bfu=n_bfu, block_modes=bm, scale_factors=sf, word_lengths=wl, quantized=q)


def float_to_int16(pcm: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.float32)
    out = np.empty(pcm.shape, np.int16)
    lib.carta1_float_to_int16(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
