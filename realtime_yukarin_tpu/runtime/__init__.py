"""ctypes binding + on-demand build of the native host runtime.

The reference's native pieces are WORLD (C++) and PortAudio (C); their
compute moved on-device (dsp/, ops/), so the native layer that REMAINS on
host is the realtime-safe buffering and file I/O in ``native_runtime.cpp``
(SURVEY.md §2b: "native parts in C++ as appropriate").

The shared library builds lazily with g++ on first import and is cached
next to the source; rebuilt when the source is newer.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "native_runtime.cpp"
_LIB = _DIR / "libnative_runtime.so"


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    u64 = ctypes.c_uint64
    i64 = ctypes.c_int64
    ptr = ctypes.c_void_p
    fptr = ctypes.POINTER(ctypes.c_float)

    lib.rb_create.restype = ptr
    lib.rb_create.argtypes = [u64]
    lib.rb_destroy.argtypes = [ptr]
    lib.rb_capacity.restype = u64
    lib.rb_capacity.argtypes = [ptr]
    lib.rb_available.restype = u64
    lib.rb_available.argtypes = [ptr]
    lib.rb_free_space.restype = u64
    lib.rb_free_space.argtypes = [ptr]
    lib.rb_push.restype = u64
    lib.rb_push.argtypes = [ptr, fptr, u64]
    lib.rb_pop.restype = u64
    lib.rb_pop.argtypes = [ptr, fptr, u64]
    lib.rb_pop_exact_or_silence.restype = ctypes.c_int
    lib.rb_pop_exact_or_silence.argtypes = [ptr, fptr, u64]
    lib.rb_underruns.restype = u64
    lib.rb_underruns.argtypes = [ptr]
    lib.rb_overruns.restype = u64
    lib.rb_overruns.argtypes = [ptr]

    class WavInfo(ctypes.Structure):
        _fields_ = [("sample_rate", ctypes.c_int32),
                    ("channels", ctypes.c_int32),
                    ("bits", ctypes.c_int32),
                    ("num_frames", ctypes.c_int64),
                    ("format", ctypes.c_int32)]

    lib.WavInfo = WavInfo
    lib.wav_read_info.restype = ctypes.c_int
    lib.wav_read_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(WavInfo)]
    lib.wav_read_f32.restype = i64
    lib.wav_read_f32.argtypes = [ctypes.c_char_p, fptr, i64]
    lib.wav_write_f32.restype = ctypes.c_int
    lib.wav_write_f32.argtypes = [ctypes.c_char_p, fptr, i64, ctypes.c_int32]
    return lib


_lib: ctypes.CDLL | None = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _as_fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class RingBuffer:
    """Lock-free SPSC float32 ring buffer (native).

    Producer and consumer may live on different threads; silence-on-
    underrun mirrors the reference's realtime output contract.
    """

    def __init__(self, min_capacity: int):
        self._lib = lib()
        self._h = self._lib.rb_create(min_capacity)

    def __del__(self):
        try:
            self._lib.rb_destroy(self._h)
        except Exception:
            pass

    @property
    def capacity(self) -> int:
        return self._lib.rb_capacity(self._h)

    @property
    def available(self) -> int:
        return self._lib.rb_available(self._h)

    @property
    def free_space(self) -> int:
        return self._lib.rb_free_space(self._h)

    @property
    def underruns(self) -> int:
        return self._lib.rb_underruns(self._h)

    @property
    def overruns(self) -> int:
        return self._lib.rb_overruns(self._h)

    def push(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, np.float32)
        return self._lib.rb_push(self._h, _as_fptr(x), len(x))

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.rb_pop(self._h, _as_fptr(out), n)
        return out[:got]

    def pop_chunk_or_silence(self, n: int) -> tuple[np.ndarray, bool]:
        """Exactly-n pop; zeros + False when starved."""
        out = np.empty(n, np.float32)
        ok = self._lib.rb_pop_exact_or_silence(self._h, _as_fptr(out), n)
        return out, bool(ok)


def read_wav_native(path: str) -> tuple[np.ndarray, int]:
    L = lib()
    info = L.WavInfo()
    rc = L.wav_read_info(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"wav_read_info({path}) -> {rc}")
    out = np.empty(info.num_frames, np.float32)
    got = L.wav_read_f32(path.encode(), _as_fptr(out), info.num_frames)
    if got < 0:
        raise IOError(f"wav_read_f32({path}) -> {got}")
    return out[:got], int(info.sample_rate)


def write_wav_native(path: str, x: np.ndarray, sample_rate: int) -> None:
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    rc = L.wav_write_f32(path.encode(), _as_fptr(x), len(x), sample_rate)
    if rc != 0:
        raise IOError(f"wav_write_f32({path}) -> {rc}")
