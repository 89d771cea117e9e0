"""Native (C++) host-side components, built with g++ and bound via ctypes.

Currently: the BPE merge engine (bpe.cpp) used by utils/spm.py when
available. Build is lazy and cached next to the source; every native entry
point has a pure-Python fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libindextts_native.so")
_SRC = os.path.join(_HERE, "bpe.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # an existing .so can be unloadable on THIS host (checked-out
            # binary from another arch/glibc): rebuild from source once
            # before giving up on the native path
            if not _build():
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                _build_failed = True
                return None
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


class NativeBPE:
    """ctypes wrapper over the C++ merge engine."""

    def __init__(self, pieces, scores, types, unk_id: int):
        self.lib = load_native_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        n = len(pieces)
        arr = (ctypes.c_char_p * n)(*[p.encode("utf-8") for p in pieces])
        sc = (ctypes.c_float * n)(*scores)
        ty = (ctypes.c_uint8 * n)(*types)
        self.handle = self.lib.bpe_create(arr, sc, ty, n, unk_id)
        self._out = (ctypes.c_int32 * 65536)()
        # the output buffer is shared per instance — serialize encode()
        # so concurrent callers (the server is threaded) can't read each
        # other's ids out of it
        self._encode_lock = threading.Lock()

    def encode(self, text: str):
        # bpe_encode returns the TOTAL token count (snprintf convention);
        # grow the buffer and retry instead of silently dropping the tail
        raw = text.encode("utf-8")
        with self._encode_lock:
            n = self.lib.bpe_encode(self.handle, raw, self._out, len(self._out))
            while n > len(self._out):
                self._out = (ctypes.c_int32 * (2 * n))()
                n = self.lib.bpe_encode(self.handle, raw, self._out, len(self._out))
            return list(self._out[:n])

    def __del__(self):
        try:
            if getattr(self, "handle", None) and self.lib is not None:
                self.lib.bpe_free(self.handle)
        except Exception:
            pass
