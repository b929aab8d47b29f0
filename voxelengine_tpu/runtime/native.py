"""ctypes bindings for the native (C++) runtime components.

Loads ``native/libframesink.so`` and ``native/libbitops.so``, building them
with the repo Makefile on first use if a toolchain is available.  Every
native feature has a pure-Python fallback so the framework degrades
gracefully on toolchain-less hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def _load(name: str) -> Optional[ctypes.CDLL]:
    path = os.path.join(_NATIVE_DIR, name)
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["make", "-s", name], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


_framesink: Optional[ctypes.CDLL] = None
_bitops: Optional[ctypes.CDLL] = None
_loaded = {"framesink": False, "bitops": False}


def framesink_lib() -> Optional[ctypes.CDLL]:
    global _framesink
    if not _loaded["framesink"]:
        _loaded["framesink"] = True
        lib = _load("libframesink.so")
        if lib is not None:
            lib.fs_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
            lib.fs_init.restype = ctypes.c_int
            lib.fs_submit.argtypes = [ctypes.c_int, ctypes.c_char_p]
            lib.fs_submit.restype = ctypes.c_int
            lib.fs_frames_written.argtypes = [ctypes.c_int]
            lib.fs_frames_written.restype = ctypes.c_long
            lib.fs_close.argtypes = [ctypes.c_int]
            lib.fs_close.restype = ctypes.c_long
        _framesink = lib
    return _framesink


def bitops_lib() -> Optional[ctypes.CDLL]:
    global _bitops
    if not _loaded["bitops"]:
        _loaded["bitops"] = True
        lib = _load("libbitops.so")
        if lib is not None:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            u32p = ctypes.POINTER(ctypes.c_uint32)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.bit_pack.argtypes = [u8p, ctypes.c_uint64, u32p]
            lib.bit_unpack.argtypes = [u32p, ctypes.c_uint64, u8p]
            lib.bit_popcount.argtypes = [u32p, ctypes.c_uint64]
            lib.bit_popcount.restype = ctypes.c_uint64
            lib.build_brickmap_host.argtypes = [
                u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, i32p, u32p, ctypes.c_int,
            ]
        _bitops = lib
    return _bitops
