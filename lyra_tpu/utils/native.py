"""ctypes loader for the native host runtime (native/liblyra_native.so).

Builds the library on first use if a toolchain is available; callers fall
back to the numpy implementations when it isn't.  This mirrors the split in
the reference where host-side byte-twiddling is compiled C++
(reference: lyra/packet.h) while the heavy math lives in the accelerator
runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblyra_native.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64, i32p, u8p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)
    i64p, vp = ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p
    lib.lyra_pack_indices_batch.argtypes = [i32p, i64, i64, i64, i64, u8p, i64]
    lib.lyra_pack_indices_batch.restype = ctypes.c_int
    lib.lyra_unpack_indices_batch.argtypes = [u8p, i64, i64, i64, i64, i32p]
    lib.lyra_unpack_indices_batch.restype = ctypes.c_int
    lib.lyra_jb_create.argtypes = [i64, i64, i64]
    lib.lyra_jb_create.restype = vp
    lib.lyra_jb_destroy.argtypes = [vp]
    lib.lyra_jb_add_stream.argtypes = [vp, i64, i64, i64]
    lib.lyra_jb_add_stream.restype = ctypes.c_int
    lib.lyra_jb_remove_stream.argtypes = [vp, i64]
    lib.lyra_jb_remove_stream.restype = ctypes.c_int
    lib.lyra_jb_insert.argtypes = [vp, i64, i64, u8p, i64]
    lib.lyra_jb_insert.restype = ctypes.c_int
    lib.lyra_jb_collect.argtypes = [vp, u8p, u8p, u8p]
    lib.lyra_jb_collect.restype = i64
    lib.lyra_jb_stats.argtypes = [vp, i64p, i64p, i64p]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Return the native library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_dir = os.path.abspath(_NATIVE_DIR)
    try:
        sources = [os.path.join(src_dir, f) for f in os.listdir(src_dir)
                   if f.endswith(".cc")]
    except OSError:
        sources = []
    stale = (not os.path.exists(_LIB_PATH) or any(
        os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in sources))
    if stale:
        try:
            subprocess.run(["make", "-C", src_dir],
                           check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        _lib = _configure(ctypes.CDLL(_LIB_PATH))
    except OSError:
        _lib = None
    return _lib
