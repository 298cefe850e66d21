"""ctypes loader for the native host runtime (native/liblyra_native.so).

Builds the library on first use if a toolchain is available; callers fall
back to the numpy implementations when it isn't.  This mirrors the split in
the reference where host-side byte-twiddling is compiled C++
(reference: lyra/packet.h) while the heavy math lives in the accelerator
runtime.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

_log = logging.getLogger("lyra_tpu")

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
    lib.lyra_jb_stats.restype = None
    lib.lyra_jb_stats2.argtypes = [vp, i64p, i64p, i64p, i64p]
    lib.lyra_jb_stats2.restype = None
    lib.lyra_jb_resyncs.argtypes = [vp]
    lib.lyra_jb_resyncs.restype = i64
    lib.lyra_jb_set_adaptive.argtypes = [vp, i64, i64, i64]
    lib.lyra_jb_set_adaptive.restype = ctypes.c_int
    lib.lyra_jb_adapt_stats.argtypes = [vp, i64p, i64p, i64p, i64p, i64p,
                                        i64p]
    lib.lyra_jb_adapt_stats.restype = None
    lib.lyra_jb_delay.argtypes = [vp, i64]
    lib.lyra_jb_delay.restype = i64
    lib.lyra_jb_heads.argtypes = [vp, i64p]
    lib.lyra_jb_heads.restype = None
    lib.lyra_pump_jb_heads.argtypes = [vp, i64p]
    lib.lyra_pump_jb_heads.restype = ctypes.c_int
    lib.lyra_pump_set_adaptive.argtypes = [vp, i64, i64, i64]
    lib.lyra_pump_set_adaptive.restype = ctypes.c_int
    lib.lyra_pump_jb_adapt_stats.argtypes = [vp, i64p, i64p, i64p, i64p,
                                             i64p, i64p]
    lib.lyra_pump_jb_adapt_stats.restype = None
    lib.lyra_pump_jb_resyncs.argtypes = [vp]
    lib.lyra_pump_jb_resyncs.restype = i64
    lib.lyra_jb_insert_red.argtypes = [vp, i64, i64, u8p, i64]
    lib.lyra_jb_insert_red.restype = ctypes.c_int
    lib.lyra_jb_red_heals.argtypes = [vp]
    lib.lyra_jb_red_heals.restype = i64
    lib.lyra_pump_set_red.argtypes = [vp, i64]
    lib.lyra_pump_set_red.restype = ctypes.c_int
    lib.lyra_pump_red_heals.argtypes = [vp]
    lib.lyra_pump_red_heals.restype = i64
    lib.lyra_pump_create.argtypes = [vp, ctypes.c_int]
    lib.lyra_pump_create.restype = vp
    lib.lyra_sink_pump_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.lyra_sink_pump_create.restype = vp
    lib.lyra_pump_port.argtypes = [vp]
    lib.lyra_pump_port.restype = ctypes.c_int
    lib.lyra_pump_destroy.argtypes = [vp]
    lib.lyra_pump_destroy.restype = None
    lib.lyra_pump_add_stream.argtypes = [vp, i64, i64, i64]
    lib.lyra_pump_add_stream.restype = ctypes.c_int
    lib.lyra_pump_remove_stream.argtypes = [vp, i64]
    lib.lyra_pump_remove_stream.restype = ctypes.c_int
    lib.lyra_pump_collect.argtypes = [vp, u8p, u8p, u8p]
    lib.lyra_pump_collect.restype = i64
    lib.lyra_pump_stats.argtypes = [vp, i64p, i64p, i64p]
    lib.lyra_pump_stats.restype = None
    lib.lyra_pump_jb_stats.argtypes = [vp, i64p, i64p, i64p, i64p]
    lib.lyra_pump_jb_stats.restype = None
    lib.lyra_pump_max_datagram.argtypes = []
    lib.lyra_pump_max_datagram.restype = ctypes.c_int
    lib.lyra_pump_blast.argtypes = [ctypes.c_int, i64, i64, i64, i64]
    lib.lyra_pump_blast.restype = i64
    lib.lyra_pump_blast2.argtypes = [ctypes.c_int, i64, i64, i64, i64]
    lib.lyra_pump_blast2.restype = i64
    lib.lyra_pcm_pump_create.argtypes = [ctypes.c_int, i64, i64]
    lib.lyra_pcm_pump_create.restype = vp
    lib.lyra_pcm_pump_collect.argtypes = [vp, u8p, u8p]
    lib.lyra_pcm_pump_collect.restype = i64
    lib.lyra_pcm_pump_stats.argtypes = [vp, i64p, i64p, i64p, i64p]
    lib.lyra_pcm_pump_stats.restype = None
    lib.lyra_pcm_pump_reset_slot.argtypes = [vp, i64]
    lib.lyra_pcm_pump_reset_slot.restype = ctypes.c_int
    lib.lyra_egress_create.argtypes = [i64]
    lib.lyra_egress_create.restype = vp
    lib.lyra_egress_destroy.argtypes = [vp]
    lib.lyra_egress_destroy.restype = None
    lib.lyra_egress_set_dest.argtypes = [vp, i64, ctypes.c_char_p,
                                         ctypes.c_int]
    lib.lyra_egress_set_dest.restype = ctypes.c_int
    lib.lyra_egress_send.argtypes = [vp, u8p, i32p, i64, i64, i64]
    lib.lyra_egress_send.restype = i64
    lib.lyra_egress_stats.argtypes = [vp, i64p, i64p, i64p]
    lib.lyra_egress_stats.restype = None
    lib.lyra_pump_copy_sources.argtypes = [
        vp, i64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint16), u8p]
    lib.lyra_pump_copy_sources.restype = i64
    lib.lyra_egress_route_from_pump.argtypes = [vp, vp]
    lib.lyra_egress_route_from_pump.restype = i64
    lib.lyra_pump_get_fd.argtypes = [vp]
    lib.lyra_pump_get_fd.restype = ctypes.c_int
    lib.lyra_egress_create_on_pump.argtypes = [vp, i64]
    lib.lyra_egress_create_on_pump.restype = vp
    # SO_REUSEPORT shard groups (multi-core transport tier).
    vpp = ctypes.POINTER(vp)
    lib.lyra_pump_create_shard.argtypes = [vp, ctypes.c_int, vp]
    lib.lyra_pump_create_shard.restype = vp
    lib.lyra_pcm_pump_create_shard.argtypes = [ctypes.c_int, i64, i64, vp]
    lib.lyra_pcm_pump_create_shard.restype = vp
    lib.lyra_pump_collect_merged.argtypes = [vpp, ctypes.c_int, i64, i64,
                                             u8p, u8p, u8p]
    lib.lyra_pump_collect_merged.restype = i64
    lib.lyra_pcm_pump_collect_merged.argtypes = [vpp, ctypes.c_int, u8p, u8p]
    lib.lyra_pcm_pump_collect_merged.restype = i64
    lib.lyra_pump_copy_sources_owned.argtypes = [
        vpp, ctypes.c_int, i64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint16), u8p, i32p]
    lib.lyra_pump_copy_sources_owned.restype = i64
    lib.lyra_pump_adapt_stats_merged.argtypes = [vpp, ctypes.c_int, i64,
                                                 i64p, i64p, i64p, i64p,
                                                 i64p, i64p]
    lib.lyra_pump_adapt_stats_merged.restype = ctypes.c_int
    lib.lyra_pump_jb_heads_merged.argtypes = [vpp, ctypes.c_int, i64, i64p]
    lib.lyra_pump_jb_heads_merged.restype = ctypes.c_int
    # Adaptive-evidence carry across host moves (jitter_buffer.cc
    # lyra_jb_adapt_export/seed + the pump/shard wrappers).
    lib.lyra_jb_adapt_export.argtypes = [vp, i64p, i64p]
    lib.lyra_jb_adapt_export.restype = None
    lib.lyra_jb_adapt_seed.argtypes = [vp, i64, i64, i64]
    lib.lyra_jb_adapt_seed.restype = ctypes.c_int
    lib.lyra_jb_votes2.argtypes = [vp, i64]
    lib.lyra_jb_votes2.restype = i64
    lib.lyra_pump_jb_adapt_export.argtypes = [vp, i64p, i64p]
    lib.lyra_pump_jb_adapt_export.restype = ctypes.c_int
    lib.lyra_pump_jb_adapt_seed.argtypes = [vp, i64, i64, i64]
    lib.lyra_pump_jb_adapt_seed.restype = ctypes.c_int
    lib.lyra_pump_jb_adapt_export_merged.argtypes = [vpp, ctypes.c_int,
                                                     i64, i64p, i64p]
    lib.lyra_pump_jb_adapt_export_merged.restype = ctypes.c_int
    lib.lyra_pump_blast_multi.argtypes = [ctypes.c_int, i64, i64, i64, i64,
                                          ctypes.c_int]
    lib.lyra_pump_blast_multi.restype = i64
    lib.lyra_egress_send_range.argtypes = [vp, u8p, i32p, i64, i64, i64,
                                           i64, i64, ctypes.c_int]
    lib.lyra_egress_send_range.restype = i64
    lib.lyra_egress_route_from_table.argtypes = [
        vp, i64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint16), u8p]
    lib.lyra_egress_route_from_table.restype = i64
    return lib


def build() -> bool:
    """Compile the native library if missing or stale. Call this eagerly at
    server/CLI startup — `load()` itself never runs the compiler on an
    up-to-date tree, so a hot serving tick can't stall behind `make`.

    Returns True if the .so exists (freshly built or already current)."""
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
        except (OSError, subprocess.SubprocessError) as e:
            _log.warning("native build failed (%s); numpy fallback in use", e)
    return os.path.exists(_LIB_PATH)


def load() -> Optional[ctypes.CDLL]:
    """Return the native library (dlopen only — build happens in `build()`,
    or here exactly once if the .so has never been compiled); None if
    unavailable, in which case callers use the numpy fallback."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        # First-ever use on this checkout: compile once. Deliberately no
        # mtime staleness check here — a source edit must not trigger a
        # rebuild in the middle of serving; that's build()'s job.
        build()
    try:
        _lib = _configure(ctypes.CDLL(_LIB_PATH))
    except AttributeError:
        # A .so built from an older checkout lacks a newly added symbol:
        # rebuild once (build() sees the newer sources) and retry.
        _log.warning("native library is missing symbols; rebuilding")
        build()
        try:
            _lib = _configure(ctypes.CDLL(_LIB_PATH))
        except (OSError, AttributeError):
            _lib = None
            _log.warning("native rebuild did not yield a loadable library; "
                         "using numpy pack/unpack fallback")
    except OSError:
        _lib = None
        _log.warning("native library unavailable at %s; "
                     "using numpy pack/unpack fallback", _LIB_PATH)
    return _lib
