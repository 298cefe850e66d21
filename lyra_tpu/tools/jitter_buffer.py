"""ctypes facade over the native per-stream jitter buffer
(native/jitter_buffer.cc): reorders/dedups asynchronously arriving packets
and drains one dense tick batch per 20 ms for the lockstep decoder engine.
A missing packet at collect time is a loss — the engine's PLC machine takes
over for that stream.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from lyra_tpu.utils import native


class JitterBuffer:
    def __init__(self, capacity: int, packet_size: int, depth: int = 8):
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        self.capacity = capacity
        self.packet_size = packet_size
        self.depth = depth
        self._h = lib.lyra_jb_create(capacity, packet_size, depth)
        if not self._h:
            raise RuntimeError("jitter buffer allocation failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.lyra_jb_destroy(h)
            self._h = None

    def add_stream(self, stream: int, start_seq: int = 0,
                   playout_delay: int = 0) -> None:
        """`playout_delay` ticks of buffering absorb network delay/jitter up
        to that many packet intervals before draining begins."""
        if self._lib.lyra_jb_add_stream(self._h, stream, start_seq,
                                        playout_delay):
            raise ValueError(f"bad stream slot {stream} / delay")

    def remove_stream(self, stream: int) -> None:
        if self._lib.lyra_jb_remove_stream(self._h, stream):
            raise ValueError(f"bad stream slot {stream}")

    def insert(self, stream: int, seq: int, packet: bytes) -> int:
        """Returns 0 ok, 2 late-drop, 3 duplicate, 4 too-far-ahead,
        5 inactive stream (packet for a torn-down call — a routine
        transport event, dropped and counted, never an exception)."""
        buf = (ctypes.c_uint8 * max(len(packet), 1)).from_buffer_copy(
            packet or b"\x00")
        rc = self._lib.lyra_jb_insert(self._h, stream, seq, buf, len(packet))
        if rc == 1:
            raise ValueError(f"bad insert args (stream {stream})")
        return rc

    def insert_red(self, stream: int, seq: int, packet: bytes) -> int:
        """File a REDUNDANT copy (RED framing: packet `seq` carried
        alongside a later datagram).  Files only into an empty ring slot
        and counts the fill as a red_heal; never touches the adaptive
        margins, the desync streak, or the drop counters (a redundant
        whose primary already arrived is the normal case, not an
        anomaly).  Returns 0 healed, 2 too late, 3 already there,
        4 ahead of window, 5 inactive."""
        buf = (ctypes.c_uint8 * max(len(packet), 1)).from_buffer_copy(
            packet or b"\x00")
        rc = self._lib.lyra_jb_insert_red(self._h, stream, seq, buf,
                                          len(packet))
        if rc == 1:
            raise ValueError(f"bad insert args (stream {stream})")
        return rc

    @property
    def red_heals(self) -> int:
        """Redundant copies that filled a real hole — what RED bought."""
        return int(self._lib.lyra_jb_red_heals(self._h))

    def collect(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One tick: → (packets [capacity, packet_size] u8,
        received [capacity] bool, sizes [capacity] u8)."""
        out = np.zeros((self.capacity, self.packet_size), np.uint8)
        received = np.zeros(self.capacity, np.uint8)
        sizes = np.zeros(self.capacity, np.uint8)
        self._lib.lyra_jb_collect(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            received.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out, received.astype(bool), sizes

    def stats(self) -> dict:
        late = ctypes.c_int64()
        dup = ctypes.c_int64()
        over = ctypes.c_int64()
        inactive = ctypes.c_int64()
        self._lib.lyra_jb_stats2(self._h, ctypes.byref(late),
                                 ctypes.byref(dup), ctypes.byref(over),
                                 ctypes.byref(inactive))
        return {"late_drops": late.value, "dup_drops": dup.value,
                "overflow_drops": over.value,
                "inactive_drops": inactive.value,
                "resyncs": int(self._lib.lyra_jb_resyncs(self._h))}

    def set_adaptive(self, min_delay: int, max_delay: int,
                     window: int = 100) -> None:
        """Enable adaptive playout delay: every `window` ticks each
        stream's delay grows toward observed lateness or shrinks after
        sustained excess cushion, within [min_delay, max_delay] (see
        native/jitter_buffer.cc).  Streams keep their add_stream delay as
        the starting point.  While a pump owns this buffer, call the
        pump's set_adaptive instead (locking)."""
        if self._lib.lyra_jb_set_adaptive(self._h, min_delay, max_delay,
                                          window):
            raise ValueError(
                f"bad adaptive bounds [{min_delay}, {max_delay}] "
                f"(need 0 <= min <= max < depth {self.depth}) or "
                f"window {window} <= 0")

    def adapt_stats(self) -> dict:
        """Decision counters + the fleet's current latency position
        (per-active-slot playout delay min/max/mean, in 20 ms ticks)."""
        vals = [ctypes.c_int64() for _ in range(6)]
        self._lib.lyra_jb_adapt_stats(self._h, *map(ctypes.byref, vals))
        grows, shrinks, dmin, dmax, dsum, active = (v.value for v in vals)
        return {"grows": grows, "shrinks": shrinks,
                "delay_min": dmin, "delay_max": dmax,
                "delay_mean": (dsum / active) if active else 0.0,
                "active_streams": active}

    def delay(self, stream: int) -> int:
        """Current playout delay (ticks) for one slot."""
        d = int(self._lib.lyra_jb_delay(self._h, stream))
        if d < 0:
            raise ValueError(f"bad stream slot {stream}")
        return d

    def adapt_export(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-slot adaptive evidence for a migration snapshot (the
        companion of heads()): (learned delay0 [capacity] int64, -1
        inactive; shrink-vote streak [capacity] int64).  Meaningful with
        set_adaptive on; without it delay0 is just each slot's configured
        playout delay."""
        delays = np.empty(self.capacity, np.int64)
        votes = np.empty(self.capacity, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._lib.lyra_jb_adapt_export(
            self._h, delays.ctypes.data_as(i64p), votes.ctypes.data_as(i64p))
        return delays, votes

    def adapt_seed(self, stream: int, delay0: int, votes: int = 0) -> None:
        """Re-seed one active slot's learned delay (clamped to the
        adaptive bounds; becomes both delay0 and the refill pause) and
        shrink streak after a restore.  Requires set_adaptive on — a
        static-delay host keeps its configured base."""
        if self._lib.lyra_jb_adapt_seed(self._h, stream, delay0, votes):
            raise ValueError(
                f"adapt_seed refused (slot {stream}, delay {delay0}: "
                "inactive slot, adaptive off, or negative inputs)")

    def heads(self) -> np.ndarray:
        """Playout schedule: int64 [capacity], the next sequence each slot
        will play, -1 for inactive slots.  A migration snapshot carries
        this so the destination host re-seeds its buffer
        (add_stream(start_seq=head)) and locks onto each caller's live
        sequence immediately instead of via a streak of late drops."""
        out = np.empty(self.capacity, np.int64)
        self._lib.lyra_jb_heads(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out
