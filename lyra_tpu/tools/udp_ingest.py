"""Native UDP ingest: socket → jitter buffer with zero per-packet Python.

ctypes facade over native/udp_pump.cc.  At fleet scale the transport side
is millions of datagrams per second (streams x 50 packets/s) — far past a
per-datagram Python loop — so the pump owns the socket in C++: a receiver
thread batch-drains it with recvmmsg, parses the wire header (2 B stream
slot + 4 B big-endian sequence, the examples/udp_call.py layout), and
files payloads into the native JitterBuffer.  The serving loop calls
`collect()` once per 20 ms tick and feeds the result straight to
`DecoderServer.tick_wire`/`tick_packed`.

While the pump is live, ALL jitter-buffer access must go through this
wrapper (it shares the receiver thread's lock); touching the underlying
JitterBuffer directly is a data race.  The reference has no transport
layer (its decoder CLI reads a file and simulates loss,
reference: lyra/cli_example/decoder_main_lib.cc:86-219); this is the
deployment-scale equivalent.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from lyra_tpu.tools.jitter_buffer import JitterBuffer
from lyra_tpu.utils import native

HEADER_BYTES = 6  # 2 B slot + 4 B seq, big-endian


class UdpIngest:
    def __init__(self, jb: JitterBuffer, port: int = 0):
        """Binds 0.0.0.0:`port` (0 = ephemeral, read `self.port`) and
        starts the native receiver thread over `jb`."""
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        max_payload = lib.lyra_pump_max_datagram() - HEADER_BYTES
        if jb.packet_size > max_payload:
            # The pump's receive buffers would let the kernel truncate
            # larger datagrams (counted as malformed, never filed) — a
            # buffer sized for packets that can't arrive intact is
            # misconfiguration, so fail at construction.
            raise ValueError(
                f"jitter buffer packet_size {jb.packet_size} exceeds the "
                f"pump's max payload {max_payload}")
        self._lib = lib
        self._jb = jb  # keepalive: the pump thread dereferences its handle
        self._h = lib.lyra_pump_create(jb._h, port)
        if not self._h:
            raise RuntimeError(f"UDP pump failed to bind port {port}")
        self.port = lib.lyra_pump_port(self._h)
        self.capacity = jb.capacity
        self.packet_size = jb.packet_size

    def close(self) -> None:
        """Stop the receiver thread and close the socket (idempotent).
        The jitter buffer itself stays valid and single-thread-usable."""
        h = getattr(self, "_h", None)
        if h:
            self._lib.lyra_pump_destroy(h)
            self._h = None

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _check_open(self):
        if not getattr(self, "_h", None):
            raise RuntimeError("UDP pump is closed")

    def add_stream(self, stream: int, start_seq: int = 0,
                   playout_delay: int = 0) -> None:
        self._check_open()
        if self._lib.lyra_pump_add_stream(self._h, stream, start_seq,
                                          playout_delay):
            raise ValueError(f"bad stream slot {stream} / delay")

    def remove_stream(self, stream: int) -> None:
        self._check_open()
        if self._lib.lyra_pump_remove_stream(self._h, stream):
            raise ValueError(f"bad stream slot {stream}")

    def collect(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One tick: → (packets [capacity, packet_size] u8,
        received [capacity] bool, sizes [capacity] u8) — same contract as
        JitterBuffer.collect, serialized against the receiver thread."""
        self._check_open()
        out = np.zeros((self.capacity, self.packet_size), np.uint8)
        received = np.zeros(self.capacity, np.uint8)
        sizes = np.zeros(self.capacity, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        self._lib.lyra_pump_collect(
            self._h, out.ctypes.data_as(u8p),
            received.ctypes.data_as(u8p), sizes.ctypes.data_as(u8p))
        return out, received.astype(bool), sizes

    def stats(self) -> dict:
        """Pump-level counters; the per-reason drop breakdown
        (late/dup/overflow/inactive) lives in `jb_stats`.  malformed_drops
        counts datagrams shorter than the header or kernel-truncated past
        the pump's receive buffer — dropped, never filed as garbage."""
        self._check_open()
        datagrams = ctypes.c_int64()
        malformed = ctypes.c_int64()
        drops = ctypes.c_int64()
        self._lib.lyra_pump_stats(self._h, ctypes.byref(datagrams),
                                  ctypes.byref(malformed),
                                  ctypes.byref(drops))
        return {"datagrams": datagrams.value,
                "malformed_drops": malformed.value,
                "insert_drops": drops.value}

    def jb_stats(self) -> dict:
        """Jitter-buffer drop counters, read under the pump's lock (the
        receiver thread increments them; the raw JitterBuffer.stats would
        race while the pump is live)."""
        self._check_open()
        late, dup, over, inactive = (ctypes.c_int64() for _ in range(4))
        self._lib.lyra_pump_jb_stats(
            self._h, ctypes.byref(late), ctypes.byref(dup),
            ctypes.byref(over), ctypes.byref(inactive))
        return {"late_drops": late.value, "dup_drops": dup.value,
                "overflow_drops": over.value,
                "inactive_drops": inactive.value,
                "resyncs": int(self._lib.lyra_pump_jb_resyncs(self._h))}


class PcmIngest:
    """Native UDP ingest for the encode relay: one fixed-size PCM hop per
    datagram (6 B header + `payload_bytes` of int16 samples), freshest hop
    wins per slot.

    Mic audio wants no playout queue — the relay grid-aligns its own ticks
    and a superseded hop is worthless — so instead of a jitter buffer the
    pump keeps a per-slot latest-by-sequence staging row.  An older hop
    arriving after a newer one is a counted stale drop; a slot whose sender
    restarted at a lower sequence origin resyncs after 3 consecutive stale
    datagrams (the jitter buffer's recovery rule).  `collect_into()` once
    per tick fills the caller's audio matrix in place and reports which
    rows are fresh.  Reply routing works exactly as on the packet pump:
    the egress can ride this pump's socket (`UdpEgress.on_pump`) and sync
    its destination table from the accepted-uplink sources
    (`route_from_pump`)."""

    def __init__(self, capacity: int, payload_bytes: int, port: int = 0):
        """Binds 0.0.0.0:`port` (0 = ephemeral, read `self.port`) and
        starts the native receiver thread.  `payload_bytes` is exact —
        datagrams of any other size are malformed drops."""
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        self._h = lib.lyra_pcm_pump_create(port, capacity, payload_bytes)
        if not self._h:
            raise ValueError(
                f"PCM pump failed (bad capacity {capacity} / payload "
                f"{payload_bytes}, or port {port} unavailable)")
        self.port = lib.lyra_pump_port(self._h)
        self.capacity = capacity
        self.payload_bytes = payload_bytes

    def close(self) -> None:
        """Stop the receiver thread and close the socket (idempotent)."""
        h = getattr(self, "_h", None)
        if h:
            self._lib.lyra_pump_destroy(h)
            self._h = None

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _check_open(self):
        if not getattr(self, "_h", None):
            raise RuntimeError("PCM pump is closed")

    def collect_into(self, audio: np.ndarray) -> np.ndarray:
        """One tick: copy each fresh slot's latest hop into the matching
        row of `audio` (any dtype, row stride = payload_bytes, C-contiguous)
        and clear its fresh flag.  Rows with nothing fresh are left
        untouched — the caller decides what a silent tick means (serve_main
        zeroes them).  Returns fresh [capacity] bool."""
        self._check_open()
        if (not audio.flags.c_contiguous or not audio.flags.writeable
                or audio.nbytes != self.capacity * self.payload_bytes):
            raise ValueError(
                f"audio must be writable C-contiguous with "
                f"{self.capacity}x{self.payload_bytes} bytes, got "
                f"{audio.shape} {audio.dtype}")
        fresh = np.zeros(self.capacity, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        self._lib.lyra_pcm_pump_collect(
            self._h, audio.ctypes.data_as(u8p), fresh.ctypes.data_as(u8p))
        return fresh.astype(bool)

    def reset_slot(self, slot: int) -> None:
        """Slot churn: clear the slot's sequence clock, pending hop, and
        reply route so the next occupant inherits nothing."""
        self._check_open()
        if self._lib.lyra_pcm_pump_reset_slot(self._h, slot):
            raise ValueError(f"bad stream slot {slot}")

    def stats(self) -> dict:
        """datagrams = well-formed (accepted + stale); malformed_drops =
        wrong size / truncated / slot out of range; stale_drops =
        superseded-by-sequence; resyncs = sequence-origin adoptions."""
        self._check_open()
        counters = [ctypes.c_int64() for _ in range(4)]
        self._lib.lyra_pcm_pump_stats(self._h, *map(ctypes.byref, counters))
        return {"datagrams": counters[0].value,
                "malformed_drops": counters[1].value,
                "stale_drops": counters[2].value,
                "resyncs": counters[3].value}


def blast(port: int, n: int, payload_size: int, streams: int,
          seq0: int = 0) -> int:
    """Benchmark sender: `n` datagrams to 127.0.0.1:`port`, round-robin
    over `streams` slots, batched with sendmmsg so ingest measurements
    aren't limited by a Python sender.  Payloads up to the UDP maximum
    (PCM-hop-sized payloads drive the PCM pump).  Returns datagrams
    actually sent."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/")
    sent = lib.lyra_pump_blast2(port, n, payload_size, streams, seq0)
    if sent < 0:
        raise ValueError("bad blast args (payload too large or streams<=0)")
    return sent
