"""Native UDP egress: the serving tick's wire matrix → datagrams with zero
per-packet Python.

ctypes facade over native/udp_egress.cc — the send-side twin of
`tools/udp_ingest.py`.  A serving tick ends with a dense wire matrix
([capacity, stride] bytes + per-slot sizes); fanning it out one
`socket.sendto` at a time is per-packet Python, the exact bottleneck class
the ingest pump removed from the receive side.  `send()` issues the whole
tick as sendmmsg batches: the 6-byte header (2 B slot + 4 B big-endian
sequence, the examples/udp_call.py layout) is built natively and the
payload leaves straight from the caller's matrix.

Per-slot routing (`set_dest`) is the production shape — each participant's
transport address; `set_dest_all` is the single-sink --echo case.  Kernel
backpressure and unrouted active slots are counted drops
(`stats()`), never exceptions out of a serving tick; a size exceeding the
matrix stride is refused loudly (caller geometry bug).

The reference has no transport layer (its CLIs read/write files,
reference: lyra/cli_example/decoder_main_lib.cc:86-219); this is the
deployment-scale equivalent.
"""

from __future__ import annotations

import ctypes
import socket
from typing import Optional, Tuple

import numpy as np

from lyra_tpu.utils import native

HEADER_BYTES = 6  # 2 B slot + 4 B seq, big-endian


def _resolve(host: str) -> bytes:
    """Dotted-quad bytes for the native side (hostnames resolved here —
    inet_pton in C takes numeric addresses only)."""
    return socket.gethostbyname(host).encode()


class UdpEgress:
    def __init__(self, capacity: int,
                 dest: Optional[Tuple[str, int]] = None, *, _pump=None):
        """One socket routing up to `capacity` slots; `dest` routes every
        slot to one sink (the --echo case).  Capacity is bounded by the
        2-byte wire slot field (a larger table would alias slots in the
        header — refused loudly)."""
        if not 0 < capacity <= 65536:
            raise ValueError(
                f"capacity {capacity} outside the 2-byte wire slot field "
                "(1..65536)")
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        if _pump is not None:
            _pump._check_open()
            self._h = lib.lyra_egress_create_on_pump(_pump._h, capacity)
        else:
            self._h = lib.lyra_egress_create(capacity)
        if not self._h:
            raise RuntimeError("UDP egress socket creation failed")
        # Keepalive ordering: an on-pump egress borrows the pump's fd, so
        # the pump must outlive this object (close() before pump.close()).
        self._pump_keepalive = _pump
        self.capacity = capacity
        if dest is not None:
            self.set_dest_all(*dest)

    @classmethod
    def on_pump(cls, pump, capacity: int) -> "UdpEgress":
        """Egress on the ingest pump's own socket: downlink leaves from
        the exact address:port the uplink was sent to, which a
        port-restricted/symmetric NAT requires (its mapping is per
        5-tuple) — the reply-mode transport shape.  Close this egress
        before the pump."""
        return cls(capacity, _pump=pump)

    def close(self) -> None:
        h = getattr(self, "_h", None)
        if h:
            self._lib.lyra_egress_destroy(h)
            self._h = None

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _check_open(self):
        if not getattr(self, "_h", None):
            raise RuntimeError("UDP egress is closed")

    def set_dest(self, slot: int, host: str, port: int) -> None:
        """Route `slot`'s datagrams to host:port (per-participant
        addressing)."""
        self._check_open()
        if self._lib.lyra_egress_set_dest(self._h, slot, _resolve(host),
                                          port):
            raise ValueError(f"bad egress destination {host}:{port} "
                             f"for slot {slot}")

    def set_dest_all(self, host: str, port: int) -> None:
        self._check_open()
        if self._lib.lyra_egress_set_dest(self._h, -1, _resolve(host), port):
            raise ValueError(f"bad egress destination {host}:{port}")

    def send(self, wire: np.ndarray, sizes: np.ndarray, seq: int) -> int:
        """One tick's fan-out: a datagram per slot with sizes[slot] > 0,
        payload = wire[slot, :sizes[slot]].  `wire` is any C-contiguous
        2-D array (int16 PCM hops reinterpret as bytes); returns datagrams
        handed to the kernel."""
        self._check_open()
        wire = np.ascontiguousarray(wire)
        w8 = wire.view(np.uint8) if wire.dtype != np.uint8 else wire
        if w8.ndim != 2:
            raise ValueError(f"wire must be 2-D, got shape {wire.shape}")
        sizes = np.ascontiguousarray(sizes, np.int32)
        if sizes.shape != (w8.shape[0],):
            raise ValueError(
                f"sizes shape {sizes.shape} does not match {w8.shape[0]} "
                "wire rows")
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.lyra_egress_send(
            self._h, w8.ctypes.data_as(u8p), sizes.ctypes.data_as(i32p),
            w8.shape[0], w8.shape[1], seq)
        if n < 0:
            raise ValueError(
                "egress refused the tick: a size exceeds the wire stride "
                f"({int(sizes.max())} > {w8.shape[1]}) or rows exceed "
                f"capacity ({w8.shape[0]} > {self.capacity})")
        return int(n)

    def route_from_pump(self, pump) -> int:
        """Reply routing: copy the ingest pump's last-seen uplink source
        per slot into this egress's destination table (one native call —
        slots that have never spoken keep their existing route).  The
        real-MCU shape: downlink goes back where the uplink came from.
        Returns how many slots are now pump-routed."""
        self._check_open()
        pump._check_open()
        n = self._lib.lyra_egress_route_from_pump(self._h, pump._h)
        if n < 0:
            raise RuntimeError("reply-route sync failed")
        return int(n)

    def stats(self) -> dict:
        """sent = datagrams handed to the kernel; no_dest_drops = active
        slots with no route; kernel_drops = sendmmsg backpressure."""
        self._check_open()
        sent, no_dest, kernel = (ctypes.c_int64() for _ in range(3))
        self._lib.lyra_egress_stats(self._h, ctypes.byref(sent),
                                    ctypes.byref(no_dest),
                                    ctypes.byref(kernel))
        return {"sent": sent.value, "no_dest_drops": no_dest.value,
                "kernel_drops": kernel.value}
