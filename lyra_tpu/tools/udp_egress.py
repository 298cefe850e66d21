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

    def send_range(self, wire: np.ndarray, sizes: np.ndarray, seq: int,
                   row0: int = 0, row1: Optional[int] = None,
                   count_unrouted: bool = True) -> int:
        """`send` restricted to rows [row0, row1) — the striped multi-core
        path: N egress objects send disjoint ranges of one matrix from
        worker threads (ctypes releases the GIL).  Headers carry absolute
        slot ids.  `count_unrouted=False` skips active-but-unrouted rows
        silently — the owner-partitioned reply path, where the same slot
        is routed on exactly one shard's egress."""
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
        if row1 is None:
            row1 = w8.shape[0]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.lyra_egress_send_range(
            self._h, w8.ctypes.data_as(u8p), sizes.ctypes.data_as(i32p),
            w8.shape[0], w8.shape[1], seq, row0, row1,
            1 if count_unrouted else 0)
        if n < 0:
            raise ValueError(
                "egress refused the tick: bad row range "
                f"[{row0}, {row1}) of {w8.shape[0]}, a size exceeding the "
                f"stride {w8.shape[1]}, or rows exceed capacity "
                f"{self.capacity}")
        return int(n)

    def route_from_table(self, ip_be: np.ndarray, port_be: np.ndarray,
                         routed: np.ndarray) -> int:
        """Authoritative bulk routing: slots with routed[i] get
        ip_be[i]:port_be[i] (network byte order, as copy_sources_owned
        emits), all other slots lose any route.  The shard-group reply
        path masks the merged source table down to owner == shard first.
        Returns slots routed."""
        self._check_open()
        ip_be = np.ascontiguousarray(ip_be, np.uint32)
        port_be = np.ascontiguousarray(port_be, np.uint16)
        routed = np.ascontiguousarray(routed, np.uint8)
        rows = ip_be.shape[0]
        if port_be.shape != (rows,) or routed.shape != (rows,):
            raise ValueError("route table arrays must share one length")
        n = self._lib.lyra_egress_route_from_table(
            self._h, rows,
            ip_be.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            port_be.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            routed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if n < 0:
            raise ValueError(f"route table rows {rows} exceed capacity "
                             f"{self.capacity}")
        return int(n)

    def route_from_pump(self, pump) -> int:
        """Reply routing: make the ingest pump's last-seen uplink source
        table authoritative for this egress (one native call — slots that
        have never spoken, or were cleared by slot churn, lose any route
        they had; keeping one would leak a new occupant's downlink to the
        departed caller).  The real-MCU shape: downlink goes back where
        the uplink came from.  Returns how many slots are now
        pump-routed."""
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


class MultiEgress:
    """Multi-core egress: N UdpEgress workers (each its own socket and
    stats) send disjoint row stripes of one tick matrix concurrently from
    a thread pool — ctypes releases the GIL around sendmmsg, so on an
    N-core host the fan-out runs N-wide.  Same send/set_dest/stats
    contract as a single UdpEgress.  Stripes are contiguous row ranges;
    destination updates go to every worker (a slot's stripe owner is an
    internal detail)."""

    def __init__(self, capacity: int, threads: int = 2,
                 dest: Optional[Tuple[str, int]] = None):
        if threads < 1:
            raise ValueError(f"need at least 1 send thread, got {threads}")
        import concurrent.futures

        self.capacity = capacity
        self.threads = threads
        self._workers = []
        try:
            for _ in range(threads):
                self._workers.append(UdpEgress(capacity, dest))
        except Exception:
            for w in self._workers:
                w.close()
            raise
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=threads, thread_name_prefix="lyra-egress")
        # Stripe bounds: worker k owns rows [bounds[k], bounds[k+1]).
        step = -(-capacity // threads)
        self._bounds = [min(capacity, k * step) for k in range(threads + 1)]

    def close(self) -> None:
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=True)
            self._pool = None
        for w in getattr(self, "_workers", []):
            w.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def set_dest(self, slot: int, host: str, port: int) -> None:
        for w in self._workers:
            w.set_dest(slot, host, port)

    def set_dest_all(self, host: str, port: int) -> None:
        for w in self._workers:
            w.set_dest_all(host, port)

    def send(self, wire: np.ndarray, sizes: np.ndarray, seq: int) -> int:
        """One tick's fan-out, striped across the workers.  Blocks until
        every stripe is handed to the kernel (the tick owns the send)."""
        if self._pool is None:
            raise RuntimeError("MultiEgress is closed")
        wire = np.ascontiguousarray(wire)
        sizes = np.ascontiguousarray(sizes, np.int32)
        futures = [
            self._pool.submit(w.send_range, wire, sizes, seq,
                              self._bounds[k], self._bounds[k + 1])
            for k, w in enumerate(self._workers)
            if self._bounds[k] < self._bounds[k + 1]
        ]
        return sum(f.result() for f in futures)

    def stats(self) -> dict:
        totals: dict = {}
        for w in self._workers:
            for k, v in w.stats().items():
                totals[k] = totals.get(k, 0) + v
        return totals


class ShardedReplyEgress:
    """Reply-mode egress over an ingest shard group: one on-pump egress
    per shard, owner-partitioned routing.

    Each slot's downlink must leave from the shard socket its uplink
    arrived on (a port-restricted/symmetric NAT maps per 5-tuple), so the
    group's merged source table (freshest shard wins, shared stamp clock)
    is split by owner: shard k's egress routes exactly the slots it owns
    and silently skips the rest — every active routed slot is sent by
    exactly one worker.  Sends run one thread per shard (GIL released).
    Unrouted active slots are counted here once per tick
    (`no_route_drops`), since per-worker no-dest counting would multiply
    them by the shard count."""

    def __init__(self, group):
        import concurrent.futures

        shards = group.shards
        self._group = group
        self.capacity = group.capacity
        self._egresses = []
        try:
            for pump in shards:
                self._egresses.append(UdpEgress.on_pump(pump, group.capacity))
        except Exception:
            for e in self._egresses:
                e.close()
            raise
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=len(shards), thread_name_prefix="lyra-reply")
        self._known = np.zeros(group.capacity, bool)
        self.no_route_drops = 0

    def close(self) -> None:
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=True)
            self._pool = None
        # On-pump egresses borrow shard fds: close before the group.
        for e in getattr(self, "_egresses", []):
            e.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def route_from_pump(self, pump) -> int:
        """Uniform with UdpEgress.route_from_pump so serving loops can
        treat single and sharded reply egress identically; `pump` must be
        this egress's own ingest group (it owns the source table)."""
        if pump is not self._group:
            raise ValueError(
                "ShardedReplyEgress routes from its own ingest group")
        return self.route_from_group()

    def route_from_group(self) -> int:
        """Sync every shard egress from the group's merged source table
        (authoritative: unowned slots are cleared per shard).  Call once
        per tick before send.  Returns slots routed group-wide."""
        ip, port, known, owner = self._group.copy_sources_owned()
        for k, e in enumerate(self._egresses):
            e.route_from_table(ip, port, known & (owner == k))
        self._known = known
        return int(known.sum())

    def send(self, wire: np.ndarray, sizes: np.ndarray, seq: int) -> int:
        """One tick's reply fan-out: every worker walks the full matrix,
        sending only the slots it routed.  Active slots no shard has heard
        from are counted in `no_route_drops`."""
        if self._pool is None:
            raise RuntimeError("ShardedReplyEgress is closed")
        wire = np.ascontiguousarray(wire)
        sizes = np.ascontiguousarray(sizes, np.int32)
        futures = [
            self._pool.submit(e.send_range, wire, sizes, seq,
                              0, None, False)
            for e in self._egresses
        ]
        n = sum(f.result() for f in futures)
        self.no_route_drops += int(
            ((sizes[: self._known.size] > 0) & ~self._known).sum())
        return n

    def stats(self) -> dict:
        totals: dict = {"no_route_drops": self.no_route_drops}
        for e in self._egresses:
            for k, v in e.stats().items():
                totals[k] = totals.get(k, 0) + v
        # Per-worker no-dest counting is disabled on this path (silent
        # skips); the honest figure is the group-level one.
        totals.pop("no_dest_drops", None)
        return totals
