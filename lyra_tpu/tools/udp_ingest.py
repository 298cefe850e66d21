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
    def __init__(self, jb: JitterBuffer, port: int = 0, *, _shard_of=None):
        """Binds 0.0.0.0:`port` (0 = ephemeral, read `self.port`) and
        starts the native receiver thread over `jb`.  `_shard_of` is the
        ShardedUdpIngest constructor's seam: the founding shard passes
        `()`, followers pass the founder, and the pump then binds with
        SO_REUSEPORT and (for followers) shares the founder's
        source-freshness clock."""
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
        if _shard_of is None:
            self._h = lib.lyra_pump_create(jb._h, port)
        else:
            # Keepalive: a follower's receiver thread stamps source
            # freshness through the FOUNDER's shared clock, so the founder
            # must outlive every follower (GC refcounting then finalizes
            # the founder last even if the group is dropped unclosed).
            self._founder = _shard_of if _shard_of != () else None
            leader = _shard_of._h if _shard_of != () else None
            self._h = lib.lyra_pump_create_shard(jb._h, port, leader)
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

    def set_adaptive(self, min_delay: int, max_delay: int,
                     window: int = 100) -> None:
        """Adaptive playout delay (JitterBuffer.set_adaptive) configured
        under the pump lock."""
        self._check_open()
        if self._lib.lyra_pump_set_adaptive(self._h, min_delay, max_delay,
                                            window):
            raise ValueError(
                f"bad adaptive bounds [{min_delay}, {max_delay}] / "
                f"window {window}")

    def set_red(self, offset: int) -> None:
        """Switch the wire framing to RED with redundancy distance
        `offset`: every datagram for sequence t must then carry
        [1B len][packet t][1B len][packet t-offset] (packet.build_red),
        and a lost datagram is healed by its successor's redundant copy
        instead of concealed.  0 restores plain framing.  A wire contract
        for the whole port — set before traffic flows, and give every
        stream a playout delay of at least offset+1 ticks or the copy
        arrives after its sequence was due."""
        self._check_open()
        if self._lib.lyra_pump_set_red(self._h, offset):
            raise ValueError(f"bad RED offset {offset} (need 0..8)")

    @property
    def red_heals(self) -> int:
        """Redundant copies that filled a real hole (locked read)."""
        self._check_open()
        return int(self._lib.lyra_pump_red_heals(self._h))

    def adapt_stats(self) -> dict:
        """Adaptive-delay decisions + current latency position, read under
        the pump lock (JitterBuffer.adapt_stats contract)."""
        self._check_open()
        vals = [ctypes.c_int64() for _ in range(6)]
        self._lib.lyra_pump_jb_adapt_stats(self._h,
                                           *map(ctypes.byref, vals))
        grows, shrinks, dmin, dmax, dsum, active = (v.value for v in vals)
        return {"grows": grows, "shrinks": shrinks,
                "delay_min": dmin, "delay_max": dmax,
                "delay_mean": (dsum / active) if active else 0.0,
                "active_streams": active}

    def heads(self) -> np.ndarray:
        """Playout schedule (JitterBuffer.heads contract: int64 [capacity],
        -1 for inactive slots), read under the pump lock — what a migration
        snapshot carries so the restored host locks on immediately."""
        self._check_open()
        out = np.empty(self.capacity, np.int64)
        if self._lib.lyra_pump_jb_heads(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))):
            raise RuntimeError("heads export failed (wrong pump kind?)")
        return out

    def adapt_export(self):
        """Per-slot adaptive evidence (JitterBuffer.adapt_export contract),
        read under the pump lock — rides migration snapshots next to
        heads() so a restored adaptive host resumes each caller's learned
        latency position."""
        self._check_open()
        delays = np.empty(self.capacity, np.int64)
        votes = np.empty(self.capacity, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        if self._lib.lyra_pump_jb_adapt_export(
                self._h, delays.ctypes.data_as(i64p),
                votes.ctypes.data_as(i64p)):
            raise RuntimeError("adapt export failed (wrong pump kind?)")
        return delays, votes

    def adapt_seed(self, stream: int, delay0: int, votes: int = 0) -> None:
        """Re-seed one slot's learned delay + shrink streak under the pump
        lock (JitterBuffer.adapt_seed contract)."""
        self._check_open()
        if self._lib.lyra_pump_jb_adapt_seed(self._h, stream, delay0,
                                             votes):
            raise ValueError(
                f"adapt_seed refused (slot {stream}, delay {delay0}: "
                "inactive slot, adaptive off, or negative inputs)")


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

    def __init__(self, capacity: int, payload_bytes: int, port: int = 0, *,
                 _shard_of=None):
        """Binds 0.0.0.0:`port` (0 = ephemeral, read `self.port`) and
        starts the native receiver thread.  `payload_bytes` is exact —
        datagrams of any other size are malformed drops.  `_shard_of` as
        on UdpIngest (ShardedPcmIngest's constructor seam)."""
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        if _shard_of is None:
            self._h = lib.lyra_pcm_pump_create(port, capacity, payload_bytes)
        else:
            # Keepalive: followers stamp through the founder's shared
            # clock, so the founder must outlive them (see UdpIngest).
            self._founder = _shard_of if _shard_of != () else None
            leader = _shard_of._h if _shard_of != () else None
            self._h = lib.lyra_pcm_pump_create_shard(
                port, capacity, payload_bytes, leader)
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


class SinkIngest:
    """Measurement-only receiver: the pump's receive machinery (poll +
    recvmmsg batches + length gate + header parse) with nothing filed.

    An A/B against a real pump on the same boot isolates the filing cost
    (payload copy, ring/staging bookkeeping, route learning) from the
    kernel/syscall floor — benchmarks/ingest_bench.py --decompose.  Every
    well-formed datagram is a counted drop; never serves."""

    def __init__(self, max_payload: int, port: int = 0):
        lib = native.load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        self._h = lib.lyra_sink_pump_create(port, HEADER_BYTES + max_payload)
        if not self._h:
            raise ValueError(
                f"sink pump failed (bad max_payload {max_payload}, or port "
                f"{port} unavailable)")
        self.port = lib.lyra_pump_port(self._h)

    def close(self) -> None:
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

    def stats(self) -> dict:
        """Same counters as UdpIngest.stats; every well-formed datagram
        lands in insert_drops (the sink files nothing)."""
        if not getattr(self, "_h", None):
            raise RuntimeError("sink pump is closed")
        datagrams = ctypes.c_int64()
        malformed = ctypes.c_int64()
        drops = ctypes.c_int64()
        self._lib.lyra_pump_stats(self._h, ctypes.byref(datagrams),
                                  ctypes.byref(malformed),
                                  ctypes.byref(drops))
        return {"datagrams": datagrams.value,
                "malformed_drops": malformed.value,
                "insert_drops": drops.value}


class _ShardGroupBase:
    """Shared plumbing for SO_REUSEPORT ingest shard groups.

    A group is N pumps — each with its own buffer and lock — bound to ONE
    port with SO_REUSEPORT: the kernel hashes every flow (caller 4-tuple)
    to one member socket, so a caller's datagrams always land on the same
    shard and the per-packet hot path never crosses shards.  On a
    multi-core host each receiver thread rides its own core; the per-tick
    merge back into one dense matrix is a single native call
    (lyra_pump_collect_merged / lyra_pcm_pump_collect_merged).  The
    reference is single-threaded per codec instance by design
    (reference: lyra/tflite_model_wrapper.cc:51); this is the serving-host
    scale-out of the transport tier the batched device engine needs fed.
    """

    def __init__(self, shards):
        if not shards:
            raise ValueError("a shard group needs at least one shard")
        self._shards = shards
        self.num_shards = len(shards)
        self.port = shards[0].port
        self.capacity = shards[0].capacity
        self._handles = (ctypes.c_void_p * len(shards))(
            *[s._h for s in shards])

    @property
    def shards(self):
        """The member pumps (e.g. for per-shard reply egress)."""
        return list(self._shards)

    def close(self) -> None:
        # Followers first: their receiver threads stamp through the
        # FOUNDER's (shards[0]) shared freshness clock, and closing the
        # founder's socket re-hashes its live flows onto the survivors —
        # destroying it first would leave followers dereferencing freed
        # memory in the teardown window.
        for s in reversed(self._shards):
            s.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _check_open(self):
        for s in self._shards:
            s._check_open()

    def copy_sources_owned(self):
        """Merged reply-source table: per slot the freshest uplink source
        across shards (shared stamp clock), with `owner[i]` = shard index
        that heard it last (-1 = never spoke).  → (ip_be u32, port_be u16,
        known bool, owner i32), each [capacity]."""
        self._check_open()
        lib = self._shards[0]._lib
        cap = self.capacity
        ip = np.zeros(cap, np.uint32)
        port = np.zeros(cap, np.uint16)
        known = np.zeros(cap, np.uint8)
        owner = np.zeros(cap, np.int32)
        n = lib.lyra_pump_copy_sources_owned(
            self._handles, self.num_shards, cap,
            ip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            port.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            known.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            owner.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise RuntimeError("merged source read failed")
        return ip, port, known.astype(bool), owner


class ShardedUdpIngest(_ShardGroupBase):
    """Codec-packet ingest shard group: N (jitter buffer, pump) pairs on
    one SO_REUSEPORT port.  Same collect/admission/stats contract as a
    single UdpIngest; every shard's jitter buffer is advanced by every
    collect so a flow migrating shards (NAT rebind) stays on the group's
    playout clock."""

    def __init__(self, capacity: int, packet_size: int, depth: int = 8,
                 shards: int = 2, port: int = 0):
        if shards < 1:
            raise ValueError(f"need at least 1 shard, got {shards}")
        members = []
        founder = None
        try:
            for _ in range(shards):
                jb = JitterBuffer(capacity, packet_size, depth)
                member = UdpIngest(
                    jb, port if founder is None else founder.port,
                    _shard_of=(() if founder is None else founder))
                members.append(member)
                founder = founder or member
        except Exception:
            for m in reversed(members):  # followers first (shared clock)
                m.close()
            raise
        super().__init__(members)
        self.packet_size = packet_size

    def add_stream(self, stream: int, start_seq: int = 0,
                   playout_delay: int = 0) -> None:
        """Admission goes to every shard — which shard a caller's flow
        hashes to is the kernel's choice, so all must be ready."""
        for s in self._shards:
            s.add_stream(stream, start_seq, playout_delay)

    def remove_stream(self, stream: int) -> None:
        for s in self._shards:
            s.remove_stream(stream)

    def collect(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One tick, merged across shards (one native call): → (packets
        [capacity, packet_size] u8, received [capacity] bool,
        sizes [capacity] u8)."""
        self._check_open()
        out = np.zeros((self.capacity, self.packet_size), np.uint8)
        received = np.zeros(self.capacity, np.uint8)
        sizes = np.zeros(self.capacity, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = self._shards[0]._lib.lyra_pump_collect_merged(
            self._handles, self.num_shards, self.capacity, self.packet_size,
            out.ctypes.data_as(u8p), received.ctypes.data_as(u8p),
            sizes.ctypes.data_as(u8p))
        if n < 0:
            raise RuntimeError("merged collect failed (mixed pump kinds?)")
        return out, received.astype(bool), sizes

    def stats(self) -> dict:
        """Summed pump counters across shards."""
        totals: dict = {}
        for s in self._shards:
            for k, v in s.stats().items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def jb_stats(self) -> dict:
        """Summed jitter-buffer drop counters across shards."""
        totals: dict = {}
        for s in self._shards:
            for k, v in s.jb_stats().items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def set_adaptive(self, min_delay: int, max_delay: int,
                     window: int = 100) -> None:
        """Adaptive playout delay on every shard's buffer.  A slot's flow
        lives on one shard, so only that shard observes its margins and
        adapts its delay; the others see a silent sender (no decision)."""
        for s in self._shards:
            s.set_adaptive(min_delay, max_delay, window)

    def set_red(self, offset: int) -> None:
        """RED wire framing on every member (the kernel picks a flow's
        shard, so all must parse the same framing — see
        UdpIngest.set_red)."""
        for s in self._shards:
            s.set_red(offset)

    @property
    def red_heals(self) -> int:
        return sum(s.red_heals for s in self._shards)

    def adapt_stats(self) -> dict:
        """Group adaptive stats, same keys as UdpIngest.adapt_stats.
        Every shard tracks every admitted slot but only a slot's HOME
        shard (where its flow hashes) ever adapts its delay — a naive
        reduction over shards would report the stale initial copies — so
        the native reader resolves each slot's home shard by source
        freshness and reads min/max/mean from there
        (lyra_pump_adapt_stats_merged)."""
        self._check_open()
        vals = [ctypes.c_int64() for _ in range(6)]
        rc = self._shards[0]._lib.lyra_pump_adapt_stats_merged(
            self._handles, self.num_shards, self.capacity,
            *map(ctypes.byref, vals))
        if rc != 0:
            raise RuntimeError("merged adapt stats failed")
        grows, shrinks, dmin, dmax, dsum, active = (v.value for v in vals)
        return {"grows": grows, "shrinks": shrinks,
                "delay_min": dmin, "delay_max": dmax,
                "delay_mean": (dsum / active) if active else 0.0,
                "active_streams": active}

    def heads(self) -> np.ndarray:
        """Group playout schedule (JitterBuffer.heads contract).  Heads
        advance in lockstep across shards (merged collect drains every
        member), but a resync repoints only a slot's HOME shard, so the
        native reader resolves each slot's owner by source freshness —
        the same rule as adapt_stats (lyra_pump_jb_heads_merged)."""
        self._check_open()
        out = np.empty(self.capacity, np.int64)
        if self._shards[0]._lib.lyra_pump_jb_heads_merged(
                self._handles, self.num_shards, self.capacity,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))):
            raise RuntimeError("merged heads export failed")
        return out

    def adapt_export(self):
        """Group adaptive evidence (UdpIngest.adapt_export contract): each
        slot's learned delay/streak read from its HOME shard — the one its
        flow hashes to, the only one whose margins ever adapt — resolved
        by source freshness like adapt_stats/heads
        (lyra_pump_jb_adapt_export_merged)."""
        self._check_open()
        delays = np.empty(self.capacity, np.int64)
        votes = np.empty(self.capacity, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        if self._shards[0]._lib.lyra_pump_jb_adapt_export_merged(
                self._handles, self.num_shards, self.capacity,
                delays.ctypes.data_as(i64p), votes.ctypes.data_as(i64p)):
            raise RuntimeError("merged adapt export failed")
        return delays, votes

    def adapt_seed(self, stream: int, delay0: int, votes: int = 0) -> None:
        """Seed every shard (like add_stream: which shard a restored
        caller's flow will hash to is the kernel's choice, so all must
        hold the learned position)."""
        for s in self._shards:
            s.adapt_seed(stream, delay0, votes)


class ShardedPcmIngest(_ShardGroupBase):
    """PCM-hop ingest shard group (encode-relay uplink): N PcmPumps on one
    SO_REUSEPORT port, merged latest-wins staging per tick."""

    def __init__(self, capacity: int, payload_bytes: int, shards: int = 2,
                 port: int = 0):
        if shards < 1:
            raise ValueError(f"need at least 1 shard, got {shards}")
        members = []
        founder = None
        try:
            for _ in range(shards):
                member = PcmIngest(
                    capacity, payload_bytes,
                    port if founder is None else founder.port,
                    _shard_of=(() if founder is None else founder))
                members.append(member)
                founder = founder or member
        except Exception:
            for m in reversed(members):  # followers first (shared clock)
                m.close()
            raise
        super().__init__(members)
        self.payload_bytes = payload_bytes

    def collect_into(self, audio: np.ndarray) -> np.ndarray:
        """One merged tick: fill fresh rows of `audio` in place (contract
        of PcmIngest.collect_into), first staging shard wins a slot, all
        shards' fresh flags clear.  Returns fresh [capacity] bool."""
        self._check_open()
        if (not audio.flags.c_contiguous or not audio.flags.writeable
                or audio.nbytes != self.capacity * self.payload_bytes):
            raise ValueError(
                f"audio must be writable C-contiguous with "
                f"{self.capacity}x{self.payload_bytes} bytes, got "
                f"{audio.shape} {audio.dtype}")
        fresh = np.zeros(self.capacity, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = self._shards[0]._lib.lyra_pcm_pump_collect_merged(
            self._handles, self.num_shards,
            audio.ctypes.data_as(u8p), fresh.ctypes.data_as(u8p))
        if n < 0:
            raise RuntimeError("merged PCM collect failed")
        return fresh.astype(bool)

    def reset_slot(self, slot: int) -> None:
        for s in self._shards:
            s.reset_slot(slot)

    def stats(self) -> dict:
        totals: dict = {}
        for s in self._shards:
            for k, v in s.stats().items():
                totals[k] = totals.get(k, 0) + v
        return totals


def blast(port: int, n: int, payload_size: int, streams: int,
          seq0: int = 0, sources: int = 1) -> int:
    """Benchmark sender: `n` datagrams to 127.0.0.1:`port`, round-robin
    over `streams` slots, batched with sendmmsg so ingest measurements
    aren't limited by a Python sender.  Payloads up to the UDP maximum
    (PCM-hop-sized payloads drive the PCM pump).  `sources` > 1 rotates
    that many sender sockets with per-slot affinity (slot ≡ source mod
    `sources`) so a SO_REUSEPORT shard group actually sees multiple flows
    — one source socket is one flow and would land on one shard.  Returns
    datagrams actually sent."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/")
    if sources == 1:
        sent = lib.lyra_pump_blast2(port, n, payload_size, streams, seq0)
    else:
        sent = lib.lyra_pump_blast_multi(port, n, payload_size, streams,
                                         seq0, sources)
    if sent < 0:
        raise ValueError("bad blast args (payload too large or streams<=0)")
    return sent
