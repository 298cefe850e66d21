import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""Ingest throughput: native UDP pump vs a per-datagram Python loop.

A fleet of N streams produces N x 50 datagrams/s at the decoder's front
door; this measures how fast each ingest path can file real loopback
datagrams into the jitter buffer (header parse + insert), using the
native sendmmsg blaster so the sender is not the bottleneck.  Both
receivers run against kernel socket buffers sized the same; the box has
ONE host core, so the native number is conservative (the sender thread
timeshares with the receiver).

--pcm measures the encode relay's front door instead: 640 B PCM hops
into the native PCM pump (latest-wins staging, udp_pump.cc PcmPump) vs
the per-datagram Python drain serve_main's python ingest uses.

--shards=N runs the SO_REUSEPORT shard group instead of one pump, with a
multi-source blaster so the kernel's flow hash actually distributes.  On
a 1-core box the group measures ~the single pump (all receiver threads
timeshare one core); on an N-core serving host each shard rides its own
core, so host capacity is measured-per-core x cores.

--decompose is the speed-of-light probe: it interleaves the full pump
against the native sink (identical poll + recvmmsg + header-parse
machinery, nothing filed — udp_pump.cc SinkPump) over several rounds, so
the sink's rate is the kernel/syscall floor on this boot and the delta to
the full path is everything this code adds (payload copy, jitter-buffer /
staging bookkeeping, route learning).  Interleaving matters: loopback
throughput drifts minute-to-minute, so back-to-back blocks would measure
the weather, not the delta.

Usage:  python benchmarks/ingest_bench.py [n_datagrams] [--pcm]
        [--shards=N] [--decompose]
"""

import socket
import sys
import time

import numpy as np

from lyra_tpu.tools.jitter_buffer import JitterBuffer
from lyra_tpu.tools.udp_ingest import (HEADER_BYTES, PcmIngest, SinkIngest,
                                       UdpIngest, blast)

STREAMS = 8192
# Deep enough that the default 200k-datagram run (25 seqs/stream) never
# overflows a ring: every insert must take the full payload-copy path, or
# the measurement would mostly time the overflow early-exit.
DEPTH = 32
PAYLOAD = 8  # 3.2 kbps packet
PCM_PAYLOAD = 640  # one 20 ms hop of int16 @16 kHz


def _settle(pump, sent, t0):
    """Progress-based stop: the kernel may shed under overload, so wait
    until the filed count stops advancing, then report what was actually
    processed over the active window."""
    last, t_last = -1, time.perf_counter()
    while True:
        got = pump.stats()["datagrams"]
        now = time.perf_counter()
        if got >= sent:
            t_last = now
            break
        if got != last:
            last, t_last = got, now
        elif now - t_last > 0.5:
            break
        time.sleep(0.01)
    return sent, pump.stats()["datagrams"], t_last - t0


def _drain_native(n):
    jb = JitterBuffer(capacity=STREAMS, packet_size=23, depth=DEPTH)
    with UdpIngest(jb) as pump:
        for s in range(STREAMS):
            pump.add_stream(s)
        t0 = time.perf_counter()
        sent = blast(pump.port, n, PAYLOAD, STREAMS)
        return _settle(pump, sent, t0)


def _drain_sharded(n, shards):
    from lyra_tpu.tools.udp_ingest import ShardedUdpIngest

    with ShardedUdpIngest(capacity=STREAMS, packet_size=23, depth=DEPTH,
                          shards=shards) as group:
        for s in range(STREAMS):
            group.add_stream(s)
        t0 = time.perf_counter()
        # One source per shard-sized slice keeps flows distributed without
        # paying per-datagram source churn; 4x shards gives the hash room.
        sent = blast(group.port, n, PAYLOAD, STREAMS, sources=4 * shards)
        sent_ret = _settle(group, sent, t0)
        per = [s.stats()["datagrams"] for s in group.shards]
        print(f"  shard datagram split: {per}", flush=True)
        return sent_ret


def _drain_pcm_sharded(n, shards):
    from lyra_tpu.tools.udp_ingest import ShardedPcmIngest

    with ShardedPcmIngest(capacity=STREAMS, payload_bytes=PCM_PAYLOAD,
                          shards=shards) as group:
        t0 = time.perf_counter()
        sent = blast(group.port, n, PCM_PAYLOAD, STREAMS,
                     sources=4 * shards)
        sent_ret = _settle(group, sent, t0)
        per = [s.stats()["datagrams"] for s in group.shards]
        print(f"  shard datagram split: {per}", flush=True)
        return sent_ret


def _drain_python(n):
    """The asyncio-style baseline: one Python-level recv + parse + insert
    per datagram (the examples/udp_call.py receive path)."""
    jb = JitterBuffer(capacity=STREAMS, packet_size=23, depth=DEPTH)
    for s in range(STREAMS):
        jb.add_stream(s)
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 * 1024 * 1024)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(0.5)
    port = rx.getsockname()[1]
    t0 = time.perf_counter()
    sent = blast(port, n, PAYLOAD, STREAMS)
    got = 0
    t_last = time.perf_counter()
    try:
        while got < sent:
            dgram = rx.recvfrom(64)[0]
            slot = int.from_bytes(dgram[:2], "big")
            seq = int.from_bytes(dgram[2:HEADER_BYTES], "big")
            jb.insert(slot, seq, dgram[HEADER_BYTES:])
            got += 1
            t_last = time.perf_counter()
    except socket.timeout:
        pass
    rx.close()
    return sent, got, t_last - t0


def _drain_pcm_native(n):
    with PcmIngest(STREAMS, PCM_PAYLOAD) as pump:
        t0 = time.perf_counter()
        sent = blast(pump.port, n, PCM_PAYLOAD, STREAMS)
        return _settle(pump, sent, t0)


def _drain_pcm_python(n):
    """serve_main's --ingest=python encode-relay drain: one recvfrom +
    frombuffer copy into the audio matrix per datagram."""
    audio = np.zeros((STREAMS, PCM_PAYLOAD // 2), np.int16)
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 * 1024 * 1024)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(0.5)
    port = rx.getsockname()[1]
    t0 = time.perf_counter()
    sent = blast(port, n, PCM_PAYLOAD, STREAMS)
    got = 0
    t_last = time.perf_counter()
    try:
        while got < sent:
            dgram = rx.recvfrom(4096)[0]
            slot = int.from_bytes(dgram[:2], "big")
            if len(dgram) != HEADER_BYTES + PCM_PAYLOAD or slot >= STREAMS:
                continue
            audio[slot] = np.frombuffer(dgram[HEADER_BYTES:], np.int16)
            got += 1
            t_last = time.perf_counter()
    except socket.timeout:
        pass
    rx.close()
    return sent, got, t_last - t0


def _drain_sink(n, payload):
    with SinkIngest(max_payload=payload) as pump:
        t0 = time.perf_counter()
        sent = blast(pump.port, n, payload, STREAMS)
        return _settle(pump, sent, t0)


def _decompose(n, pcm):
    """Interleaved sink-vs-full rounds; report per-round rates and the
    medians, so the filing-cost share is read off same-weather pairs."""
    payload = PCM_PAYLOAD if pcm else PAYLOAD
    full = _drain_pcm_native if pcm else _drain_native
    rounds = 5
    rates = {"sink (syscall floor)": [], "full pump": []}
    for r in range(rounds):
        for name, fn in (("sink (syscall floor)",
                          lambda k: _drain_sink(k, payload)),
                         ("full pump", full)):
            sent, got, dt = fn(n)
            rate = got / dt if dt > 0 else 0.0
            rates[name].append(rate)
            print(f"  round {r}: {name:22s} {got}/{sent} in {dt:.3f} s = "
                  f"{rate / 1e3:.0f}k pkts/s", flush=True)
    import statistics
    floor = statistics.median(rates["sink (syscall floor)"])
    fullr = statistics.median(rates["full pump"])
    print(f"median sink   : {floor / 1e3:.0f}k pkts/s  (kernel/syscall "
          f"floor incl. header parse)")
    print(f"median full   : {fullr / 1e3:.0f}k pkts/s  "
          f"({fullr / 50:,.0f} real-time streams)")
    if fullr > 0:
        print(f"filing cost   : {100 * (1 - fullr / floor):.1f}% of the "
              f"floor rate — the share this code adds over recvmmsg itself")


def main():
    shards = 0
    args = []
    pcm = False
    decompose = False
    for a in sys.argv[1:]:
        if a == "--pcm":
            pcm = True
        elif a == "--decompose":
            decompose = True
        elif a.startswith("--shards="):
            shards = int(a.split("=", 1)[1])
        else:
            args.append(a)
    n = int(args[0]) if args else 200_000
    if decompose:
        _decompose(n, pcm)
        return
    if shards:
        name = f"sharded {'pcm ' if pcm else ''}group x{shards}"
        fn = ((lambda n: _drain_pcm_sharded(n, shards)) if pcm else
              (lambda n: _drain_sharded(n, shards)))
        paths = ((name, fn),)
    elif pcm:
        paths = (("native pcm pump", _drain_pcm_native),
                 ("python pcm loop", _drain_pcm_python))
    else:
        paths = (("native pump", _drain_native),
                 ("python loop", _drain_python))
    for name, fn in paths:
        sent, got, dt = fn(n)
        rate = got / dt if dt > 0 else 0.0
        streams_rt = rate / 50.0  # 50 packets/s per real-time stream
        print(f"{name}: {got}/{sent} datagrams in {dt:.3f} s = "
              f"{rate / 1e3:.0f}k pkts/s (= {streams_rt:,.0f} real-time "
              f"streams of ingest)", flush=True)


if __name__ == "__main__":
    main()
