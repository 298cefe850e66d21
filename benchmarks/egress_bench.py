import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""Egress throughput: native sendmmsg fan-out vs a per-datagram Python loop.

A serving tick ends with a dense wire matrix; the downlink side must fan
it out as one datagram per active slot — streams x 50 datagrams/s, the
mirror image of the ingest problem (ingest_bench.py).  This measures how
fast each path can push a full fleet tick of real loopback datagrams:
per-tick wall time for `UdpEgress.send` (header build + sendmmsg batches,
payload zero-copy from the matrix) vs the Python `sendto` loop.  The
receiver socket is deliberately never drained: the kernel drops at the
receive buffer, which does not change the sender-side cost being measured.

--threads=N also times MultiEgress (striped workers, each its own socket,
sendmmsg in parallel from a thread pool — ctypes releases the GIL).  On a
1-core box the stripes timeshare; on an N-core host each rides its own
core, so host downlink capacity is measured-per-core x cores.

The "floor" row is the speed-of-light bound: the native blaster sends the
same datagram count/size as pre-built single-iovec sendmmsg batches with
only the 6 header bytes written per datagram — no destination table, no
payload gather from the tick matrix, no stats.  The egress's distance to
it is what routing + the 2-iovec gather cost.

Usage:  python benchmarks/egress_bench.py [streams] [ticks] [payload]
        [--threads=N]
"""

import socket
import time

import numpy as np

from lyra_tpu.tools.udp_egress import MultiEgress, UdpEgress

args = [a for a in sys.argv[1:] if not a.startswith("--")]
THREADS = 0
for a in sys.argv[1:]:
    if a.startswith("--threads="):
        THREADS = int(a.split("=", 1)[1])
STREAMS = int(args[0]) if args else 8192
TICKS = int(args[1]) if len(args) > 1 else 25
PAYLOAD = int(args[2]) if len(args) > 2 else 8  # 3.2 kbps packet

rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
rx.bind(("127.0.0.1", 0))
port = rx.getsockname()[1]

rng = np.random.RandomState(0)
wire = rng.randint(0, 256, (STREAMS, PAYLOAD), np.int32).astype(np.uint8)
sizes = np.full(STREAMS, PAYLOAD, np.int32)


def py_tick(sock, seq):
    n = 0
    for slot in np.flatnonzero(sizes > 0):
        sock.sendto(int(slot).to_bytes(2, "big")
                    + int(seq).to_bytes(4, "big")
                    + wire[slot, : sizes[slot]].tobytes(),
                    ("127.0.0.1", port))
        n += 1
    return n


tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
py_tick(tx, 0)  # warm the path
t0 = time.perf_counter()
sent_py = sum(py_tick(tx, t) for t in range(TICKS))
dt_py = (time.perf_counter() - t0) / TICKS
tx.close()

from lyra_tpu.tools.udp_ingest import blast  # the pre-built sendmmsg floor

blast(port, STREAMS, PAYLOAD, STREAMS)  # warm the path
t0 = time.perf_counter()
sent_floor = sum(blast(port, STREAMS, PAYLOAD, STREAMS, seq0=t)
                 for t in range(TICKS))
dt_floor = (time.perf_counter() - t0) / TICKS

eg = UdpEgress(STREAMS, dest=("127.0.0.1", port))
eg.send(wire, sizes, 0)  # warm the path
t0 = time.perf_counter()
sent_nat = sum(eg.send(wire, sizes, t) for t in range(TICKS))
dt_nat = (time.perf_counter() - t0) / TICKS
st = eg.stats()
eg.close()
rx.close()

pps_py = sent_py / (dt_py * TICKS)
pps_nat = sent_nat / (dt_nat * TICKS)
pps_floor = sent_floor / (dt_floor * TICKS)
print(f"{STREAMS} slots x {PAYLOAD} B payload, {TICKS} ticks:")
print(f"  sendmmsg floor     : {dt_floor * 1e3:8.2f} ms/tick  "
      f"{pps_floor:10,.0f} pkts/s  (pre-built batches, headers only)")
print(f"  python sendto loop : {dt_py * 1e3:8.2f} ms/tick  "
      f"{pps_py:10,.0f} pkts/s  ({pps_py / 50:,.0f} real-time streams)")
print(f"  native egress      : {dt_nat * 1e3:8.2f} ms/tick  "
      f"{pps_nat:10,.0f} pkts/s  ({pps_nat / 50:,.0f} real-time streams)  "
      f"[{dt_py / dt_nat:.1f}x]")
print(f"  native stats: {st}")

if THREADS:
    meg = MultiEgress(STREAMS, threads=THREADS, dest=("127.0.0.1", port))
    meg.send(wire, sizes, 0)  # warm the path (and the pool)
    t0 = time.perf_counter()
    sent_m = sum(meg.send(wire, sizes, t) for t in range(TICKS))
    dt_m = (time.perf_counter() - t0) / TICKS
    stm = meg.stats()
    meg.close()
    pps_m = sent_m / (dt_m * TICKS)
    print(f"  multi x{THREADS} egress   : {dt_m * 1e3:8.2f} ms/tick  "
          f"{pps_m:10,.0f} pkts/s  ({pps_m / 50:,.0f} real-time streams)  "
          f"[{dt_nat / dt_m:.2f}x vs 1-thread]")
    print(f"  multi stats: {stm}")
