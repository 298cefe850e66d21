import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""Serving-loop soak: memory stability over a long run with slot churn.

A serving host runs for days, not 25 ticks, and its per-tick path crosses
three manually-managed tiers (ctypes-owned C++ pump/egress/jitter buffer,
numpy staging, jitted device programs).  A leak in any of them is invisible
to the unit tests and fatal in deployment, so this bench runs the real
loop — native pump ingest -> DecoderServer.tick_wire -> native egress —
for N ticks at full speed (no realtime pacing; a leak check, not a latency
one) with admission churn every 50 ticks (the allocation-heaviest path:
stream add/remove re-resets engine rows and clears routes), sampling RSS
along the way.

Pass = the RSS trajectory is flat after warmup (JAX compiles + first-touch
allocations land in the first ~100 ticks).  A steady climb is a leak; file
the trajectory, not a feeling.  DEPLOYMENT.md cites the result.

Usage:  python benchmarks/soak_bench.py [ticks] [capacity]
"""

import time

import numpy as np

from lyra_tpu.tools.jitter_buffer import JitterBuffer
from lyra_tpu.tools.stream_server import DecoderServer
from lyra_tpu.tools.udp_egress import UdpEgress
from lyra_tpu.tools.udp_ingest import UdpIngest, blast

TICKS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
CAPACITY = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PAYLOAD = 8  # 3.2 kbps packet
SAMPLE_EVERY = max(1, TICKS // 12)


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


def main():
    server = DecoderServer(CAPACITY)
    jb = JitterBuffer(capacity=CAPACITY, packet_size=23, depth=8)
    pump = UdpIngest(jb)
    rx = None  # egress sinks into the kernel's rcvbuf; never drained
    import socket
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    egress = UdpEgress(CAPACITY, dest=("127.0.0.1", rx.getsockname()[1]))

    for s in range(CAPACITY):
        server.add_stream(f"cal-{s}", slot=s)
        pump.add_stream(s)

    samples = []
    churn = 0
    t0 = time.perf_counter()
    for t in range(TICKS):
        # Keep packets flowing: one tick's worth for every slot, sent
        # natively so the sender isn't the measured cost.
        blast(pump.port, CAPACITY, PAYLOAD, CAPACITY, seq0=t)
        packets, received, sizes = pump.collect()
        audio = np.ascontiguousarray(server.tick_wire(packets, received,
                                                      sizes))
        egress.send(audio.view(np.uint8).reshape(CAPACITY, -1),
                    np.full(CAPACITY, audio.shape[1] * audio.itemsize,
                            np.int32), t)
        if t and t % 50 == 0:
            # Admission churn: the allocation-heaviest path (engine row
            # resets, route clears, slot-table rebuilds).
            slot = churn % CAPACITY
            sid = f"cal-{slot}"
            server.remove_stream(sid)
            pump.remove_stream(slot)
            server.add_stream(f"{sid}v{churn}", slot=slot)
            pump.add_stream(slot, start_seq=t + 1)
            churn += 1
        if t % SAMPLE_EVERY == 0 or t == TICKS - 1:
            samples.append((t, rss_mb()))
            print(f"  tick {t:6d}: RSS {samples[-1][1]:8.1f} MB", flush=True)
    dt = time.perf_counter() - t0

    # Drift: compare the median of the last quarter to the first sample
    # AFTER warmup (the first ~100 ticks hold JAX compiles + first-touch).
    post = [m for t, m in samples if t >= min(100, TICKS // 4)]
    window = sorted(post[-max(3, len(post) // 4):])
    tail = window[len(window) // 2]
    drift = tail - post[0]
    print(f"{TICKS} ticks x {CAPACITY} streams in {dt:.1f} s "
          f"({TICKS / dt:.0f} ticks/s), churned {churn} slots")
    print(f"RSS after warmup {post[0]:.1f} MB -> tail median {tail:.1f} MB "
          f"(drift {drift:+.1f} MB)")
    print(f"pump {pump.stats()}  egress {egress.stats()}")
    verdict = "FLAT" if abs(drift) < 32 else "DRIFTING — investigate"
    print(f"soak verdict: {verdict}")
    egress.close()
    pump.close()
    rx.close()


if __name__ == "__main__":
    main()
