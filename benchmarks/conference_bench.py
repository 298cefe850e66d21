import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""Conference-bridge serving throughput: seats per chip.

Full MCU tick at fleet scale through ConferenceBridge.tick_wire — uplink
wire packets in, device unpack+decode, per-room mix-minus-one, device
encode+pack, downlink wire packets out.  PCM never crosses the host
boundary; the host moves ~8 B/seat uplink + ~8 B/seat downlink per tick.

Uplink traffic is a precomputed ring of real encoded packets (content
doesn't change decode cost); 5% of uplinks are lost each tick so the
PLC/CN machinery runs at its serving duty cycle.

Usage: python benchmarks/conference_bench.py [B] [room_size] [ticks]
                                             [--async] [--waves=N]

--async pipelines ticks through tick_wire_async (one tick of latency buys
device/D2H/host-IO overlap); --waves=N splits the fleet into N bridges of
B/N seats with interleaved async submits — the conference expression of
the headline bench's wave schedule (rooms never span bridges).
"""
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
from lyra_tpu.tools.conference import ConferenceBridge
from lyra_tpu.tools.stream_server import EncoderServer

args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if args else 8192
ROOM = int(args[1]) if len(args) > 1 else 4
TICKS = int(args[2]) if len(args) > 2 else 50
WAVES = 1
for a in sys.argv[1:]:
    if a.startswith("--waves="):
        WAVES = int(a.split("=", 1)[1])
ASYNC = "--async" in sys.argv or WAVES > 1
if B % WAVES:
    raise ValueError(f"B={B} must divide over {WAVES} waves")

rng = np.random.RandomState(0)
Bw = B // WAVES
bridges = [
    ConferenceBridge(
        Bw,
        dec_engine=DecoderEngine(16000, mode="bf16", max_bitrate=3200,
                                 emit_dtype="int16"),
        enc_engine=EncoderEngine(16000, mode="bf16", max_bitrate=3200))
    for _ in range(WAVES)]
for br in bridges:
    br.add_participants({i: i // ROOM for i in range(Bw)})

client = EncoderServer(
    Bw, engine=EncoderEngine(16000, mode="bf16", max_bitrate=3200))
client.add_streams(range(Bw))
ring = []
for _ in range(8):
    audio = rng.randint(-16000, 16000, (Bw, 320)).astype(np.int16)
    ring.append(client.tick_wire(audio))


def run(ticks):
    for t in range(ticks):
        pkts, sizes = ring[t % len(ring)]
        received = (sizes > 0) & (rng.uniform(size=Bw) > 0.05)
        if ASYNC:
            for br in bridges:
                br.tick_wire_async(pkts, received, sizes)
        else:
            bridges[0].tick_wire(pkts, received, sizes)
    if ASYNC:
        for br in bridges:
            br.flush_async()


run(3)  # warmup / compile
t0 = time.perf_counter()
run(TICKS)
dt = (time.perf_counter() - t0) / TICKS
seats = B * 0.02 / dt
mode = (f"{WAVES}x{Bw} async waves" if WAVES > 1
        else ("async" if ASYNC else "sync"))
print(f"B={B} rooms_of={ROOM} [{mode}]: {dt * 1e3:.2f} ms/tick -> "
      f"{seats:,.0f} realtime conference seats/chip "
      f"(uplink decode + mix + downlink encode, wire-to-wire)")
