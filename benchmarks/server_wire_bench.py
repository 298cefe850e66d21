"""Server-level serving throughput: the full stream-server API in the loop.

benchmarks/serving_bench.py measures raw engines; this bench goes through
the production surface — EncoderServer/DecoderServer `tick_wire_async`
(device-side wire codec, async D2H, slot bookkeeping, generation-counter
drains) — so the number includes every host cost a deployment pays per
20 ms tick except the network itself — INCLUDING the PCM upload: the
encode side ships [B, 320] int16 audio host→device every tick (~10.5 MB at
B=16384).

Measured on the axon dev tunnel (~MB/s): 1493 ms/tick at B=16384 — the
tunnel, not the server (PCM is 20x the wire bytes; see PERF.md "PCM
bandwidth").  On locally-attached hardware the same upload is ~1 ms of
PCIe, so this bench is the honest full-deployment reproducer to run there;
on the tunnel, benchmarks/serving_bench.py (audio device-resident) is the
meaningful wire-path number.

Usage: python benchmarks/server_wire_bench.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    enc = EncoderServer(B, engine=EncoderEngine(
        16000, mode="bf16", max_bitrate=3200), bitrate=3200)
    dec = DecoderServer(B, engine=DecoderEngine(
        16000, mode="bf16", max_bitrate=3200))
    enc.add_streams(range(B))
    dec.add_streams(range(B))

    rng = np.random.RandomState(0)
    audio = rng.randint(-16000, 16000, (B, 320)).astype(np.int16)
    received = np.ones(B, bool)
    received[rng.uniform(size=B) < 0.05] = False

    # Prime: first call compiles; second fills the 1-deep pipelines.
    for _ in range(2):
        got = enc.tick_wire_async(audio)
        if got is not None:
            wire, sizes = got
            dec.tick_wire_async(wire, received & (sizes > 0))

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        wire, sizes = enc.tick_wire_async(audio)
        dec.tick_wire_async(wire, received & (sizes > 0))
    # Account the in-flight tick too, then drain it.
    wire, sizes = enc.flush_wire_async()
    dec.tick_wire_async(wire, received & (sizes > 0))
    out = dec.flush_wire_async()
    assert out is not None and out.shape == (B, 320)
    dt = (time.perf_counter() - t0) / (iters + 1)
    print(f"server-level wire path: {dt * 1e3:.2f} ms/tick at B={B} -> "
          f"{B * 0.02 / dt:.0f} realtime streams/chip", flush=True)


if __name__ == "__main__":
    main()
