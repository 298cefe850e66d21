"""ServerPool (wave-scheduled serving) vs a single server, full wire loop.

The device-resident probe showed two 8192-stream programs beat one
16384-stream program by ~15% (PERF.md round 3).  This measures whether the
win survives the *serving* loop, where every tick also moves wire bytes
and audio across the host link (which through the dev tunnel is the
dominant cost — on PCIe hardware the device-side win governs).

Usage: python benchmarks/pool_bench.py [B] [iters] [pcm_dtype]

pcm_dtype: int16 (default — 2 B/sample over the host link both ways, the
serving configuration) or f32 (the pre-int16-boundary upload for A/B).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(make, label, B, iters, pcm_dtype=np.int16):
    enc, dec = make()
    enc.add_streams(range(B))
    dec.add_streams(range(B))
    rng = np.random.RandomState(0)
    audio = rng.randint(-16000, 16000, (B, 320)).astype(pcm_dtype)

    wire = sizes = None
    for _ in range(3):  # compile + prime both async pipelines
        got = enc.tick_wire_async(audio)
        if got is not None:
            wire, sizes = got
            dec.tick_wire_async(wire, sizes > 0, sizes.astype(np.int32))
    t0 = time.perf_counter()
    for _ in range(iters):
        got = enc.tick_wire_async(audio)
        wire, sizes = got
        dec.tick_wire_async(wire, sizes > 0, sizes.astype(np.int32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/tick -> {B * 0.02 / dt:.0f} streams",
          flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.tools.stream_server import (DecoderServer, EncoderServer,
                                              ServerPool)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    pcm_arg = sys.argv[3] if len(sys.argv) > 3 else "int16"
    if pcm_arg not in ("int16", "f32"):  # fail loudly, never fall back
        raise SystemExit(f"pcm_dtype must be 'int16' or 'f32', got {pcm_arg!r}")
    pcm = np.float32 if pcm_arg == "f32" else np.int16

    def engines():
        return (EncoderEngine(16000, mode="bf16", max_bitrate=3200),
                DecoderEngine(16000, mode="bf16", max_bitrate=3200))

    def single():
        e, d = engines()
        return (EncoderServer(B, engine=e, bitrate=3200),
                DecoderServer(B, engine=d))

    def pool():
        encs, decs = [], []
        for _ in range(2):
            e, d = engines()
            encs.append(EncoderServer(B // 2, engine=e, bitrate=3200))
            decs.append(DecoderServer(B // 2, engine=d))
        return ServerPool(encs), ServerPool(decs)

    run(single, f"single server B={B} pcm={np.dtype(pcm).name}", B, iters,
        pcm)
    run(pool, f"2-wave pool 2x{B // 2} pcm={np.dtype(pcm).name}", B, iters,
        pcm)


if __name__ == "__main__":
    main()
