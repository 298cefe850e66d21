"""Single-stream sequential per-frame latency on device (reference headline).

The reference's headline number is per-frame encode+decode latency for ONE
stream processed sequentially (reference: lyra/lyra_benchmark_lib.cc:199-293;
README.md:161-166 — 0.525 ms/frame on a Pixel 6 Pro, ~38x realtime).  The
throughput bench (bench.py) answers a different question (streams/chip);
this probe answers the reference's own: how long does one 20 ms frame take
end-to-end when frames are strictly sequential?

Through the dev tunnel each host dispatch costs ~30 ms, which would swamp
the sub-ms device time, so the chain of N sequential frames runs INSIDE one
jit via lax.scan — the scan carry (encoder+decoder state) enforces the true
frame-to-frame dependency, and per-frame latency = scan wall time / N.  A
running output checksum rides in the carry so no frame is dead code.

Usage (on the TPU):  python benchmarks/single_stream_latency.py [B] [N] [backend]
defaults: B=1 stream, N=250 chained frames (5 s of audio), backend=xla
(backend=fused probes the pallas conv-stack megakernel — it loses 20x at
serving batch sizes, PERF.md round 2, but at B=1 the working set fits
VMEM, so latency is its one plausible niche).
"""

import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    backend = sys.argv[3] if len(sys.argv) > 3 else "xla"
    iters = 10

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    rng = np.random.RandomState(0)
    # The reference benchmark drives random noise frames (uniform int16
    # range), 120-bit quantizer (lyra_benchmark_lib.cc:58).
    frames = jnp.asarray(
        rng.randint(-16000, 16000, (N, B, 320)), jnp.float32)
    received = jnp.ones((B,), bool)
    nq = jnp.full((B,), 120 // config.BITS_PER_QUANTIZER, jnp.int32)

    enc = EncoderEngine(16000, mode="bf16", backend=backend)
    dec = DecoderEngine(16000, mode="bf16", backend=backend)

    def frame_step(carry, audio):
        es, ds, acc = carry
        idx, _, es = enc._step_impl(es, audio, nq)
        out, _, ds = dec._step_impl(ds, idx, received)
        return (es, ds, acc + jnp.sum(out.astype(jnp.float32))), None

    @jax.jit
    def chain(es, ds, frames):
        (es, ds, acc), _ = jax.lax.scan(
            frame_step, (es, ds, jnp.float32(0.0)), frames)
        return es, ds, acc

    es, ds = enc.init_state(B), dec.init_state(B)
    es, ds, acc = chain(es, ds, frames)  # compile + warmup
    jax.block_until_ready(acc)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            es, ds, acc = chain(es, ds, frames)
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / (iters * N)
        best = dt if best is None else min(best, dt)

    rt = 0.02 / best
    print(f"B={B} ({backend}): {best * 1e6:8.1f} us/frame sequential "
          f"({rt:,.0f}x realtime per stream; reference Pixel 6 Pro "
          f"525 us/frame = 38x, README.md:161-166)", flush=True)


if __name__ == "__main__":
    main()
