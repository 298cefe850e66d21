"""Probe: what does an external-rate fleet cost vs 16 kHz?

Non-16 kHz fleets resample inside the jitted step (engine.py: encoder
input Resampler -> 16 kHz, decoder 16 kHz -> output rate), adding a
polyphase einsum per direction plus wider PCM arrays.  This measures the
marginal tick cost at the serving wave size so the multi-rate serving
story (stream_server.py sample_rate_hz / mixed-rate ServerPool waves)
ships with a number.

Usage (on the TPU):  python benchmarks/rate_cost_probe.py [S] [W]
defaults: S=8192, W=2 (the shipping wave schedule).
"""

import sys
import time

import numpy as np


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = 20

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    rng = np.random.RandomState(0)

    for rate in (16000, 8000, 48000):
        hop = config.num_samples_per_hop(rate)
        audio = jnp.asarray(rng.randint(-16000, 16000, (S, hop)), jnp.float32)
        received = jnp.ones((S,), bool)
        nq = jnp.full((S,), 64 // config.BITS_PER_QUANTIZER, jnp.int32)
        enc = EncoderEngine(rate, mode="bf16", max_bitrate=3200)
        dec = DecoderEngine(rate, mode="bf16", max_bitrate=3200)

        @jax.jit
        def step(es, ds, a, r, n, enc=enc, dec=dec):
            idx, _, es = enc._step_impl(es, a, n)
            out, cn, ds = dec._step_impl(ds, idx, r)
            return out, cn, es, ds

        waves = [[enc.init_state(S), dec.init_state(S)] for _ in range(W)]
        for w in waves:  # compile + warmup
            out, cn, w[0], w[1] = step(w[0], w[1], audio, received, nq)
        jax.block_until_ready(cn)

        best = None
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for _ in range(iters):
                for w in waves:
                    out, cn, w[0], w[1] = step(w[0], w[1], audio,
                                               received, nq)
                    outs.append(cn)
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        streams = W * S * 0.02 / best
        print(f"{rate:5d} Hz: {best * 1e3:7.2f} ms/tick  "
              f"{streams:8.0f} streams/chip", flush=True)


if __name__ == "__main__":
    main()
