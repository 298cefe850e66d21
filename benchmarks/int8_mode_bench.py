"""Probe: exact-int8 arithmetic mode as a THROUGHPUT lever (A/B vs bf16).

The serving tick is memory-bound on layer-boundary activation traffic
(benchmarks/stage_roofline.py: both conv stacks run at 85-100% of their
HBM byte bound with a ~5% MXU share).  mode="int8" keeps the quantized
islands' activations int8 across layer boundaries (tflite/executor.py) —
1 byte/element vs 2 for bf16 — so if XLA lowers the int8 convs natively
the boundary traffic halves and the tick could speed up, at the price of
f32 VAR_HANDLE state (2x bf16 state bytes, PERF.md round 2) and the
fixed-point requantization pipelines.  This probe measures which effect
wins at the serving wave size.

Usage (on the TPU):  python benchmarks/int8_mode_bench.py [S] [W]
defaults: S=8192 streams/wave, W=2 waves (the shipping schedule).
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
    audio = jnp.asarray(rng.randint(-16000, 16000, (S, 320)), jnp.float32)
    received = jnp.ones((S,), bool)
    nq = jnp.full((S,), 64 // config.BITS_PER_QUANTIZER, jnp.int32)

    for mode in ("bf16", "int8"):
        enc = EncoderEngine(16000, mode=mode, max_bitrate=3200)
        dec = DecoderEngine(16000, mode=mode, max_bitrate=3200)

        @jax.jit
        def step(es, ds, a, r, n, enc=enc, dec=dec):
            idx, _, es = enc._step_impl(es, a, n)
            out, cn, ds = dec._step_impl(ds, idx, r)
            return out, cn, es, ds

        state_bytes = sum(x.nbytes for x in jax.tree.leaves(
            (enc.init_state(1), dec.init_state(1))))
        waves = [[enc.init_state(S), dec.init_state(S)] for _ in range(W)]
        for w in waves:  # compile + warmup
            out, cn, w[0], w[1] = step(w[0], w[1], audio, received, nq)
        jax.block_until_ready(cn)

        try:
            ca = step.lower(waves[0][0], waves[0][1], audio, received,
                            nq).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            prog_gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        except Exception:
            prog_gb = 0.0

        best = None
        for attempt in range(3):
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
        print(f"{mode:5s}: {best * 1e3:7.2f} ms/tick  "
              f"{streams:8.0f} streams/chip  "
              f"state {state_bytes / 1024:.1f} KB/stream  "
              f"HLO {prog_gb * W:.1f} GB/tick", flush=True)


if __name__ == "__main__":
    main()
