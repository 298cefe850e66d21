"""Probe: fp8 storage of layer-boundary activations (A/B vs plain bf16).

The serving tick is memory-bound on layer-boundary activation traffic
(benchmarks/stage_roofline.py: both conv stacks at 85-100% of their HBM
byte bound, ~5% MXU share; ~327 KB/stream of materialized boundaries vs
~26 KB of carried state).  boundary_store="f8" keeps the arithmetic bf16
but materializes every large float intermediate as fp8 e4m3
(tflite/executor.py _BoundaryEnv): a pure dtype convert that fuses into
the producing and consuming fusions — no amax pass (the rejected
dynamic-scale int8), no int32 requant pipelines (the rejected exact-int8
mode).  If XLA keeps the converts fused, boundary bytes halve and the
HBM-bound tick should follow.

RESULT (measured, PERF.md round 4): REJECTED — XLA does NOT fuse the
dequantizing convert into conv operands; the bf16 copies still
materialize and the fp8 copies are pure addition (+2 B/boundary-elem,
HLO 13.0 -> 18.6 GB/tick, 8.30 -> 13.83 ms/tick).  Kept as the
reproducer; do not re-probe without a compiler change.

Quality cost, measured (100 hops of sample1, mel-LSD vs input, CPU bf16):
mean 0.44 -> 0.64 at 9.2 kbps, 0.54 -> 0.72 at 3.2 kbps; max stays under
1.2 vs the 2.0 bar — an opt-in throughput/quality trade.

Usage (on the TPU):  python benchmarks/boundary_store_bench.py [S] [W]
defaults: S=8192 streams/wave, W=2 waves (the shipping schedule).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

    for bs in (None, "f8"):
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200,
                            boundary_store=bs)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200,
                            boundary_store=bs)

        @jax.jit
        def step(es, ds, a, r, n, enc=enc, dec=dec):
            idx, _, es = enc._step_impl(es, a, n)
            out, cn, ds = dec._step_impl(ds, idx, r)
            return out, cn, es, ds

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
        print(f"boundary_store={str(bs):4s}: {best * 1e3:7.2f} ms/tick  "
              f"{streams:8.0f} streams/chip  "
              f"HLO {prog_gb * W:.1f} GB/tick", flush=True)


if __name__ == "__main__":
    main()
