"""A/B probe: int8 streaming-state storage vs bf16 state.

Hypothesis: the lockstep tick is HBM-state-traffic bound (PERF.md: GAN
12,912 + SoundStream ~13k floats/stream round-tripped every 20 ms), so
storing conv contexts as int8 + per-stream scale should halve that
traffic.  Measured result (v5e via axon, B=16384 bf16): **regression** —

    state_compression=None : 9.90 ms/step (33,101 streams)
    state_compression=int8 : 12.07 ms/step (27,154 streams)

XLA materializes convolution operands, so the dequantized bf16 state is
written+read from HBM in addition to the int8 copy; the amax reduction
adds another pass.  Kept as the reproducer for PERF.md "Probed and
rejected"; the mode's real use is halving checkpoint/drain bytes.

Usage: python benchmarks/state_compression_probe.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (B, 320)), jnp.float32)
    received = jnp.ones((B,), bool)
    nq = jnp.full((B,), 4, jnp.int32)

    for comp in (None, "int8"):
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200,
                            state_compression=comp)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200,
                            state_compression=comp)
        es, ds = enc.init_state(B), dec.init_state(B)

        @jax.jit
        def step(es, ds, a, r, n, enc=enc, dec=dec):
            idx, _, es = enc._step_impl(es, a, n)
            out, cn, ds = dec._step_impl(ds, idx, r)
            return out, cn, es, ds

        out, cn, es, ds = step(es, ds, audio, received, nq)  # compile
        jax.block_until_ready(cn)
        t0 = time.perf_counter()
        for _ in range(20):
            out, cn, es, ds = step(es, ds, audio, received, nq)
        jax.block_until_ready(cn)
        dt = (time.perf_counter() - t0) / 20
        print(f"state_compression={comp}: {dt * 1e3:.2f} ms/step, "
              f"{B * 0.02 / dt:.0f} streams")


if __name__ == "__main__":
    main()
