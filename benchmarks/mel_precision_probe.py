"""A/B probe: noise-estimator DFT precision HIGH (3-pass) vs DEFAULT (1-pass).

The decoder-side noise estimator extracts log-mel features of the GAN
output every tick (CNG synthesis is lax.cond-gated, but the estimate must
track continuously — reference: lyra/lyra_decoder.cc:306-311), so its DFT
matmuls are on the steady-state critical path.  HIGH precision is needed
where features feed the wire (encoder DTX parity); the decoder-side
estimate only conditions comfort noise, where ~4e-3 relative error is
inaudible — candidate for 1-pass bf16.  Measured result (v5e via axon):
**no win** — 10.13 (HIGH) vs 10.31 (DEFAULT) ms/step at B=16384: the mel
DFTs are HBM-bound on their operands, not MXU-pass-bound.  HIGH stays the
default; kept as the reproducer for PERF.md "Probed and rejected".

Usage: python benchmarks/mel_precision_probe.py [B]
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
    from lyra_tpu.codec.noise_estimator import NoiseEstimator

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (B, 320)), jnp.float32)
    received = jnp.ones((B,), bool)
    nq = jnp.full((B,), 4, jnp.int32)

    for label, prec in (("HIGH", jax.lax.Precision.HIGH),
                        ("DEFAULT", jax.lax.Precision.DEFAULT)):
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
        dec.noise = NoiseEstimator(16000, mel_precision=prec)
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
        print(f"mel_precision={label}: {dt * 1e3:.2f} ms/step, "
              f"{B * 0.02 / dt:.0f} streams")


if __name__ == "__main__":
    main()
