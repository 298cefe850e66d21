"""Probe: split the roundtrip program into separate encode/decode programs.

The two-wave schedule won ~15% by halving the per-program working set
(PERF.md round 3).  This asks whether splitting further — enc and dec as
separate jit programs, interleaved encA decA encB decB — buys more (each
program then carries only one engine's state), or loses to the extra
jit-boundary crossing of the indices and doubled per-call overhead.

Usage: python benchmarks/split_wave_probe.py [S] [waves]
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

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (S, 320)), jnp.float32)
    r = jnp.ones((S,), bool)
    nq = jnp.full((S,), 16, jnp.int32)

    @jax.jit
    def roundtrip(es, ds, a, rr, n):
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, rr)
        return out, cn, es, ds

    enc_step = jax.jit(enc._step_impl)
    dec_step = jax.jit(dec._step_impl)

    waves = [[enc.init_state(S), dec.init_state(S)] for _ in range(W)]
    for w in waves:
        out, cn, w[0], w[1] = roundtrip(w[0], w[1], audio, r, nq)
    jax.block_until_ready(cn)
    iters = 20
    outs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        for w in waves:
            out, cn, w[0], w[1] = roundtrip(w[0], w[1], audio, r, nq)
            outs.append(cn)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"fused roundtrip {W}x{S}: {dt * 1e3:.2f} ms/tick, "
          f"{W * S * 0.02 / dt:.0f} streams")

    for w in waves:
        idx, isn, w[0] = enc_step(w[0], audio, nq)
        out, cn, w[1] = dec_step(w[1], idx, r)
    jax.block_until_ready(cn)
    outs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        for w in waves:
            idx, isn, w[0] = enc_step(w[0], audio, nq)
            out, cn, w[1] = dec_step(w[1], idx, r)
            outs.append(cn)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"split enc|dec {W}x{S}: {dt * 1e3:.2f} ms/tick, "
          f"{W * S * 0.02 / dt:.0f} streams")


if __name__ == "__main__":
    main()
