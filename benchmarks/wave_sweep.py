"""Wave-size sweep for the multi-wave tick schedule (follow-up to
microbatch_probe.py: 2x8192 interleaved beat one B=16384 call by 15%).

Measures the steady-state per-wave cost at several wave sizes by running
W=4 waves round-robin (each wave has its own resident engine state; the
host keeps the device queue fed), and reports the implied streams/chip
= S * 0.02 / per_wave_time.

Usage: python benchmarks/wave_sweep.py [sizes...]
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

    sizes = [int(a) for a in sys.argv[1:]] or [4096, 6144, 8192, 10240, 12288]
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    rng = np.random.RandomState(0)

    @jax.jit
    def step(es, ds, a, r, n):
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, r)
        return out, cn, es, ds

    for S in sizes:
        waves = []
        audio = jnp.asarray(rng.randint(-16000, 16000, (S, 320)), jnp.float32)
        r = jnp.ones((S,), bool)
        n = jnp.full((S,), 4, jnp.int32)
        for _ in range(4):
            waves.append([enc.init_state(S), dec.init_state(S)])
        for w in waves:  # compile + warm
            out, cn, w[0], w[1] = step(w[0], w[1], audio, r, n)
        jax.block_until_ready(cn)

        iters = 10  # rounds of 4 waves = 40 wave-steps
        t0 = time.perf_counter()
        for _ in range(iters):
            for w in waves:
                out, cn, w[0], w[1] = step(w[0], w[1], audio, r, n)
        jax.block_until_ready(cn)
        per_wave = (time.perf_counter() - t0) / (iters * len(waves))
        print(f"S={S}: {per_wave * 1e3:.2f} ms/wave, "
              f"{S * 0.02 / per_wave:.0f} streams/chip "
              f"(tick of 4 waves = {4 * per_wave * 1e3:.1f} ms for {4 * S} streams)")


if __name__ == "__main__":
    main()
