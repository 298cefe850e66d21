"""A/B probe: idle-stage lax.cond gating vs the always-run masked step.

Measures the full encode+decode lockstep tick at B=16384 bf16 (the bench
configuration) with DecoderEngine's CNG idle gate on and off.  Round-2
results on one v5e through the axon tunnel (PERF.md "Idle-stage gating"):

    gate=True : 10.26 ms/step  (31,945 streams)
    gate=False: 11.14 ms/step  (29,424 streams)

Also the negative result that shaped the design: gating the conv stacks or
their freeze-masks the same way regressed to ~17 ms/step, because every
state tree routed through a conditional's branch results is copied each
tick, whichever branch executes.

Usage: python benchmarks/gating_probe.py [B]
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

    for gate in (True, False):
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200,
                            gate_idle_stages=gate)
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
        print(f"gate={gate}: {dt * 1e3:.2f} ms/step, "
              f"{B * 0.02 / dt:.0f} streams")


if __name__ == "__main__":
    main()
