"""Shared A/B timing harness for the engine-kwarg probes.

Every probe in this directory measures the same thing — the full
encode+decode lockstep tick at the bench configuration (bf16,
max_bitrate=3200) — varying one engine constructor kwarg.  Keeping the
harness in one place keeps the methodology (warmup, iteration count,
pipelined timing, compilation cache) identical across probes.
"""

import time

import numpy as np


def ab_probe(variants, B=16384, iters=20):
    """variants: iterable of (label, extra_engine_kwargs) or
    (label, extra_engine_kwargs, mutate) where mutate(enc, dec) patches the
    freshly built engines before jit (for sweeps over knobs that are not
    constructor kwargs, e.g. swapping a component).

    Prints one line per variant: ms/step and implied streams/chip.
    Returns {label: ms_per_step}.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (B, 320)), jnp.float32)
    received = jnp.ones((B,), bool)
    nq = jnp.full((B,), 4, jnp.int32)

    results = {}
    for variant in variants:
        label, kwargs, *rest = variant
        enc_kw = {k: v for k, v in kwargs.items() if k != "gate_idle_stages"}
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200, **enc_kw)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200, **kwargs)
        if rest:
            rest[0](enc, dec)
        es, ds = enc.init_state(B), dec.init_state(B)

        @jax.jit
        def step(es, ds, a, r, n, enc=enc, dec=dec):
            idx, _, es = enc._step_impl(es, a, n)
            out, cn, ds = dec._step_impl(ds, idx, r)
            return out, cn, es, ds

        out, cn, es, ds = step(es, ds, audio, received, nq)  # compile
        jax.block_until_ready(cn)
        t0 = time.perf_counter()
        for _ in range(iters):
            out, cn, es, ds = step(es, ds, audio, received, nq)
        jax.block_until_ready(cn)
        dt = (time.perf_counter() - t0) / iters
        results[label] = dt * 1e3
        print(f"{label}: {dt * 1e3:.2f} ms/step, {B * 0.02 / dt:.0f} streams")
    return results
