"""Stage ablation at the production wave schedule (2x8192, bf16).

Round-2's ablation ran at the old 1x16384 schedule; this re-derives the
per-stage cost composition at the round-3 headline configuration so the
roofline gap (bench.py reports ~28% of the pure state-traffic bound) is
attributable stage by stage.  Each variant monkey-patches ONE stage to a
shape-preserving no-op and re-times the full roundtrip; the delta vs the
full step is that stage's marginal cost.

Usage: python benchmarks/wave_ablation.py [S] [waves]
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

    from lyra_tpu.codec import engine as engine_mod
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (S, 320)), jnp.float32)
    r = jnp.ones((S,), bool)
    nq = jnp.full((S,), 16, jnp.int32)

    variants = [
        ("full", None),
        ("no soundstream", lambda enc, dec: setattr(
            enc.soundstream, "extract",
            lambda st, x: (jnp.zeros((x.shape[0], 64), jnp.float32), st))),
        ("no gan", lambda enc, dec: setattr(
            dec.gan, "decode_hop",
            lambda st, f: (jnp.zeros((f.shape[0], 320), jnp.float32), st))),
        ("no rvq decode", lambda enc, dec: setattr(
            dec.rvq, "decode",
            lambda idx, dtype=None, max_stages=None: jnp.zeros(
                (idx.shape[0], 64), dtype or jnp.float32))),
        ("no noise estimator", lambda enc, dec: setattr(
            dec.noise, "receive_hop", lambda st, hop: st)),
        ("no freeze masks", "mask"),
    ]

    results = {}
    for label, mutate in variants:
        enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
        dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
        saved_mask = engine_mod._mask_tree
        try:
            if mutate == "mask":
                engine_mod._mask_tree = lambda m, new, old: new
            elif mutate is not None:
                mutate(enc, dec)

            @jax.jit
            def step(es, ds, a, rr, n, enc=enc, dec=dec):
                idx, _, es = enc._step_impl(es, a, n)
                out, cn, ds = dec._step_impl(ds, idx, rr)
                return out, cn, es, ds

            waves = [[enc.init_state(S), dec.init_state(S)]
                     for _ in range(W)]
            for w in waves:
                out, cn, w[0], w[1] = step(w[0], w[1], audio, r, nq)
            jax.block_until_ready(cn)
            outs = []
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                for w in waves:
                    out, cn, w[0], w[1] = step(w[0], w[1], audio, r, nq)
                    outs.append(cn)
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / iters
        finally:
            engine_mod._mask_tree = saved_mask
        results[label] = dt * 1e3
        delta = results[label] - results.get("full", results[label])
        print(f"{label:22s}: {dt * 1e3:6.2f} ms/tick"
              + (f"  (stage ~{-delta:.2f} ms)" if label != "full" else ""),
              flush=True)


if __name__ == "__main__":
    main()
