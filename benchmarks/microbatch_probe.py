"""Two-wave microbatch + unrolled-2-tick probes (VERDICT r2 next-round #1).

Hypotheses about the ~1.5 ms/step of un-donated state copy-out + ~0.5 ms of
freeze-mask traffic (PERF.md round-2 ablation):

  * two-wave: split B into 2 x B/2 with interleaved dispatch so wave 2's
    compute could overlap wave 1's state copy-out.  (Expected weak on a
    TPU core that executes one program at a time, but measured, not
    assumed.)
  * unrolled-2: TWO lockstep ticks unrolled in ONE jit body (not lax.scan,
    whose carries this backend copies each iteration — PERF.md "Probed and
    rejected").  Within a single XLA program the tick-1 state never crosses
    the jit boundary, so the per-call output copies are paid once per two
    ticks.  Costs 20 ms of added playout latency, same as the bench's
    2-tick scan config.

Usage: python benchmarks/microbatch_probe.py [B] [iters]
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    rng = np.random.RandomState(0)

    def make(b):
        audio = jnp.asarray(rng.randint(-16000, 16000, (b, 320)), jnp.float32)
        return [enc.init_state(b), dec.init_state(b), audio,
                jnp.ones((b,), bool), jnp.full((b,), 4, jnp.int32)]

    @jax.jit
    def step1(es, ds, a, r, n):
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, r)
        return out, cn, es, ds

    @jax.jit
    def step2(es, ds, a, r, n):
        idx, _, es = enc._step_impl(es, a, n)
        out1, cn, ds = dec._step_impl(ds, idx, r)
        idx, _, es = enc._step_impl(es, a, n)
        out2, cn, ds = dec._step_impl(ds, idx, r)
        return out1 + out2, cn, es, ds

    results = {}

    # Baseline: one tick per call at full B.
    w = make(B)
    out, cn, w[0], w[1] = step1(*w)
    jax.block_until_ready(cn)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, cn, w[0], w[1] = step1(*w)
    jax.block_until_ready(cn)
    results["baseline 1-tick"] = (time.perf_counter() - t0) / iters

    # Unrolled 2-tick: two ticks per call, state crosses HBM once per call.
    out, cn, w[0], w[1] = step2(*w)
    jax.block_until_ready(cn)
    t0 = time.perf_counter()
    for _ in range(max(iters // 2, 4)):
        out, cn, w[0], w[1] = step2(*w)
    jax.block_until_ready(cn)
    results["unrolled 2-tick"] = (
        (time.perf_counter() - t0) / max(iters // 2, 4) / 2)

    # Two-wave: the fleet in two half-batches, interleaved dispatch.
    wa, wb = make(B // 2), make(B // 2)
    for wv in (wa, wb):
        out, cn, wv[0], wv[1] = step1(*wv)
    jax.block_until_ready(cn)
    t0 = time.perf_counter()
    for _ in range(iters):
        outa, cna, wa[0], wa[1] = step1(*wa)
        outb, cnb, wb[0], wb[1] = step1(*wb)
    jax.block_until_ready((cna, cnb))
    results["two-wave 2x%d" % (B // 2)] = (time.perf_counter() - t0) / iters

    for label, dt in results.items():
        print(f"{label}: {dt * 1e3:.2f} ms/tick, {B * 0.02 / dt:.0f} streams")


if __name__ == "__main__":
    main()
