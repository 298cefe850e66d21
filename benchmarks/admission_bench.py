"""Stream-admission latency: jitted reset_rows vs the old eager form.

Admission (call setup) masks rows of the engine state back to initial
values.  The eager form materializes a full fresh state tree
(init_state) and then issues ~50 per-leaf `where` dispatches; the jitted
form (engine.reset_rows since round 3) generates the fresh values inside
one program, fusing the mostly-zero constants straight into the selects —
one dispatch, one state read+write.  This measures both at serving scale.

Usage: python benchmarks/admission_bench.py [B] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_reset(fn, state, masks, iters):
    import jax

    out = fn(state, masks[0])  # compile/warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(state, masks[i % len(masks)])
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, _mask_tree

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    state = dec.init_state(B)
    rng = np.random.RandomState(0)
    # Single-stream admissions and a 512-call burst (the two serving shapes).
    single = [np.zeros(B, bool) for _ in range(8)]
    for i, m in enumerate(single):
        m[rng.randint(B)] = True
    burst_n = min(512, B)
    burst = [np.zeros(B, bool) for _ in range(4)]
    for m in burst:
        m[rng.choice(B, burst_n, replace=False)] = True

    def eager(state, mask):
        # The pre-round-3 path: materialize fresh, then per-leaf where.
        fresh = dec.init_state(int(mask.shape[0]))
        return _mask_tree(jax.numpy.asarray(mask), fresh, state)

    for label, masks in (("1 admission", single),
                         (f"{burst_n}-burst", burst)):
        dt_j = time_reset(dec.reset_rows, state, masks, iters)
        dt_e = time_reset(eager, state, masks, iters)
        print(f"B={B} {label}: jitted {dt_j * 1e3:.2f} ms | "
              f"eager {dt_e * 1e3:.2f} ms ({dt_e / dt_j:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
