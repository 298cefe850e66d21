"""Speed-of-light check for the conv stages: XLA cost analysis vs measured.

For each hot stage (SoundStream extract, LyraGAN decode_hop) at the
serving wave size, prints the compiled program's FLOPs and bytes
accessed, the corresponding MXU (197 TFLOP/s bf16) and HBM (819 GB/s
v5e) roofline times, and the measured time.  Round-3 result: both stages
sit at 85-100% of their HBM byte-roofline with a ~5% MXU share — the
conv stacks are memory-bound at the compiler's layer-materialization
floor, so the remaining lever is cross-layer fusion (probed via the
pallas megakernel, 20x slower — PERF.md), not scheduling.

Usage: python benchmarks/stage_roofline.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MXU_FLOPS = 197e12  # v5e bf16
HBM_GBPS = 819e9


def analyze(label, fn, *args):
    import jax

    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops, nbytes = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{label}: {flops / 1e9:.1f} GFLOP, {nbytes / 1e6:.0f} MB | "
          f"MXU bound {flops / MXU_FLOPS * 1e3:.2f} ms, "
          f"HBM bound {nbytes / HBM_GBPS * 1e3:.2f} ms, "
          f"measured {dt * 1e3:.2f} ms "
          f"({nbytes / HBM_GBPS / dt * 100:.0f}% of byte roofline)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)

    analyze(f"SoundStream extract B={B}",
            lambda s, a: enc.soundstream.extract(s, a),
            enc.soundstream.init_state(B), jnp.zeros((B, 320), jnp.float32))
    analyze(f"LyraGAN decode_hop B={B}",
            lambda s, f: dec.gan.decode_hop(s, f),
            dec.gan.init_state(B), jnp.zeros((B, 64), jnp.float32))


if __name__ == "__main__":
    main()
