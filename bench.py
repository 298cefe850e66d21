"""Throughput benchmark: concurrent real-time Lyra streams per chip.

Measures the batched lockstep encode+decode step (one 20 ms frame per
stream per step: SoundStream encode → RVQ quantize → RVQ decode → LyraGAN
decode with the full PLC/fade machinery) and reports how many concurrent
real-time streams one chip sustains: streams = B * 0.02s / step_time.

Baseline: BASELINE.json north star = 2000 concurrent 3.2 kbps streams/chip
(the reference sustains ~38x realtime for ONE stream on a Pixel 6 Pro,
reference: README.md:161-166).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_STREAMS = 2000.0


def main():
    import jax

    # Persistent compilation cache: round-over-round driver runs (and
    # repeated local runs) skip the multi-minute XLA compiles.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    # bf16 conv compute: half the HBM traffic and bf16 MXU passes; quality
    # is LSD-indistinguishable from f32 (see tests/test_integration.py and
    # the bar in BASELINE.md).
    # max_bitrate=3200: the benchmark fleet is pinned at 3.2 kbps, so the
    # engines statically skip the 30 RVQ stages the wire can never carry.
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    rng = np.random.RandomState(0)

    best = (0.0, 0, 0.0, 1)  # streams, batch, step_ms, ticks
    # ticks is capped at 2: a k-tick scan adds k*20 ms of playout latency,
    # and beyond ~40 ms the config stops being honest "real-time streams".
    for batch, ticks in ((4096, 1), (16384, 1), (16384, 2)):
        try:
            import jax.numpy as jnp

            enc_state = enc.init_state(batch)
            dec_state = dec.init_state(batch)
            audio = jnp.asarray(
                rng.randint(-16000, 16000, (batch, 320)), jnp.float32)
            received = jnp.ones((batch,), bool)
            nq = jnp.full((batch,), 64 // config.BITS_PER_QUANTIZER, jnp.int32)

            if ticks == 1:
                step = jax.jit(lambda es, ds, a, r, n: _roundtrip(
                    enc, dec, es, ds, a, r, n))
                args = (audio, received, nq)
            else:
                # k-tick lax.scan: state crosses HBM once per k ticks
                # instead of per jit call (the axon PJRT rejects buffer
                # donation, so per-call state copies are otherwise
                # unrecoverable — PERF.md "Probed and rejected").
                audio_k = jnp.broadcast_to(audio, (ticks, *audio.shape))
                step = jax.jit(lambda es, ds, ak, r, n: _roundtrip_scan(
                    enc, dec, es, ds, ak, r, n))
                args = (audio_k, received, nq)

            # Warmup/compile.
            i0, c0, es, ds = step(enc_state, dec_state, *args)
            jax.block_until_ready(c0)
            iters = max(20 // ticks, 4)
            t0 = time.perf_counter()
            for _ in range(iters):
                i0, c0, es, ds = step(es, ds, *args)
            jax.block_until_ready(c0)
            dt = (time.perf_counter() - t0) / (iters * ticks)

            streams = batch * 0.02 / dt
            if streams > best[0]:
                best = (streams, batch, dt * 1e3, ticks)
        except Exception as e:  # noqa: BLE001 — report what we can
            print(f"batch {batch} x{ticks} failed: {e}", file=sys.stderr)

    streams, batch, ms, ticks = best
    if streams <= 0.0:
        # Every config failed: report "broken", not "zero streams" — a
        # driver-visible nonzero rc distinguishes slow from broken.
        print(json.dumps({
            "metric": "realtime_3.2kbps_encode+decode_streams_per_chip",
            "value": 0.0, "unit": "streams",
            "vs_baseline": 0.0,
            "error": "all benchmark configs failed (see stderr)",
        }))
        sys.exit(1)

    # Roofline: the lockstep tick is bound by per-stream streaming-state HBM
    # traffic (PERF.md round-2 ablation) — every byte of carried state is
    # read and written once per tick (weights, a few MB, amortize to ~0).
    # bound = how many streams fit in 20 ms if state r+w ran at full HBM
    # bandwidth with zero compute; achieved/bound is the auditable "how
    # close to the physical floor" number VERDICT r2 asked for.
    state_bytes = sum(
        x.nbytes for x in jax.tree.leaves((enc.init_state(1),
                                           dec.init_state(1))))
    hbm_gbps = 819.0e9  # TPU v5e HBM2 bandwidth
    bound_streams = 0.02 * hbm_gbps / (2.0 * state_bytes)
    achieved_gbps = 2.0 * state_bytes * streams / 0.02
    print(json.dumps({
        "metric": "realtime_3.2kbps_encode+decode_streams_per_chip",
        "value": round(streams, 1),
        "unit": f"streams (B={batch}, {ms:.2f} ms/20ms-step, "
                f"{ticks}-tick scan)",
        "vs_baseline": round(streams / BASELINE_STREAMS, 3),
        "roofline": {
            "state_bytes_per_stream": int(state_bytes),
            "hbm_bw_gbps": hbm_gbps / 1e9,
            "achieved_state_gbps": round(achieved_gbps / 1e9, 1),
            "hbm_bound_streams": round(bound_streams, 1),
            "pct_of_hbm_bound": round(100.0 * streams / bound_streams, 1),
        },
    }))


def _roundtrip(enc, dec, enc_state, dec_state, audio, received, nq):
    indices, is_noise, enc_state = enc._step_impl(enc_state, audio, nq)
    out, is_cn, dec_state = dec._step_impl(dec_state, indices, received)
    return out, is_cn, enc_state, dec_state


def _roundtrip_scan(enc, dec, enc_state, dec_state, audio_k, received, nq):
    """k lockstep ticks inside one XLA while-loop (audio_k: [k, B, hop])."""
    from jax import lax

    import jax.numpy as jnp

    def body(carry, audio):
        es, ds, acc = carry
        indices, _, es = enc._step_impl(es, audio, nq)
        out, is_cn, ds = dec._step_impl(ds, indices, received)
        # Fold every tick's full audio into the carry: without this XLA may
        # dead-code-eliminate the audio tail (crossfade/clip/write) for all
        # ticks but the last, and the scan variant would overstate capacity.
        return (es, ds, acc + out), is_cn[:1]

    acc0 = jnp.zeros_like(audio_k[0])
    (enc_state, dec_state, acc), cns = lax.scan(
        body, (enc_state, dec_state, acc0), audio_k)
    return acc, cns, enc_state, dec_state


if __name__ == "__main__":
    main()
