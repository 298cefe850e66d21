"""Throughput benchmark: concurrent real-time Lyra streams per chip.

Measures the batched lockstep encode+decode tick (one 20 ms frame per
stream per tick: SoundStream encode → RVQ quantize → RVQ decode → LyraGAN
decode with the full PLC/fade machinery), served as a multi-wave schedule
(W interleaved jit calls of S streams each — PERF.md round 3), and reports
how many concurrent real-time streams one chip sustains:
streams = W * S * 0.02s / tick_time.

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

# --bits {64,120,184} pins the fleet at that wire size (the reference's
# benchmark protocol is 120 bits, reference: lyra/lyra_benchmark_lib.cc:58);
# --mixed runs a fleet with rows split evenly across all three bitrates
# (max_bitrate=9200 program, per-row nq).  Default stays the 3.2 kbps
# headline the driver records.
_BITRATE_OF_BITS = {64: 3200, 120: 6000, 184: 9200}


def _parse_args(argv):
    bits, mixed = 64, False
    it = iter(argv)
    for a in it:
        if a == "--bits":
            v = next(it, None)
            if v is None:
                raise SystemExit("--bits needs a value (64|120|184)")
            bits = int(v)
            if bits not in _BITRATE_OF_BITS:
                raise SystemExit(f"--bits must be one of "
                                 f"{sorted(_BITRATE_OF_BITS)}, got {bits}")
        elif a == "--mixed":
            mixed = True
        else:
            raise SystemExit(f"unknown arg {a!r} (use --bits N | --mixed)")
    return bits, mixed


def main():
    import jax

    bits, mixed = _parse_args(sys.argv[1:])

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
    # max_bitrate caps the compiled RVQ stages at what the wire can carry
    # (3200 default: the engines statically skip the 30 stages a 64-bit
    # fleet never uses; --mixed needs the full 9200 program).
    max_bitrate = 9200 if mixed else _BITRATE_OF_BITS[bits]
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=max_bitrate)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=max_bitrate)
    rng = np.random.RandomState(0)
    label = ("mixed_3.2+6.0+9.2kbps" if mixed
             else f"{_BITRATE_OF_BITS[bits] / 1000:.1f}kbps")

    # streams, wave_batch, tick_ms, n_waves, program_bytes_per_wave
    best = (0.0, 0, 0.0, 1, 0.0)
    # Wave schedule (PERF.md round 3): the fleet is served as W interleaved
    # jit calls of S streams each per 20 ms tick.  S~8k sits on the linear
    # part of the HBM working-set curve where one B=16384 program is past
    # the knee — two waves of 8192 beat one 16384 call by ~15% measured.
    # Physical floor for one tick: every stream's carried state crosses HBM
    # (read + write) once — used to reject broken timing measurements (a
    # tick "faster than the memory system" means a wait was lost, e.g. a
    # dropped dependency edge through the dev tunnel, not a fast tick).
    state_bytes = sum(
        x.nbytes for x in jax.tree.leaves((enc.init_state(1),
                                           dec.init_state(1))))
    hbm_gbps = 819.0e9  # TPU v5e HBM2 bandwidth

    for wave_batch, n_waves in ((16384, 1), (8192, 2), (7168, 2)):
        try:
            import jax.numpy as jnp

            audio = jnp.asarray(
                rng.randint(-16000, 16000, (wave_batch, 320)), jnp.float32)
            received = jnp.ones((wave_batch,), bool)
            if mixed:
                # Rows split evenly across the three wire sizes — the
                # mixed-fleet shape the device mixed-wire kernel serves.
                stages = np.array([64, 120, 184]) // config.BITS_PER_QUANTIZER
                nq = jnp.asarray(np.tile(stages,
                                         (wave_batch + 2) // 3)[:wave_batch],
                                 jnp.int32)
            else:
                nq = jnp.full(
                    (wave_batch,), bits // config.BITS_PER_QUANTIZER,
                    jnp.int32)
            step = jax.jit(lambda es, ds, a, r, n: _roundtrip(
                enc, dec, es, ds, a, r, n))
            waves = [[enc.init_state(wave_batch), dec.init_state(wave_batch)]
                     for _ in range(n_waves)]
            # Warmup/compile.
            for w in waves:
                i0, c0, w[0], w[1] = step(w[0], w[1], audio, received, nq)
            jax.block_until_ready(c0)

            floor = 2.0 * state_bytes * wave_batch * n_waves / hbm_gbps
            # Tunnel weather varies on second scales (±10% observed): time
            # each config until two VALID passes land and keep the fastest.
            # A sub-floor pass means a lost wait (broken timing), never a
            # fast tick — it doesn't count.
            dt, valid, iters = None, 0, 20
            for attempt in range(4):
                outs = []
                t0 = time.perf_counter()
                for _ in range(iters):
                    for w in waves:
                        i0, c0, w[0], w[1] = step(
                            w[0], w[1], audio, received, nq)
                        outs.append(c0)
                jax.block_until_ready(outs)
                measured = (time.perf_counter() - t0) / iters  # one tick
                if measured < floor:
                    print(f"wave config {n_waves}x{wave_batch}: measured "
                          f"{measured * 1e3:.2f} ms/tick below the "
                          f"{floor * 1e3:.2f} ms HBM floor — lost wait, "
                          f"remeasuring", file=sys.stderr)
                    continue
                dt = measured if dt is None else min(dt, measured)
                valid += 1
                if valid >= 2:
                    break
            if dt is None:
                raise RuntimeError(
                    f"every pass stayed below the physical HBM floor "
                    f"{floor * 1e3:.2f} ms — waits are broken")

            streams = n_waves * wave_batch * 0.02 / dt
            if streams > best[0]:
                # HLO bytes-accessed for the winning config's program: an
                # UPPER bound on true HBM traffic (fusion keeps some
                # buffers in VMEM and weights are counted per consuming
                # op), complementing the state-only LOWER bound below —
                # the measured tick must land between the two.
                try:
                    ca = step.lower(waves[0][0], waves[0][1], audio,
                                    received, nq).compile().cost_analysis()
                    ca = ca[0] if isinstance(ca, list) else ca
                    prog_bytes = float(ca.get("bytes accessed", 0.0))
                except Exception:
                    prog_bytes = 0.0
                best = (streams, wave_batch, dt * 1e3, n_waves, prog_bytes)
        except Exception as e:  # noqa: BLE001 — report what we can
            print(f"wave config {n_waves}x{wave_batch} failed: {e}",
                  file=sys.stderr)

    streams, batch, ms, n_waves, prog_bytes = best
    if streams <= 0.0:
        # Every config failed: report "broken", not "zero streams" — a
        # driver-visible nonzero rc distinguishes slow from broken.
        print(json.dumps({
            "metric": f"realtime_{label}_encode+decode_streams_per_chip",
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
    bound_streams = 0.02 * hbm_gbps / (2.0 * state_bytes)
    achieved_gbps = 2.0 * state_bytes * streams / 0.02
    # Diagnostic upper bound: the compiled program's HLO bytes-accessed
    # per tick.  Overcounts true HBM traffic (see comment above), so it
    # brackets the measured tick from above as the state floor does from
    # below; quoted as bytes, not as a percentage-of-roofline.
    prog_tick_bytes = prog_bytes * n_waves
    prog_roofline = (
        {
            "hlo_bytes_accessed_per_tick": int(prog_tick_bytes),
            "hlo_bytes_bound_ms": round(
                prog_tick_bytes / hbm_gbps * 1e3, 2),
        } if prog_tick_bytes else {})
    print(json.dumps({
        "metric": f"realtime_{label}_encode+decode_streams_per_chip",
        "value": round(streams, 1),
        "unit": f"streams ({n_waves}x{batch} wave schedule, "
                f"{ms:.2f} ms/20ms-tick)",
        "vs_baseline": round(streams / BASELINE_STREAMS, 3),
        "roofline": {
            "state_bytes_per_stream": int(state_bytes),
            "hbm_bw_gbps": hbm_gbps / 1e9,
            "achieved_state_gbps": round(achieved_gbps / 1e9, 1),
            "hbm_bound_streams": round(bound_streams, 1),
            "pct_of_hbm_bound": round(100.0 * streams / bound_streams, 1),
            **prog_roofline,
        },
    }))


def _roundtrip(enc, dec, enc_state, dec_state, audio, received, nq):
    indices, is_noise, enc_state = enc._step_impl(enc_state, audio, nq)
    out, is_cn, dec_state = dec._step_impl(dec_state, indices, received)
    return out, is_cn, enc_state, dec_state


if __name__ == "__main__":
    main()
