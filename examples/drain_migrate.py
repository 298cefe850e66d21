"""Example: drain a serving host mid-call and resume on another.

A maintenance drain with thousands of live calls must not drop them: this
example runs concurrent calls through Encoder/DecoderServer, snapshots
both servers mid-call (engine state + slot table + per-stream bitrates +
counters, `save()`), "moves the host" by constructing fresh servers, and
resumes (`restore()`).  The decoded audio after migration is bit-identical
to a never-drained run — verified at the end.

Run from the repo root:

    python examples/drain_migrate.py --callers 3 --out_dir /tmp/migrate

The reference has no checkpointing (inference-only, SURVEY §5); this is
the deployment-scale counterpart its weights/version gate hints at.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lyra_tpu import config
from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer
from lyra_tpu.utils import wav


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default="/root/reference/lyra/testdata/sample1_16kHz.wav")
    p.add_argument("--callers", type=int, default=3)
    p.add_argument("--bitrate", type=int, default=3200)
    p.add_argument("--ticks_before_drain", type=int, default=25)
    p.add_argument("--ticks_after", type=int, default=25)
    p.add_argument("--out_dir", default="/tmp/lyra_tpu_migrate")
    args = p.parse_args(argv)

    data = wav.read_wav_int16(args.input)
    if data.sample_rate_hz != config.INTERNAL_SAMPLE_RATE:
        print(f"this demo expects a {config.INTERNAL_SAMPLE_RATE} Hz wav "
              f"(got {data.sample_rate_hz}); see loopback_call.py for the "
              f"multi-rate serving setup", file=sys.stderr)
        return 1
    hop = config.num_samples_per_hop(data.sample_rate_hz)
    cap = args.callers
    total_ticks = args.ticks_before_drain + args.ticks_after
    usable = (min(len(data.samples), total_ticks * hop) // hop) * hop
    if usable == 0:
        print("input shorter than one 20 ms hop", file=sys.stderr)
        return 1
    frames = data.samples[:usable].reshape(-1, hop)

    def tick(enc, dec, t):
        audio = np.broadcast_to(frames[t % len(frames)], (cap, hop))
        pkts = enc.tick({c: audio[c] for c in range(cap)})
        return dec.tick(pkts)

    # Host A carries the calls...
    enc_a = EncoderServer(cap, bitrate=args.bitrate)
    dec_a = DecoderServer(cap)
    enc_a.add_streams(range(cap))
    dec_a.add_streams(range(cap))
    # ...and a control pair runs the same calls with no drain (the oracle).
    enc_o = EncoderServer(cap, bitrate=args.bitrate)
    dec_o = DecoderServer(cap)
    enc_o.add_streams(range(cap))
    dec_o.add_streams(range(cap))

    decoded = {c: [] for c in range(cap)}
    oracle = {c: [] for c in range(cap)}
    for t in range(args.ticks_before_drain):
        out = tick(enc_a, dec_a, t)
        ref = tick(enc_o, dec_o, t)
        for c in range(cap):
            decoded[c].append(out[c])
            oracle[c].append(ref[c])

    # Maintenance drain: snapshot host A, stand up host B, resume.
    with tempfile.TemporaryDirectory() as snap:
        enc_a.save(os.path.join(snap, "enc"))
        dec_a.save(os.path.join(snap, "dec"))
        enc_b = EncoderServer(cap, bitrate=args.bitrate)
        dec_b = DecoderServer(cap)
        enc_b.restore(os.path.join(snap, "enc"))
        dec_b.restore(os.path.join(snap, "dec"))
    print(f"drained host A after {args.ticks_before_drain} ticks; "
          f"host B resumed {enc_b.num_active} calls")

    mismatches = 0
    for t in range(args.ticks_before_drain, total_ticks):
        out = tick(enc_b, dec_b, t)
        ref = tick(enc_o, dec_o, t)
        for c in range(cap):
            decoded[c].append(out[c])
            oracle[c].append(ref[c])
            if not np.array_equal(out[c], ref[c]):
                mismatches += 1

    os.makedirs(args.out_dir, exist_ok=True)
    for c in range(cap):
        wav.write_wav_int16(os.path.join(args.out_dir, f"caller{c}.wav"),
                            np.concatenate(decoded[c]),
                            config.INTERNAL_SAMPLE_RATE)
    print(f"{total_ticks} ticks x {cap} callers; post-migration audio "
          f"mismatches vs the never-drained oracle: {mismatches}")
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
