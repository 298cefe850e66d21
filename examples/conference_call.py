"""Example: a real conference call over UDP — N callers, rooms, reply
routing, mouth-to-ear audio both ways.

The full MCU deployment story end to end, every hop real:

  caller mic tick → client EncoderServer (device encode + pack)
    → one UDP uplink datagram per caller per 20 ms, each caller on their
      OWN socket (that socket's address is their identity to the bridge)
    → serve_main --mode bridge --echo reply (in another thread: native
      ingest pump → jitter buffer → device decode → per-room
      mix-minus-one → device re-encode → native egress, downlink sent
      back to each caller's uplink source — no address configuration
      anywhere)
    → per-caller downlink datagrams → client DecoderServer (device
      unpack + decode) → playout wavs in /tmp/lyra_tpu_conference

Rooms are consecutive pairs/groups of slots; even slots speak (the test
wav), odd slots are silent listeners, so each listener's downlink must
carry their roommate's speech and each speaker hears their silent
roommate (near-silence).  Reported: per-caller downlink RMS (the room
semantics, audibly) and ordinal uplink→downlink latency (wall clock from
sending this tick's uplink to draining the k-th downlink hop).

The call is real-time paced on the 20 ms grid (both sides; a priming
phase absorbs the first-tick device compiles so the measured call never
runs mid-compile).  Run from the repo root (CPU works:
LYRA_TPU_PLATFORM=cpu):

    python examples/conference_call.py --seconds 2 --callers 4 \
        --room_size 2
"""

import argparse
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer
from lyra_tpu.utils import wav

_HDR = 6  # 2 B slot + 4 B seq, big-endian


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input",
                   default="/root/reference/lyra/testdata/sample1_16kHz.wav")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--callers", type=int, default=4)
    p.add_argument("--room_size", type=int, default=2)
    p.add_argument("--bitrate", type=int, default=3200)
    args = p.parse_args(argv)
    n = args.callers
    if n % args.room_size:
        raise ValueError(f"{n} callers do not fill rooms of "
                         f"{args.room_size}")

    from lyra_tpu.tools import serve_main

    stop = threading.Event()
    ready = threading.Event()
    box = {}
    bridge_th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "bridge", "--capacity", str(n),
              "--room_size", str(args.room_size), "--seconds", "0",
              "--bitrate", str(args.bitrate), "--max_bitrate",
              str(args.bitrate), "--playout_delay", "1",
              "--report_every", "1e9", "--echo", "reply"],
        _on_ready=lambda port: (box.update(port=port), ready.set()),
        _stop=stop), daemon=True)
    bridge_th.start()
    if not ready.wait(300):
        raise RuntimeError("bridge never came up")
    bridge_addr = ("127.0.0.1", box["port"])

    # Client side: one batched encoder plays every caller's phone; even
    # slots speak the wav (each at a different offset), odd slots are
    # silent listeners.
    enc = EncoderServer(n, bitrate=args.bitrate)
    enc.add_streams(range(n))
    dec = DecoderServer(n)
    dec.add_streams(range(n))
    speech = wav.read_wav_int16(args.input).samples
    hop = enc.hop_samples
    socks = []
    for _ in range(n):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        s.setblocking(False)
        socks.append(s)

    ticks = int(args.seconds * 50)

    # Pre-encode every caller's whole uplink before the call (a phone
    # encodes on its own silicon; here one host core runs the bridge AND
    # all the phones, so the live loop must be pure datagram IO to hold
    # the 20 ms grid).  Streaming encoder state carries tick to tick, so
    # this is the exact packet sequence a live encoder would emit.
    uplinks = []
    for t in range(ticks):
        audio = np.zeros((n, hop), np.int16)
        for s_ in range(0, n, 2):  # even slots speak
            start = (t * hop + 1600 * s_) % max(1, len(speech) - hop)
            audio[s_] = speech[start: start + hop]
        uplinks.append(enc.tick_wire(audio))
    shape = uplinks[0][0].shape

    def send_tick(t, seq):
        pkts, sizes = uplinks[t]
        for slot in range(n):
            socks[slot].sendto(
                slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                + pkts[slot, : sizes[slot]].tobytes(), bridge_addr)

    def drain():
        down = np.zeros(shape, np.uint8)
        received = np.zeros(n, bool)
        dsz = np.zeros(n, np.int32)
        for slot in range(n):
            while True:
                try:
                    d = socks[slot].recvfrom(2048)[0]
                except BlockingIOError:
                    break
                payload = d[_HDR:]
                down[slot, : len(payload)] = np.frombuffer(payload, np.uint8)
                received[slot] = True
                dsz[slot] = len(payload)
        return down, received, dsz

    # Priming: pace the first uplink ticks (recycled) until downlink
    # flows from every caller — the bridge compiles its device programs
    # on its first real tick, and a live call cannot start mid-compile.
    primed = set()
    seq = 0
    t_next = time.perf_counter()
    deadline = time.perf_counter() + 300
    while len(primed) < n and time.perf_counter() < deadline:
        while time.perf_counter() < t_next:
            time.sleep(0.001)
        t_next = max(t_next, time.perf_counter()) + 0.02
        send_tick(seq % ticks, seq)
        seq += 1
        _, received, _ = drain()
        primed.update(np.flatnonzero(received).tolist())
    if len(primed) < n:
        raise RuntimeError(f"downlink never reached callers "
                           f"{sorted(set(range(n)) - primed)}")

    # The measured call: pure IO on the 20 ms grid — send tick t's
    # uplink, drain and record whatever downlink arrived.  Latency is
    # ordinal (steady state both ways: hop k's drain minus uplink k's
    # send is the pipeline budget up to a constant pacing offset).
    sent_at = []
    got_hops = [0] * n
    latencies = []
    recorded = []  # (down, received, sizes) per tick, decoded after
    for t in range(ticks):
        while time.perf_counter() < t_next:
            time.sleep(0.001)
        t_next = max(t_next, time.perf_counter()) + 0.02
        send_tick(t, seq)
        sent_at.append(time.perf_counter())
        seq += 1
        down, received, dsz = drain()
        now = time.perf_counter()
        for slot in np.flatnonzero(received):
            k = got_hops[slot]
            if k < len(sent_at):
                latencies.append(now - sent_at[k])
            got_hops[slot] += 1
        recorded.append((down, received, dsz))

    stop.set()
    bridge_th.join(60)
    for s in socks:
        s.close()

    # Decode the recorded downlink tick-by-tick (same DecoderServer
    # streaming path a live client runs, just off the clock now).
    playout = [[] for _ in range(n)]
    for down, received, dsz in recorded:
        pcm = dec.tick_wire(down, received, dsz)
        for slot in np.flatnonzero(received):
            playout[slot].append(np.asarray(pcm[slot]))

    out_dir = "/tmp/lyra_tpu_conference"
    os.makedirs(out_dir, exist_ok=True)
    print(f"{ticks} ticks, {n} callers in rooms of {args.room_size} "
          f"over UDP loopback (reply-routed):")
    for slot in range(n):
        audio_out = (np.concatenate(playout[slot]) if playout[slot]
                     else np.zeros(1, np.int16))
        rms = float(np.sqrt(np.mean(audio_out.astype(np.float64) ** 2)))
        role = "speaker " if slot % 2 == 0 else "listener"
        wav.write_wav_int16(
            os.path.join(out_dir, f"caller{slot}_downlink.wav"),
            audio_out.astype(np.int16), 16000)
        print(f"  caller {slot} ({role}): {got_hops[slot]} downlink hops, "
              f"downlink RMS {rms:7.1f}")
    if latencies:
        lat = np.array(latencies) * 1e3
        print(f"uplink-send→downlink-drain latency (realtime-paced, "
              f"ordinal): mean {lat.mean():.1f} ms, "
              f"p95 {np.percentile(lat, 95):.1f} ms over {len(lat)} hops")
    print(f"wavs in {out_dir}")
    # The room semantics, audibly: listeners hear their speaking roommate.
    listeners = [np.sqrt(np.mean(np.concatenate(playout[s]).astype(
        np.float64) ** 2)) for s in range(1, n, 2) if playout[s]]
    if listeners and max(listeners) < 100:
        print("WARNING: listener downlinks are near-silent; "
              "room mixing did not deliver speech")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
