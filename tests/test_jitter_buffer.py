"""Native jitter buffer + packed array serving path tests."""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.tools.jitter_buffer import JitterBuffer


@pytest.fixture()
def jb():
    return JitterBuffer(capacity=4, packet_size=23, depth=8)


def test_in_order_delivery(jb):
    jb.add_stream(0)
    for seq in range(3):
        assert jb.insert(0, seq, bytes([seq] * 8)) == 0
    for seq in range(3):
        pkts, received, sizes = jb.collect()
        assert received[0] and sizes[0] == 8
        assert pkts[0, 0] == seq
    _, received, _ = jb.collect()
    assert not received[0]  # nothing queued -> loss tick


def test_reorder_duplicate_late(jb):
    jb.add_stream(1)
    assert jb.insert(1, 1, b"b" * 8) == 0  # out of order
    assert jb.insert(1, 0, b"a" * 8) == 0
    assert jb.insert(1, 1, b"x" * 8) == 3  # duplicate dropped
    pkts, received, sizes = jb.collect()
    assert received[1] and pkts[1, 0] == ord("a")
    pkts, received, _ = jb.collect()
    assert received[1] and pkts[1, 0] == ord("b")
    assert jb.insert(1, 0, b"z" * 8) == 2  # already played: late drop
    assert jb.stats()["late_drops"] == 1
    assert jb.stats()["dup_drops"] == 1


def test_gap_becomes_loss_then_resumes(jb):
    jb.add_stream(2)
    jb.insert(2, 0, b"p" * 8)
    jb.insert(2, 2, b"q" * 8)  # seq 1 never arrives
    _, received, _ = jb.collect()
    assert received[2]
    _, received, _ = jb.collect()
    assert not received[2]  # the gap -> PLC tick
    pkts, received, _ = jb.collect()
    assert received[2] and pkts[2, 0] == ord("q")


def test_overflow_and_inactive(jb):
    jb.add_stream(3)
    assert jb.insert(3, 100, b"y" * 8) == 4  # beyond depth -> dropped
    with pytest.raises(ValueError):
        jb.insert(9, 0, b"")
    _, received, _ = jb.collect()
    assert not received[0]  # never added


def test_dtx_empty_packet(jb):
    jb.add_stream(0)
    assert jb.insert(0, 0, b"") == 0
    pkts, received, sizes = jb.collect()
    assert received[0] and sizes[0] == 0


def test_packed_serving_roundtrip(model_path, testdata_path):
    """JitterBuffer -> DecoderServer.tick_packed end to end, with reordering
    and loss, against EncoderServer.tick_packed output."""
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer
    from lyra_tpu.utils import wav

    cap = 4
    enc = EncoderServer(cap, model_path=model_path, bitrate=3200)
    dec = DecoderServer(cap, model_path=model_path)
    jb = JitterBuffer(cap, config.packet_size(184))
    for s, sid in enumerate(["a", "b"]):
        enc.add_stream(sid)
        dec.add_stream(sid)
        jb.add_stream(dec._by_id[sid])
    enc.set_bitrate("b", 9200)

    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    x = data.samples[: 6 * 320].reshape(6, 320)

    audio_in = np.zeros((cap, 320), np.float32)
    outs = []
    for t in range(6):
        audio_in[list(enc._by_id.values())] = x[t]
        pkts, sizes = enc.tick_packed(audio_in)
        assert sizes[enc._by_id["a"]] == config.packet_size(64)
        assert sizes[enc._by_id["b"]] == config.packet_size(184)
        # deliver out of order / with loss for stream b
        ia, ib = dec._by_id["a"], dec._by_id["b"]
        jb.insert(ia, t, bytes(pkts[ia, : sizes[ia]]))
        if t != 3:  # drop b's packet at t=3
            jb.insert(ib, t, bytes(pkts[ib, : sizes[ib]]))
        audio = dec.tick_packed(*jb.collect())
        assert audio.shape == (cap, 320)
        outs.append(audio)
    # stream a decoded continuously (speech-level energy by the end)
    a_rms = np.sqrt((outs[-1][dec._by_id["a"]].astype(float) ** 2).mean())
    assert a_rms > 100


def test_playout_delay_absorbs_network_delay():
    """A stream whose packets all arrive one tick late plays cleanly with
    playout_delay=2; the zero-delay stream's late arrivals are counted
    drops — a NEAR-late run must NOT repoint the schedule quickly (a
    transient delay burst would become permanent extra latency) — until
    half a second of uninterrupted lateness proves a persistent shift and
    the late-side resync locks onto the sender's schedule."""
    jb = JitterBuffer(capacity=2, packet_size=8, depth=8)
    jb.add_stream(0, playout_delay=0)
    jb.add_stream(1, playout_delay=2)
    got0, got1 = [], []
    for t in range(30):
        if t >= 1:  # packet for t-1 arrives now (one tick of network delay)
            jb.insert(0, t - 1, bytes([t - 1] * 4))
            jb.insert(1, t - 1, bytes([t - 1] * 4))
        _, received, _ = jb.collect()
        got0.append(bool(received[0]))
        got1.append(bool(received[1]))
    # Zero-delay stream: 24 late drops (burst protection), then the 25th
    # consecutive NEAR-late insert resyncs the playout point
    # (re-absorbing its playout delay of 0), and every tick after plays.
    assert got0[:25] == [False] * 25
    assert got0[25:] == [True] * 5
    assert got1[2:] == [True] * 28  # delayed stream plays every tick
    st = jb.stats()
    assert st["resyncs"] == 1
    assert st["late_drops"] == 24


def test_late_origin_resync_revives_warm_standby():
    """A host whose collect loop ran long before a sender appeared (warm
    migration standby, receiver restart) has head_seq far AHEAD of the
    sender's origin.  Without a late-side resync every packet is late
    forever (both sides advance 50/s and the gap never closes); with it
    the stream locks on within kResyncAfter packets."""
    jb = JitterBuffer(capacity=1, packet_size=8, depth=8)
    jb.add_stream(0, playout_delay=1)
    for _ in range(500):  # the standby ticks with no traffic
        jb.collect()
    played = []
    for seq in range(12):  # caller appears with a fresh sequence origin
        jb.insert(0, seq, bytes([seq] * 4))
        _, received, _ = jb.collect()
        played.append(bool(received[0]))
    st = jb.stats()
    assert st["resyncs"] == 1
    assert st["late_drops"] == 2  # the pre-resync packets, nothing after
    # Locked on: every tick after resync + playout delay plays a packet.
    assert played[4:] == [True] * 8


def test_create_rejects_oversized_packet_size():
    # Per-slot sizes are uint8 in the native struct; packet_size > 255 would
    # silently truncate recorded sizes. Creation must fail instead.
    with pytest.raises(RuntimeError):
        JitterBuffer(capacity=2, packet_size=256, depth=4)
    with pytest.raises(RuntimeError):
        JitterBuffer(capacity=0, packet_size=8, depth=4)


def test_negative_sequence_numbers_rejected():
    """Negative start_seq/seq would index the ring with C++ truncating
    modulo (negative index = out-of-bounds heap write): hard-rejected."""
    jb = JitterBuffer(capacity=2, packet_size=8, depth=4)
    with pytest.raises(ValueError):
        jb.add_stream(0, start_seq=-10)
    jb.add_stream(0, start_seq=0)
    # A negative seq from a corrupt wire header is a counted late drop
    # (head >= 0 always, so it never reaches the ring indexing) — a
    # routine transport event, not an ingest-loop exception.
    assert jb.insert(0, -1, b"x" * 8) == 2
    assert jb.stats()["late_drops"] == 1


def test_insert_after_remove_is_a_counted_drop():
    """Late arrivals for a torn-down call are routine transport events:
    dropped and counted, never an exception that kills the ingest loop."""
    jb = JitterBuffer(capacity=2, packet_size=8, depth=4)
    jb.add_stream(0, start_seq=0)
    jb.remove_stream(0)
    rc = jb.insert(0, 1, b"y" * 8)
    assert rc == 5
    assert jb.stats()["inactive_drops"] == 1


def test_resync_after_sustained_overflow(jb):
    """A receiver stall (or a sender with a different sequence origin)
    leaves arriving seqs permanently past the playout window; after 3
    consecutive overflow inserts the stream's schedule jumps to the
    arriving sequence (re-absorbing the playout delay) instead of dying
    forever.  A lone stray far-future packet stays a counted drop."""
    jb.add_stream(0, playout_delay=1)
    assert jb.insert(0, 0, b"a" * 8) == 0
    jb.collect()  # absorbs the playout delay
    pkts, received, _ = jb.collect()
    assert received[0] and pkts[0, 0] == ord("a")

    # One stray far-future packet, then normal traffic: no resync.
    assert jb.insert(0, 500, b"x" * 8) == 4
    assert jb.insert(0, 2, b"b" * 8) == 0  # in-window resets the streak
    assert jb.stats()["resyncs"] == 0

    # Sustained overflow (an advancing sender the schedule lost): the
    # third consecutive far-future insert resyncs and is FILED.
    assert jb.insert(0, 1000, b"p" * 8) == 4
    assert jb.insert(0, 1001, b"q" * 8) == 4
    assert jb.insert(0, 1002, b"r" * 8) == 0  # resync: accepted
    assert jb.insert(0, 1003, b"s" * 8) == 0
    st = jb.stats()
    assert st["resyncs"] == 1 and st["overflow_drops"] == 3
    _, received, _ = jb.collect()
    assert not received[0]  # playout delay re-absorbed after the jump
    pkts, received, sizes = jb.collect()
    assert received[0] and pkts[0, 0] == ord("r")  # plays at 1002
    pkts, received, _ = jb.collect()
    assert received[0] and pkts[0, 0] == ord("s")


# ---------------------------------------------------------------------------
# Adaptive playout delay (native/jitter_buffer.cc AdaptDecide)


def test_adaptive_grows_by_observed_lateness():
    """Late packets in a window grow the slot's playout delay by the worst
    observed lateness (bounded), realized as a concealment pause — later
    packets of the same tardiness then land in time."""
    jb = JitterBuffer(capacity=2, packet_size=23, depth=16)
    jb.set_adaptive(0, 8, window=10)
    jb.add_stream(0, start_seq=0, playout_delay=0)
    for _ in range(5):
        jb.collect()  # head -> 5
    assert jb.insert(0, 2, b"x" * 8) == 2  # 3 ticks late: still a drop
    for _ in range(5):  # window closes
        jb.collect()
    st = jb.adapt_stats()
    assert st["grows"] == 1 and jb.delay(0) == 3  # grew by the lateness
    assert st["delay_max"] == 3 and st["active_streams"] == 1
    # The grow is a pause: the next 3 ticks emit nothing even with data.
    head = 10
    assert jb.insert(0, head, b"y" * 8) == 0
    for _ in range(3):
        _, received, _ = jb.collect()
        assert not received[0]
    _, received, _ = jb.collect()
    assert received[0]  # …and then the same packet plays, now safely


def test_adaptive_shrinks_to_minimum_needed_cushion():
    """Sustained excess cushion is given back one tick per 3 windows,
    converging to the smallest delay whose window-min margin stays < 2 —
    the latency the jitter actually requires, not the configured guess."""
    jb = JitterBuffer(capacity=1, packet_size=23, depth=16)
    jb.set_adaptive(0, 8, window=5)
    jb.add_stream(0, start_seq=0, playout_delay=4)
    received_total = 0
    for t in range(70):  # punctual sender: seq t at tick t
        assert jb.insert(0, t, b"z" * 8) == 0
        _, received, _ = jb.collect()
        received_total += int(received[0])
    st = jb.adapt_stats()
    assert jb.delay(0) == 1, f"did not converge: {st}"
    assert st["shrinks"] == 3 and st["grows"] == 0
    # A shrink tick skips one packet but still plays the next (the jump is
    # in content, not output); only the initial 4 pause ticks were silent.
    assert received_total == 70 - 4


def test_adaptive_off_by_default_and_bounds_are_loud():
    jb = JitterBuffer(capacity=1, packet_size=23, depth=8)
    jb.add_stream(0, playout_delay=2)
    for t in range(30):
        jb.insert(0, t, b"a" * 8)
        jb.collect()
    assert jb.delay(0) == 2  # static depth: nothing moved
    assert jb.adapt_stats()["grows"] == 0

    with pytest.raises(ValueError, match="adaptive"):
        jb.set_adaptive(3, 2, window=10)  # min > max
    with pytest.raises(ValueError, match="adaptive"):
        jb.set_adaptive(0, 8, window=10)  # max >= depth
    with pytest.raises(ValueError, match="adaptive"):
        jb.set_adaptive(0, 4, window=0)
    with pytest.raises(ValueError, match="bad stream slot"):
        jb.delay(9)


def test_adaptive_grow_is_bounded_and_silent_windows_decide_nothing():
    jb = JitterBuffer(capacity=1, packet_size=23, depth=8)
    jb.set_adaptive(1, 3, window=4)
    jb.add_stream(0, start_seq=0, playout_delay=1)
    for _ in range(20):
        jb.collect()  # silent sender: many windows, no decisions
    assert jb.adapt_stats() == {"grows": 0, "shrinks": 0, "delay_min": 1,
                                "delay_max": 1, "delay_mean": 1.0,
                                "active_streams": 1}
    # A stray ancient packet (further behind head than max_delay could
    # ever absorb) is desync/replay-class evidence, not jitter: it must
    # not move the delay — one hostile datagram per window would
    # otherwise pin the slot at max_delay forever.
    jb.insert(0, 0, b"x" * 8)  # head is 19: 19 ticks late
    for _ in range(4):
        jb.collect()
    assert jb.delay(0) == 1  # unmoved
    assert jb.adapt_stats()["grows"] == 0
    # Actionable lateness (within max_delay of head) grows, clamped at
    # max_delay even when the observed lateness exceeds the headroom.
    jb.add_stream(0, start_seq=100, playout_delay=1)  # fresh schedule
    jb.insert(0, 97, b"y" * 8)  # 3 ticks late: actionable (== max_delay)
    for _ in range(4):  # one full window
        jb.collect()
    assert jb.delay(0) == 3  # grew by min(lateness, max - current) = 2
    assert jb.adapt_stats()["grows"] == 1


def test_heads_export_and_reseed_locks_on_immediately():
    """Migration handoff at the transport layer: heads() is the playout
    schedule a snapshot carries (serve_main._transport_state); re-seeding
    a fresh buffer with it (add_stream(start_seq=head)) makes the
    caller's continuing sequence land in-window at once — zero late
    drops, zero resyncs — where a blind standby pays a streak of
    out-of-window drops before its first resync."""
    src = JitterBuffer(capacity=3, packet_size=8, depth=8)
    src.add_stream(0, playout_delay=1)
    src.add_stream(2, playout_delay=1)
    for t in range(40):
        src.insert(0, t, bytes([t % 251] * 4))
        src.insert(2, t, bytes([t % 251] * 4))
        src.collect()
    heads = src.heads()
    assert heads[1] == -1  # never admitted
    # 40 collects: the first absorbed the playout delay, 39 advanced head.
    assert heads[0] == heads[2] == 39

    dst = JitterBuffer(capacity=3, packet_size=8, depth=8)
    for slot in (0, 2):
        dst.add_stream(slot, start_seq=int(heads[slot]), playout_delay=1)
    played = 0
    for t in range(40, 52):  # the callers continue their live sequences
        dst.insert(0, t, bytes([t % 251] * 4))
        dst.insert(2, t, bytes([t % 251] * 4))
        _, received, _ = dst.collect()
        played += int(received[0]) + int(received[2])
    st = dst.stats()
    assert st["late_drops"] == 0 and st["overflow_drops"] == 0
    assert st["resyncs"] == 0
    # Silent ticks per slot: 1 re-absorbing the playout delay + 1 PLC for
    # seq 39 (in flight at handoff, lost); the other 10 of 12 play.
    assert played == 2 * 10


def test_insert_red_heals_without_counter_pollution():
    """insert_red files only into real holes and counts red_heals; the
    normal cases (primary already arrived, copy too late) return their
    codes WITHOUT touching the transport drop counters or the resync
    streak — redundancy traffic must not read as a network anomaly."""
    jb = JitterBuffer(capacity=4, packet_size=23, depth=8)
    jb.add_stream(0, playout_delay=0)
    assert jb.insert_red(0, 0, b"a" * 8) == 0  # heals a hole
    assert jb.red_heals == 1
    assert jb.insert_red(0, 0, b"a" * 8) == 3  # already there
    assert jb.insert(0, 1, b"b" * 8) == 0
    assert jb.insert_red(0, 1, b"c" * 8) == 3  # primary won; keep it
    out, received, sizes = jb.collect()
    assert received[0] and bytes(out[0, :sizes[0]]) == b"a" * 8
    assert jb.insert_red(0, 0, b"z" * 8) == 2   # playout passed: too late
    assert jb.insert_red(0, 99, b"z" * 8) == 4  # ahead of the window
    assert jb.insert_red(1, 0, b"z" * 8) == 5   # inactive slot
    st = jb.stats()
    assert st["late_drops"] == 0 and st["dup_drops"] == 0
    assert st["overflow_drops"] == 0 and st["inactive_drops"] == 0
    assert st["resyncs"] == 0
    assert jb.red_heals == 1
    # The primary's payload was kept over the redundant copy for seq 1.
    out, received, sizes = jb.collect()
    assert bytes(out[0, :sizes[0]]) == b"b" * 8


def test_adapt_export_and_seed_carries_learned_delay():
    """Failover/migration carry for ADAPTIVE playout (VERDICT r4 item 4):
    adapt_export's learned per-slot delay + shrink streak, seeded into a
    fresh buffer, resume each caller at the learned latency position —
    the pause refills the learned cushion, and a carried shrink streak
    completes one window sooner than a fresh one."""
    src = JitterBuffer(capacity=3, packet_size=8, depth=16)
    src.set_adaptive(0, 8, window=10)
    src.add_stream(0, start_seq=0, playout_delay=0)
    src.add_stream(2, start_seq=0, playout_delay=4)
    for _ in range(5):
        src.collect()
    src.insert(0, 2, b"x" * 4)  # 3 ticks late on slot 0
    for t in range(5, 25):  # slot 2: two comfortable windows -> 2 votes
        src.insert(2, t + 4, b"y" * 4)
        src.collect()
    delays, votes = src.adapt_export()
    assert delays[0] == 3  # grew by the observed lateness
    assert delays[1] == -1  # never admitted
    assert delays[2] == 4 and votes[2] == 2  # two shrink votes banked

    # The restored host: base admission (the heads reseed), adaptive on,
    # then the carried evidence.
    dst = JitterBuffer(capacity=3, packet_size=8, depth=16)
    dst.set_adaptive(0, 8, window=10)
    dst.add_stream(0, start_seq=100, playout_delay=0)
    dst.add_stream(2, start_seq=100, playout_delay=4)
    for slot in (0, 2):
        dst.adapt_seed(slot, int(delays[slot]), int(votes[slot]))
    assert dst.delay(0) == 3 and dst.delay(2) == 4
    # The seeded delay is also the refill pause: a packet of the same
    # tardiness that grew the source now lands safely on the FIRST window
    # after restore (no re-learning drops).
    assert dst.insert(0, 100, b"z" * 4) == 0
    for _ in range(3):
        _, received, _ = dst.collect()
        assert not received[0]  # cushion refilling
    _, received, _ = dst.collect()
    assert received[0]
    # Carried shrink streak: ONE more comfortable window completes the
    # 3-window earn (a fresh host would need all three again).
    for t in range(104, 114):
        dst.insert(2, t + 4, b"q" * 4)
        dst.collect()
    assert dst.delay(2) == 3 and dst.adapt_stats()["shrinks"] == 1


def test_adapt_seed_refusals_and_clamping():
    jb = JitterBuffer(capacity=2, packet_size=8, depth=16)
    jb.add_stream(0, playout_delay=1)
    with pytest.raises(ValueError, match="adapt_seed"):
        jb.adapt_seed(0, 3)  # adaptive off: static hosts keep their base
    jb.set_adaptive(1, 4, window=10)
    with pytest.raises(ValueError, match="adapt_seed"):
        jb.adapt_seed(1, 3)  # inactive slot
    with pytest.raises(ValueError, match="adapt_seed"):
        jb.adapt_seed(0, -1)
    jb.adapt_seed(0, 100)  # snapshot from a wider-bounded host: clamped
    assert jb.delay(0) == 4
    jb.adapt_seed(0, 0)
    assert jb.delay(0) == 1  # clamped up to ad_min too


def test_transport_state_round_trip_carries_adaptive_evidence():
    """The serve_main snapshot seam end to end at the transport layer:
    _transport_state exports heads + adaptive evidence, _reseed_transport
    re-seeds both on an adaptive host; a STATIC destination (or a static
    source snapshot) keeps the configured base."""
    from lyra_tpu.tools.serve_main import _reseed_transport, _transport_state

    src = JitterBuffer(capacity=2, packet_size=8, depth=16)
    src.set_adaptive(0, 8, window=10)
    src.add_stream(0, start_seq=0, playout_delay=0)
    for _ in range(5):
        src.collect()
    src.insert(0, 2, b"x" * 4)
    for _ in range(5):
        src.collect()
    assert src.delay(0) == 3
    tr = _transport_state(src, adaptive=True)
    # (The 10th collect closed the window and began the grow pause, so
    # head stands at 9, not 10.)
    assert tr["adapt_delays"][0] == 3 and tr["jb_heads"][0] == 9

    dst = JitterBuffer(capacity=2, packet_size=8, depth=16)
    dst.set_adaptive(0, 8, window=10)
    _reseed_transport(dst, tr, 2, playout_delay=1, adaptive=True)
    assert dst.delay(0) == 3  # learned position, not the base
    assert dst.heads()[0] == 9

    static = JitterBuffer(capacity=2, packet_size=8, depth=16)
    _reseed_transport(static, tr, 2, playout_delay=1, adaptive=False)
    assert static.delay(0) == 1  # static host: configured base
    # A pre-adaptive snapshot (no adapt keys) reseeds heads only.
    old = {"jb_heads": tr["jb_heads"]}
    dst2 = JitterBuffer(capacity=2, packet_size=8, depth=16)
    dst2.set_adaptive(0, 8, window=10)
    _reseed_transport(dst2, old, 2, playout_delay=1, adaptive=True)
    assert dst2.delay(0) == 1 and dst2.heads()[0] == 9
