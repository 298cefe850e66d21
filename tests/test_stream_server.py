"""Serving runtime tests: slot admission, mixed bitrates, loss handling."""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.engine import INTERNAL_HOP
from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer


@pytest.fixture(scope="module")
def servers(model_path):
    return (EncoderServer(4, model_path=model_path, bitrate=3200),
            DecoderServer(4, model_path=model_path))


def test_roundtrip_with_admission_and_loss(servers, testdata_path):
    from lyra_tpu.utils import wav

    enc, dec = servers
    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    x = data.samples[: 10 * INTERNAL_HOP].reshape(10, INTERNAL_HOP)

    enc.add_stream("a")
    enc.add_stream("b", bitrate=9200)
    dec.add_stream("a")
    dec.add_stream("b")
    assert enc.num_active == dec.num_active == 2

    for t in range(6):
        pkts = enc.tick({"a": x[t], "b": x[t]})
        assert len(pkts["a"]) == config.packet_size(64)
        assert len(pkts["b"]) == config.packet_size(184)
        if t == 3:
            pkts["b"] = None  # lose one packet for stream b
        audio = dec.tick(pkts)
        assert audio["a"].shape == (INTERNAL_HOP,)
        assert audio["b"].dtype == np.int16
    assert not dec.is_comfort_noise("a")

    # Evict "a", admit "c" into the freed slot: fresh state, same program.
    enc.remove_stream("a")
    dec.remove_stream("a")
    slot = enc.add_stream("c")
    dec.add_stream("c")
    assert slot == 0
    pkts = enc.tick({"b": x[6], "c": x[6]})
    audio = dec.tick(pkts)
    assert set(audio) == {"b", "c"}


def test_capacity_and_duplicate_errors(model_path):
    enc = EncoderServer(1, model_path=model_path)
    enc.add_stream("x")
    with pytest.raises(KeyError):
        enc.add_stream("x")
    with pytest.raises(RuntimeError):
        enc.add_stream("y")
    with pytest.raises(ValueError):
        enc.set_bitrate("x", 1234)


def test_bad_bitrate_admission_leaves_no_half_admitted_stream(model_path):
    """add_stream with an invalid bitrate must fail atomically: the slot
    stays free and the same id can be admitted again afterwards."""
    enc = EncoderServer(1, model_path=model_path, bitrate=3200)
    with pytest.raises(ValueError):
        enc.add_stream("a", bitrate=1234)
    assert "a" not in enc._by_id
    assert enc.add_stream("a") == 0  # slot 0 was never consumed


def test_reused_slot_does_not_inherit_evicted_bitrate(model_path):
    """A stream admitted with the server default bitrate into a slot whose
    previous occupant had a custom bitrate must get the default, not the
    evicted stream's setting (reference: per-stream set_bitrate,
    lyra_encoder.h:96-101)."""
    enc = EncoderServer(1, model_path=model_path, bitrate=3200)
    enc.add_stream("hi", bitrate=9200)
    hop = [0] * 320
    assert len(enc.tick({"hi": hop})["hi"]) == 23  # 9.2 kbps packet
    enc.remove_stream("hi")
    enc.add_stream("fresh")  # no explicit bitrate -> server default
    assert len(enc.tick({"fresh": hop})["fresh"]) == 8  # 3.2 kbps packet


def test_decoder_comfort_noise_after_sustained_loss(servers):
    _, dec = servers
    dec_ids = list(dec._by_id)
    target = dec_ids[0]
    for _ in range(10):
        dec.tick({sid: None for sid in dec_ids})
    assert dec.is_comfort_noise(target)


def test_malformed_packet_is_treated_as_loss(model_path):
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("good")
    dec.add_stream("evil")
    valid = bytes(config.packet_size(64))
    # Wrong length (not a supported packet size) must not raise out of
    # tick(): the stream gets PLC for the hop, the batch keeps running.
    audio = dec.tick({"good": valid, "evil": b"\x01\x02\x03"})
    assert set(audio) == {"good", "evil"}
    assert dec.bad_packets[dec._by_id["evil"]] == 1
    assert dec.bad_packets[dec._by_id["good"]] == 0


def test_async_pipelined_ticks_match_sync(model_path):
    """tick_packed_async == tick_packed shifted by one tick: ordering and
    loss semantics survive the pipelining (same engine state trajectory,
    outputs delayed by exactly one call)."""
    cap = 4
    enc_a = EncoderServer(cap, model_path=model_path, bitrate=6000)
    enc_s = EncoderServer(cap, model_path=model_path, bitrate=6000)
    dec_a = DecoderServer(cap, model_path=model_path)
    dec_s = DecoderServer(cap, model_path=model_path)
    for s in (enc_a, enc_s, dec_a, dec_s):
        for sid in range(cap):
            s.add_stream(sid)

    rng = np.random.default_rng(3)
    ticks = 5
    audio = rng.integers(-8000, 8000, (ticks, cap, INTERNAL_HOP)).astype(np.int16)
    loss = rng.uniform(size=(ticks, cap)) < 0.3

    sync_out, async_out = [], []
    for t in range(ticks):
        pkts, sizes = enc_s.tick_packed(audio[t])
        received = ~loss[t]
        sync_out.append(dec_s.tick_packed(pkts, received, sizes))

        got = enc_a.tick_packed_async(audio[t])
        if t == 0:
            assert got is None
        else:
            pkts_a, sizes_a = got
            out_a = dec_a.tick_packed_async(pkts_a, ~loss[t - 1], sizes_a)
            if t == 1:
                assert out_a is None
            else:
                async_out.append(out_a)
    # Drain the pipeline: encoder tick t-1, then the last two decoder ticks.
    pkts_a, sizes_a = enc_a.flush_async()
    out_a = dec_a.tick_packed_async(pkts_a, ~loss[ticks - 1], sizes_a)
    async_out.append(out_a)
    async_out.append(dec_a.flush_async())

    assert len(async_out) == len(sync_out)
    for t, (a, s) in enumerate(zip(async_out, sync_out)):
        np.testing.assert_array_equal(a, s, err_msg=f"tick {t}")
        assert a.shape == (cap, INTERNAL_HOP)


def test_async_drain_uses_submit_time_wire_config(model_path):
    """set_bitrate/add_stream between an async submit and its drain must not
    repack the in-flight tick with the new config (the indices were encoded
    under the old one)."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200)
    enc.add_stream("a")
    rng = np.random.RandomState(0)
    hop = rng.randint(-8000, 8000, (2, INTERNAL_HOP)).astype(np.float32)

    assert enc.tick_packed_async(hop) is None  # prime the pipeline
    enc.set_bitrate("a", 9200)                 # config change mid-flight
    out, sizes = enc.tick_packed_async(hop)    # drains the 3200-bps tick
    assert sizes[enc._by_id["a"]] == config.packet_size(64)  # old config
    out, sizes = enc.flush_async()             # this tick saw 9200
    assert sizes[enc._by_id["a"]] == config.packet_size(184)

    # A stream admitted mid-flight must not emit a packet for the tick that
    # predates its admission.
    enc2 = EncoderServer(2, model_path=model_path, bitrate=3200)
    enc2.add_stream("a")
    assert enc2.tick_packed_async(hop) is None
    enc2.add_stream("b")
    out, sizes = enc2.tick_packed_async(hop)
    assert sizes[enc2._by_id["b"]] == 0
    out, sizes = enc2.flush_async()
    assert sizes[enc2._by_id["b"]] == config.packet_size(64)


def test_decoder_rejects_packets_beyond_engine_bitrate_cap(model_path):
    """A max_bitrate-capped engine statically skips RVQ stages; packets
    that need them must be refused (treated as loss), not silently decoded
    degraded."""
    from lyra_tpu.codec.engine import DecoderEngine

    dec = DecoderServer(
        2, engine=DecoderEngine(model_path=model_path, max_bitrate=3200))
    dec.add_stream("a")
    ok_pkt = bytes(config.packet_size(64))
    big_pkt = bytes(config.packet_size(120))  # 6 kbps: over the cap
    dec.tick({"a": ok_pkt})
    assert dec.bad_packets[dec._by_id["a"]] == 0
    dec.tick({"a": big_pkt})
    assert dec.bad_packets[dec._by_id["a"]] == 1

    # Packed path: same refusal, whole size group counted.
    cap = dec.capacity
    pkts = np.zeros((cap, config.packet_size(120)), np.uint8)
    sizes = np.full(cap, config.packet_size(120), np.int32)
    received = np.ones(cap, bool)
    dec.tick_packed(pkts, received, sizes)
    assert dec.bad_packets[dec._by_id["a"]] == 2

    # Encoder-side: configuring a bitrate above the cap is a hard error.
    from lyra_tpu.codec.engine import EncoderEngine

    enc = EncoderServer(
        2, engine=EncoderEngine(model_path=model_path, max_bitrate=3200))
    enc.add_stream("a")
    with pytest.raises(ValueError, match="max_bitrate"):
        enc.set_bitrate("a", 9200)
    with pytest.raises(ValueError, match="max_bitrate"):
        EncoderServer(2, engine=EncoderEngine(
            model_path=model_path, max_bitrate=3200), bitrate=6000)


def test_bad_packet_counter_resets_on_slot_reuse(model_path):
    dec = DecoderServer(1, model_path=model_path)
    dec.add_stream("a")
    dec.tick({"a": b"\x00\x01\x02"})  # malformed size
    slot = dec._by_id["a"]
    assert dec.bad_packets[slot] == 1
    dec.remove_stream("a")
    dec.add_stream("b")  # reuses slot 0
    assert dec._by_id["b"] == slot
    assert dec.bad_packets[slot] == 0


def test_async_drain_never_leaks_across_slot_reuse(model_path):
    """A slot re-admitted between an async submit and its drain must drain
    size-0 (encoder) / silence (decoder): the evicted stream's in-flight
    packet or audio must never be attributed to the slot's new occupant."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200)
    dec = DecoderServer(2, model_path=model_path)
    for s in (enc, dec):
        s.add_stream("old0")
        s.add_stream("keep")
    hop = np.full((2, INTERNAL_HOP), 4000, np.int16)

    assert enc.tick_packed_async(hop) is None
    # Slot 0 changes hands while tick 0 is in flight.
    enc.remove_stream("old0")
    slot = enc.add_stream("new0")
    assert slot == 0
    pkts, sizes = enc.tick_packed_async(hop)
    assert sizes[0] == 0          # old0's packet suppressed
    assert sizes[1] > 0           # keep's packet unaffected
    pkts, sizes = enc.flush_async()
    assert sizes[0] > 0           # tick 1 was submitted after re-admission

    valid = np.zeros((2, config.packet_size(64)), np.uint8)
    rec = np.ones(2, bool)
    szs = np.full(2, config.packet_size(64), np.int32)
    assert dec.tick_packed_async(valid, rec, szs) is None
    dec.remove_stream("old0")
    dec.add_stream("new0")
    audio = dec.tick_packed_async(valid, rec, szs)
    assert np.all(audio[0] == 0)          # old0's audio suppressed
    assert not dec.is_comfort_noise("new0")
    audio = dec.flush_async()
    assert audio is not None              # tick 1 drains normally


def test_tick_wire_matches_tick_packed(model_path):
    """The device-side wire codec path must be bit-identical to the host
    native-codec path: same packets out of the encoder, same audio out of
    the decoder, for a uniform-bitrate fleet."""
    cap = 3
    enc_w = EncoderServer(cap, model_path=model_path, bitrate=6000)
    enc_p = EncoderServer(cap, model_path=model_path, bitrate=6000)
    dec_w = DecoderServer(cap, model_path=model_path)
    dec_p = DecoderServer(cap, model_path=model_path)
    # Slot 2 stays inactive: its rows must be zero on BOTH paths (a stale
    # tick_wire row would leak the slot's encoder state as payload bytes).
    for s in (enc_w, enc_p, dec_w, dec_p):
        for sid in range(cap - 1):
            s.add_stream(sid)

    rng = np.random.default_rng(9)
    for t in range(4):
        audio = rng.integers(-8000, 8000, (cap, INTERNAL_HOP)).astype(np.int16)
        received = rng.uniform(size=cap) >= 0.3

        wire_w, sizes_w = enc_w.tick_wire(audio)
        wire_p, sizes_p = enc_p.tick_packed(audio)
        np.testing.assert_array_equal(sizes_w, sizes_p)
        np.testing.assert_array_equal(wire_w, wire_p[:, : wire_w.shape[1]])
        assert sizes_w[cap - 1] == 0 and not wire_w[cap - 1].any()

        out_w = dec_w.tick_wire(wire_w, received)
        out_p = dec_p.tick_packed(wire_p, received, sizes_p)
        np.testing.assert_array_equal(out_w, out_p, err_msg=f"tick {t}")


@pytest.mark.full
def test_tick_wire_mixed_bitrates_matches_tick_packed(model_path):
    """A mixed-bitrate fleet on the device wire path must be bit-identical
    to the host native-codec path: rows pack at their own rate into the
    fleet's widest packet, tails zero, and the decoder consumes the sizes
    vector on device (reference: lyra/lyra_encoder.h:44-101 per-stream
    set_bitrate at serving scale)."""
    cap = 4
    enc_w = EncoderServer(cap, model_path=model_path, bitrate=3200)
    enc_p = EncoderServer(cap, model_path=model_path, bitrate=3200)
    dec_w = DecoderServer(cap, model_path=model_path)
    dec_p = DecoderServer(cap, model_path=model_path)
    for s in (enc_w, enc_p):
        s.add_stream("a", bitrate=3200)
        s.add_stream("b", bitrate=9200)
        s.add_stream("c", bitrate=6000)
        # slot 3 inactive: zero row on both paths
    for s in (dec_w, dec_p):
        for sid in "abc":
            s.add_stream(sid)

    rng = np.random.default_rng(11)
    for t in range(4):
        audio = rng.integers(-8000, 8000, (cap, INTERNAL_HOP)).astype(np.int16)
        received = rng.uniform(size=cap) >= 0.3

        wire_w, sizes_w = enc_w.tick_wire(audio)
        wire_p, sizes_p = enc_p.tick_packed(audio)
        np.testing.assert_array_equal(sizes_w, sizes_p)
        np.testing.assert_array_equal(wire_w, wire_p)
        assert sizes_w[3] == 0 and not wire_w[3].any()
        assert set(sizes_w[:3]) <= {0, 8, 15, 23}  # own-rate sizes (0=DTX)

        out_w = dec_w.tick_wire(wire_w, received, sizes_w)
        out_p = dec_p.tick_packed(wire_p, received, sizes_p)
        np.testing.assert_array_equal(out_w, out_p, err_msg=f"tick {t}")

    # Mid-call set_bitrate (the reference's dynamic bitrate switch) keeps
    # the two paths identical, including the wire width change.
    for s in (enc_w, enc_p):
        s.set_bitrate("b", 3200)
    audio = rng.integers(-8000, 8000, (cap, INTERNAL_HOP)).astype(np.int16)
    wire_w, sizes_w = enc_w.tick_wire(audio)
    wire_p, sizes_p = enc_p.tick_packed(audio)
    np.testing.assert_array_equal(sizes_w, sizes_p)
    np.testing.assert_array_equal(wire_w, wire_p)
    out_w = dec_w.tick_wire(wire_w, np.ones(cap, bool), sizes_w)
    out_p = dec_p.tick_packed(wire_p, np.ones(cap, bool), sizes_p)
    np.testing.assert_array_equal(out_w, out_p)


def test_tick_wire_mixed_bad_sizes_are_counted_drops(model_path):
    """Unknown packet sizes and over-cap bitrates on the mixed wire path
    are counted drops (bad_packets), never exceptions out of the tick."""
    from lyra_tpu.codec.engine import DecoderEngine

    dec = DecoderServer(3, engine=DecoderEngine(
        16000, model_path, max_bitrate=3200))
    for sid in range(3):
        dec.add_stream(sid)
    pkts = np.zeros((3, 23), np.uint8)
    # row 0: valid 3.2 kbps size; row 1: unknown size; row 2: 9.2 kbps
    # packet into a max_bitrate=3200 engine (over the static stage cap).
    sizes = np.array([8, 9, 23], np.int32)
    out = dec.tick_wire(pkts, np.ones(3, bool), sizes)
    assert out.shape == (3, INTERNAL_HOP)
    assert dec.bad_packets.tolist() == [0, 1, 1]
    # Uniform path still refuses an unsupported width loudly (host-side
    # misconfiguration, not a per-stream wire event).
    with pytest.raises(ValueError, match="unsupported"):
        dec.tick_wire(np.zeros((3, 9), np.uint8), np.ones(3, bool))


@pytest.mark.full
def test_tick_wire_async_matches_sync(model_path):
    """tick_wire_async == tick_wire shifted by one tick, including the
    slot-reuse suppression and DTX/inactive zeroing semantics."""
    cap = 3
    enc_a = EncoderServer(cap, model_path=model_path, bitrate=3200)
    enc_s = EncoderServer(cap, model_path=model_path, bitrate=3200)
    dec_a = DecoderServer(cap, model_path=model_path)
    dec_s = DecoderServer(cap, model_path=model_path)
    for s in (enc_a, enc_s, dec_a, dec_s):
        for sid in range(cap - 1):  # slot 2 inactive
            s.add_stream(sid)

    rng = np.random.default_rng(4)
    ticks = 4
    audio = rng.integers(-8000, 8000, (ticks, cap, INTERNAL_HOP)).astype(np.int16)
    loss = rng.uniform(size=(ticks, cap)) < 0.3

    sync_out, async_out = [], []
    for t in range(ticks):
        wire_s, sizes_s = enc_s.tick_wire(audio[t])
        rec = ~loss[t] & (sizes_s > 0)
        sync_out.append(dec_s.tick_wire(wire_s, rec))

        got = enc_a.tick_wire_async(audio[t])
        if t == 0:
            assert got is None
        else:
            wire_a, sizes_a = got
            out_a = dec_a.tick_wire_async(wire_a, ~loss[t - 1] & (sizes_a > 0))
            if t == 1:
                assert out_a is None
            else:
                async_out.append(out_a)
    wire_a, sizes_a = enc_a.flush_wire_async()
    async_out.append(dec_a.tick_wire_async(
        wire_a, ~loss[ticks - 1] & (sizes_a > 0)))
    async_out.append(dec_a.flush_wire_async())

    assert len(async_out) == len(sync_out)
    for t, (a, s) in enumerate(zip(async_out, sync_out)):
        # (Inactive decoder slots emit PLC/CNG audio on both paths — callers
        # ignore rows outside their slot table, exactly as with tick_packed.)
        np.testing.assert_array_equal(a, s, err_msg=f"tick {t}")


@pytest.mark.full
def test_bulk_admission_matches_sequential(model_path):
    """add_streams == the same add_stream sequence: same slot map, same
    subsequent packets/audio; and it is all-or-nothing on duplicates."""
    enc_b = EncoderServer(4, model_path=model_path, bitrate=3200)
    enc_s = EncoderServer(4, model_path=model_path, bitrate=3200)
    dec_b = DecoderServer(4, model_path=model_path)
    dec_s = DecoderServer(4, model_path=model_path)
    slots = enc_b.add_streams(["a", "b", "c"])
    dec_b.add_streams(["a", "b", "c"])
    assert slots == {"a": 0, "b": 1, "c": 2}
    for sid in ("a", "b", "c"):
        enc_s.add_stream(sid)
        dec_s.add_stream(sid)

    rng = np.random.default_rng(6)
    hop = rng.integers(-8000, 8000, (320,)).astype(np.int16)
    pkts_b = enc_b.tick({sid: hop for sid in "abc"})
    pkts_s = enc_s.tick({sid: hop for sid in "abc"})
    assert pkts_b == pkts_s
    out_b = dec_b.tick(pkts_b)
    out_s = dec_s.tick(pkts_s)
    for sid in "abc":
        np.testing.assert_array_equal(out_b[sid], out_s[sid])

    with pytest.raises(KeyError):
        enc_b.add_streams(["d", "a"])  # "a" already active
    assert "d" not in enc_b._by_id    # all-or-nothing
    with pytest.raises(RuntimeError):
        enc_b.add_streams(["d", "e"])  # only one slot left
    assert enc_b.add_streams(["d"]) == {"d": 3}


@pytest.mark.full
def test_async_pipelines_are_mutually_exclusive(model_path):
    """Interleaving the packed and wire async pipelines would advance the
    engine state out of order; submits must refuse while the other pipeline
    is in flight, and the generic flush_async drains whichever is live."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200)
    enc.add_stream("a")
    hop = np.zeros((2, INTERNAL_HOP), np.int16)
    assert enc.tick_wire_async(hop) is None
    with pytest.raises(RuntimeError, match="in flight"):
        enc.tick_packed_async(hop)
    out = enc.flush_async()  # generic flush covers the wire pipeline
    assert out is not None and out[1][0] > 0
    assert enc.tick_packed_async(hop) is None  # now the other way round
    with pytest.raises(RuntimeError, match="in flight"):
        enc.tick_wire_async(hop)
    assert enc.flush_async() is not None

    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("a")
    pkts = np.zeros((2, config.packet_size(64)), np.uint8)
    rec = np.ones(2, bool)
    assert dec.tick_wire_async(pkts, rec) is None
    with pytest.raises(RuntimeError, match="in flight"):
        dec.tick_packed_async(pkts, rec, np.full(2, 8, np.int32))
    assert dec.flush_async() is not None
    assert dec.add_streams([]) == {}  # empty bulk admission is a no-op


def _pool_pair(model_path, cap=4, waves=2):
    from lyra_tpu.tools.stream_server import ServerPool

    wc = cap // waves
    enc_pool = ServerPool([EncoderServer(wc, model_path=model_path,
                                         bitrate=3200)
                           for _ in range(waves)])
    dec_pool = ServerPool([DecoderServer(wc, model_path=model_path)
                           for _ in range(waves)])
    return enc_pool, dec_pool


@pytest.mark.full
def test_server_pool_matches_single_server(model_path):
    """A 2-wave pool must produce per-stream audio bit-identical to one
    server holding the same streams — the wave split is pure scheduling
    (PERF.md round 3), never a semantic change."""
    cap = 4
    enc_pool, dec_pool = _pool_pair(model_path, cap)
    enc_one = EncoderServer(cap, model_path=model_path, bitrate=3200)
    dec_one = DecoderServer(cap, model_path=model_path)

    ids = ["a", "b", "c"]
    rows_pool_e = enc_pool.add_streams(ids)
    rows_pool_d = dec_pool.add_streams(ids)
    rows_one_e = enc_one.add_streams(ids)
    rows_one_d = dec_one.add_streams(ids)
    assert enc_pool.num_active == 3 and enc_pool.capacity == cap
    assert rows_pool_e == rows_pool_d  # same balanced placement both ways

    rng = np.random.default_rng(3)
    for t in range(3):
        speech = {sid: rng.integers(-8000, 8000, INTERNAL_HOP) for sid in ids}
        audio_pool = np.zeros((cap, INTERNAL_HOP), np.float32)
        audio_one = np.zeros((cap, INTERNAL_HOP), np.float32)
        for sid in ids:
            audio_pool[rows_pool_e[sid]] = speech[sid]
            audio_one[rows_one_e[sid]] = speech[sid]

        wire_p, sizes_p = enc_pool.tick_wire(audio_pool)
        wire_o, sizes_o = enc_one.tick_wire(audio_one)
        for sid in ids:
            rp, ro = rows_pool_e[sid], rows_one_e[sid]
            assert sizes_p[rp] == sizes_o[ro]
            np.testing.assert_array_equal(wire_p[rp, :sizes_p[rp]],
                                          wire_o[ro, :sizes_o[ro]])

        out_p = dec_pool.tick_wire(wire_p, sizes_p > 0,
                                   sizes_p.astype(np.int32))
        out_o = dec_one.tick_wire(wire_o, sizes_o > 0,
                                  sizes_o.astype(np.int32))
        for sid in ids:
            np.testing.assert_array_equal(out_p[rows_pool_d[sid]],
                                          out_o[rows_one_d[sid]],
                                          err_msg=f"{sid} tick {t}")


@pytest.mark.full
def test_server_pool_async_matches_sync(model_path):
    cap = 4
    enc_s, dec_s = _pool_pair(model_path, cap)
    enc_a, dec_a = _pool_pair(model_path, cap)
    for pool in (enc_s, dec_s, enc_a, dec_a):
        pool.add_streams(["x", "y", "z"])

    rng = np.random.default_rng(7)
    ticks = 3
    audio = rng.integers(-8000, 8000,
                         (ticks, cap, INTERNAL_HOP)).astype(np.float32)
    sync_out, async_out = [], []
    for t in range(ticks):
        wire, sizes = enc_s.tick_wire(audio[t])
        sync_out.append(dec_s.tick_wire(wire, sizes > 0,
                                        sizes.astype(np.int32)))
        got = enc_a.tick_wire_async(audio[t])
        if t == 0:
            assert got is None
        else:
            wire_a, sizes_a = got
            out = dec_a.tick_wire_async(wire_a, sizes_a > 0,
                                        sizes_a.astype(np.int32))
            if t == 1:
                assert out is None
            else:
                async_out.append(out)
    wire_a, sizes_a = enc_a.flush_wire_async()
    async_out.append(dec_a.tick_wire_async(wire_a, sizes_a > 0,
                                           sizes_a.astype(np.int32)))
    async_out.append(dec_a.flush_wire_async())
    for t, (a, s) in enumerate(zip(async_out, sync_out)):
        np.testing.assert_array_equal(a, s, err_msg=f"tick {t}")


def test_server_pool_admission_and_errors(model_path):
    from lyra_tpu.tools.stream_server import ServerPool

    enc_pool, _ = _pool_pair(model_path, cap=4)
    r0 = enc_pool.add_stream("a")
    r1 = enc_pool.add_stream("b")
    assert r0 // 2 != r1 // 2  # balanced: different waves
    with pytest.raises(KeyError):
        enc_pool.add_stream("a")
    enc_pool.set_bitrate("a", 3200)
    with pytest.raises(KeyError):
        enc_pool.set_bitrate("nope", 3200)
    enc_pool.remove_stream("a")
    assert enc_pool.num_active == 1
    enc_pool.add_streams(["c", "d", "e"])
    with pytest.raises(RuntimeError):
        enc_pool.add_stream("f")
    with pytest.raises(ValueError, match="equal capacity"):
        ServerPool([EncoderServer(2, model_path=model_path),
                    EncoderServer(3, model_path=model_path)])


@pytest.mark.full
def test_server_pool_save_restore(model_path, tmp_path):
    enc_pool, dec_pool = _pool_pair(model_path, cap=4)
    rows = dec_pool.add_streams(["a", "b", "c"])
    enc_pool.add_streams(["a", "b", "c"])
    audio = np.zeros((4, INTERNAL_HOP), np.float32)
    wire, sizes = enc_pool.tick_wire(audio)
    out1 = dec_pool.tick_wire(wire, sizes > 0, sizes.astype(np.int32))
    dec_pool.save(str(tmp_path / "pool"))

    _, dec2 = _pool_pair(model_path, cap=4)
    dec2.restore(str(tmp_path / "pool"))
    wire, sizes = enc_pool.tick_wire(audio)
    out_a = dec_pool.tick_wire(wire, sizes > 0, sizes.astype(np.int32))
    out_b = dec2.tick_wire(wire, sizes > 0, sizes.astype(np.int32))
    np.testing.assert_array_equal(out_a, out_b)
    assert rows  # placement map survives via each wave's snapshot


def test_removed_stream_bitrate_does_not_inflate_wire_width(model_path):
    """A removed 9.2 kbps stream's stale _bits entry must not keep an
    all-3.2 kbps fleet emitting 23-byte wire rows (3x traffic, and zero
    tails that a no-sizes uniform decode would read as stage-0 indices)."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200)
    enc.add_stream("wide", bitrate=9200)
    enc.add_stream("narrow")
    audio = np.zeros((2, INTERNAL_HOP), np.float32)
    wire, sizes = enc.tick_wire(audio)
    assert wire.shape[1] == 23  # genuinely mixed: widest active rules
    enc.remove_stream("wide")
    wire, sizes = enc.tick_wire(audio)
    assert wire.shape[1] == 8  # fleet is all-3.2 kbps again
    pkts, sizes_p = enc.tick_packed(audio)
    assert pkts.shape[1] == 8  # tick_packed width follows active rows too


def test_mixed_sizes_exceeding_packet_width_fail_loudly(model_path):
    """sizes[i] > packets width is the host's own buffer-assembly bug:
    decoding only the stages that fit would be silently degraded audio, so
    the tick must refuse (fail-loudly convention), not count a drop."""
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("a")
    dec.add_stream("b")
    pkts = np.zeros((2, 8), np.uint8)
    with pytest.raises(ValueError, match="exceed"):
        dec.tick_wire(pkts, np.ones(2, bool), np.array([8, 23]))
    assert dec.bad_packets.sum() == 0  # refused before any counting


def test_server_pool_restore_rejects_wave_mismatch(model_path, tmp_path):
    """A pool restore must be all-or-nothing across waves: wave-count and
    per-wave capacity mismatches are detected BEFORE any wave mutates."""
    from lyra_tpu.tools.stream_server import ServerPool

    _, dec3 = _pool_pair(model_path, cap=6, waves=3)
    dec3.add_streams(["a", "b", "c"])
    dec3.save(str(tmp_path / "p3"))

    _, dec2 = _pool_pair(model_path, cap=4, waves=2)
    with pytest.raises(ValueError, match="more waves"):
        dec2.restore(str(tmp_path / "p3"))  # 3-wave snapshot, 2-wave pool
    assert dec2.num_active == 0  # untouched

    _, dec2b = _pool_pair(model_path, cap=4, waves=2)
    dec2b.add_streams(["x"])
    dec2b.save(str(tmp_path / "p2"))
    with pytest.raises(ValueError, match="missing wave"):
        dec3.restore(str(tmp_path / "p2"))  # 2-wave snapshot, 3-wave pool
    assert set(dec3._locate("a")[1]._by_id)  # original streams intact

    # Same wave count, different wave capacity: caught by the header peek
    # before wave 0 restores.
    _, dec2c = _pool_pair(model_path, cap=6, waves=2)  # wave capacity 3
    with pytest.raises(ValueError, match="capacity"):
        dec2c.restore(str(tmp_path / "p2"))  # wave capacity 2 snapshot


def test_decoder_tick_straggler_packet_is_counted_drop(model_path):
    """A packet addressed to a removed stream is a transport event
    (CLAUDE.md: inactive streams are counted drops), not an exception
    aborting every live call's tick."""
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("live")
    audio = dec.tick({"live": bytes(8), "ghost": bytes(8)})
    assert set(audio) == {"live"}
    assert dec.inactive_drops == 1
    assert dec.bad_packets.sum() == 0


def test_encoder_tick_requires_audio_for_every_active_stream(model_path):
    """Omitting an active stream from the audio dict would silently encode
    a packet of silence and advance its conv state — refuse loudly."""
    enc = EncoderServer(2, model_path=model_path)
    enc.add_stream("a")
    enc.add_stream("b")
    with pytest.raises(ValueError, match="no audio"):
        enc.tick({"a": [0] * 320})


def test_tick_packed_oversized_size_fails_loudly_before_counting(model_path):
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("a")
    dec.add_stream("b")
    pkts = np.zeros((2, 8), np.uint8)
    # row 0: unknown size 9 (would normally count a drop); row 1: size 23
    # exceeding the 8-byte array — the loud check must fire BEFORE the
    # unknown-size group moves any counter.
    with pytest.raises(ValueError, match="exceed"):
        dec.tick_packed(pkts, np.ones(2, bool), np.array([9, 23]))
    assert dec.bad_packets.sum() == 0


def test_reused_slot_does_not_inherit_comfort_flag(model_path):
    dec = DecoderServer(1, model_path=model_path)
    dec.add_stream("old")
    for _ in range(10):  # drive into comfort noise
        dec.tick({"old": None})
    assert dec.is_comfort_noise("old")
    dec.remove_stream("old")
    dec.add_stream("new")
    assert not dec.is_comfort_noise("new")


def test_wire_program_cache_survives_bitrate_churn(model_path):
    """Toggling the fleet's widest bitrate must reuse previously compiled
    programs (keyed cache), not recompile on every flip."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200)
    enc.add_stream("a")
    audio = np.zeros((2, INTERNAL_HOP), np.float32)
    enc.tick_wire(audio)
    prog_narrow = enc._wire_step
    enc.add_stream("b", bitrate=9200)
    enc.tick_wire(audio)
    prog_wide = enc._wire_step
    enc.remove_stream("b")
    enc.tick_wire(audio)
    assert enc._wire_step is prog_narrow
    enc.add_stream("b2", bitrate=9200)
    enc.tick_wire(audio)
    assert enc._wire_step is prog_wide


def test_pool_async_desync_fails_loudly(model_path):
    """A wave with nothing in flight while others drain is a pipeline
    desync — the pool must not silently drop the drained waves' audio."""
    enc_pool, _ = _pool_pair(model_path, cap=4)
    enc_pool.add_streams(["a", "b"])
    audio = np.zeros((4, INTERNAL_HOP), np.float32)
    assert enc_pool.tick_wire_async(audio) is None  # both priming: fine
    enc_pool.servers[1].flush_wire_async()          # knock wave 1 out
    with pytest.raises(RuntimeError, match="desynchronized"):
        enc_pool.tick_wire_async(audio)


def test_pool_restore_rolls_back_on_mid_loop_failure(model_path, tmp_path):
    """A wave failure the header peek can't see (wrong snapshot kind) must
    leave every wave exactly as it was — not half restored."""
    enc_pool, dec_pool = _pool_pair(model_path, cap=4)
    dec_pool.add_streams(["a", "b", "c"])
    dec_pool.save(str(tmp_path / "p"))
    # Corrupt wave 1: overwrite with an ENCODER snapshot of equal capacity.
    enc_pool.add_streams(["x", "y"])
    enc_pool.servers[0].save(str(tmp_path / "p.w1"))

    _, victim = _pool_pair(model_path, cap=4)
    victim.add_streams(["keep0", "keep1"])
    before_ids = [dict(s._by_id) for s in victim.servers]
    with pytest.raises(ValueError, match="not a decoder"):
        victim.restore(str(tmp_path / "p"))
    assert [dict(s._by_id) for s in victim.servers] == before_ids
    # And the pool still ticks on its original streams.
    out = victim.tick_wire(np.zeros((4, 23), np.uint8), np.ones(4, bool),
                           np.zeros(4, np.int32))
    assert out.shape == (4, INTERNAL_HOP)


def test_pack_short_indices_fail_loudly():
    from lyra_tpu import packet as pk

    with pytest.raises(ValueError, match="stages"):
        pk.pack_indices_batch_np(np.zeros((2, 10), np.int32), 64)
    with pytest.raises(ValueError, match="stage"):
        pk.pack_indices(np.zeros(10, np.int32), 64)


@pytest.mark.full
def test_server_pool_tick_packed_matches_single(model_path):
    """The pool's host-codec path (tick_packed) is the same pure
    scheduling transform as tick_wire: per-stream results equal one
    server's."""
    cap = 4
    enc_pool, dec_pool = _pool_pair(model_path, cap)
    enc_one = EncoderServer(cap, model_path=model_path, bitrate=3200)
    dec_one = DecoderServer(cap, model_path=model_path)
    ids = ["a", "b", "c"]
    rp = enc_pool.add_streams(ids)
    dec_pool.add_streams(ids)
    ro = enc_one.add_streams(ids)
    dec_one.add_streams(ids)

    rng = np.random.default_rng(5)
    audio_p = np.zeros((cap, INTERNAL_HOP), np.float32)
    audio_o = np.zeros((cap, INTERNAL_HOP), np.float32)
    for sid in ids:
        hop = rng.integers(-8000, 8000, INTERNAL_HOP)
        audio_p[rp[sid]] = hop
        audio_o[ro[sid]] = hop
    pk_p, sz_p = enc_pool.tick_packed(audio_p)
    pk_o, sz_o = enc_one.tick_packed(audio_o)
    out_p = dec_pool.tick_packed(pk_p, sz_p > 0, sz_p)
    out_o = dec_one.tick_packed(pk_o, sz_o > 0, sz_o)
    for sid in ids:
        assert sz_p[rp[sid]] == sz_o[ro[sid]]
        np.testing.assert_array_equal(pk_p[rp[sid]], pk_o[ro[sid]])
        np.testing.assert_array_equal(out_p[rp[sid]], out_o[ro[sid]])

    # Async variant primes then drains through the same merge guard; the
    # drained tick ran on post-sync-tick state, so compare against the
    # single server's second tick, not the first.
    pk_o2, sz_o2 = enc_one.tick_packed(audio_o)
    assert enc_pool.tick_packed_async(audio_p) is None
    pk_a, sz_a = enc_pool.flush_async()
    for sid in ids:
        assert sz_a[rp[sid]] == sz_o2[ro[sid]]
        np.testing.assert_array_equal(pk_a[rp[sid]], pk_o2[ro[sid]])


def test_int16_pcm_boundary_is_bit_exact(model_path):
    """int16 PCM across the host<->device boundary (half the PCIe bytes per
    tick) is bit-identical to the float32 path in both directions, and a
    DecoderEngine(emit_dtype="int16") drops into the server unchanged."""
    from lyra_tpu.codec.engine import DecoderEngine

    rng = np.random.RandomState(7)
    hops = rng.randint(-20000, 20000, (4, 3, INTERNAL_HOP)).astype(np.int16)

    enc_f = EncoderServer(3, model_path=model_path, bitrate=3200)
    enc_i = EncoderServer(3, model_path=model_path, bitrate=3200)
    dec_f = DecoderServer(3, model_path=model_path)
    dec_i = DecoderServer(
        3, engine=DecoderEngine(model_path=model_path, emit_dtype="int16"))
    for s in (enc_f, enc_i, dec_f, dec_i):
        s.add_streams(["a", "b", "c"])
    for t in range(4):
        pk_f, sz_f = enc_f.tick_packed(hops[t].astype(np.float32))
        pk_i, sz_i = enc_i.tick_packed(hops[t])  # int16 upload path
        np.testing.assert_array_equal(pk_f, pk_i)
        np.testing.assert_array_equal(sz_f, sz_i)
        audio_f = dec_f.tick_packed(pk_f, sz_f > 0, sz_f)
        audio_i = dec_i.tick_packed(pk_i, sz_i > 0, sz_i)
        assert audio_f.dtype == audio_i.dtype == np.int16
        np.testing.assert_array_equal(audio_f, audio_i)

    with pytest.raises(ValueError):
        DecoderEngine(model_path=model_path, emit_dtype="int8")


def test_external_rate_fleet(model_path, tmp_path):
    """A whole fleet at a non-16 kHz external rate: the server's engine
    resamples inside its jitted step (reference: lyra/lyra_config.h:56-57
    external rates), so 48 kHz clients tick 960-sample hops directly."""
    enc = EncoderServer(2, model_path=model_path, bitrate=3200,
                        sample_rate_hz=48000)
    dec = DecoderServer(2, model_path=model_path, sample_rate_hz=48000)
    assert enc.hop_samples == dec.hop_samples == 960
    enc.add_streams(["a", "b"])
    dec.add_streams(["a", "b"])

    t = np.arange(8 * 960) / 48000.0
    sine = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    energy = 0.0
    for k in range(8):
        wire, sizes = enc.tick_packed(
            np.stack([sine[k * 960:(k + 1) * 960]] * 2))
        audio = dec.tick_packed(wire, sizes > 0, sizes)
        assert audio.shape == (2, 960) and audio.dtype == np.int16
        energy += float(np.abs(audio[:, :]).mean())
    assert energy > 100.0  # decoded signal, not silence

    # Rate-vs-engine contradiction and cross-rate restore both fail loudly.
    from lyra_tpu.codec.engine import EncoderEngine

    with pytest.raises(ValueError, match="contradicts"):
        EncoderServer(2, engine=EncoderEngine(model_path=model_path),
                      sample_rate_hz=48000)
    enc.save(str(tmp_path / "enc48"))
    enc16 = EncoderServer(2, model_path=model_path)
    with pytest.raises(ValueError, match="48000 Hz fleet"):
        enc16.restore(str(tmp_path / "enc48"))


@pytest.mark.full
def test_mixed_rate_pool_matches_standalone(model_path):
    """A pool of a 16 kHz wave and a 48 kHz wave serves both client
    populations bit-identically to standalone per-rate servers, with
    rate-routed admission and left-aligned PCM rows."""
    from lyra_tpu.tools.stream_server import ServerPool

    wc = 2
    enc_pool = ServerPool([
        EncoderServer(wc, model_path=model_path, bitrate=3200),
        EncoderServer(wc, model_path=model_path, bitrate=3200,
                      sample_rate_hz=48000)])
    dec_pool = ServerPool([
        DecoderServer(wc, model_path=model_path),
        DecoderServer(wc, model_path=model_path, sample_rate_hz=48000)])
    assert enc_pool.hop_samples == 960 and enc_pool.rates == (16000, 48000)

    # Mixed-rate admission requires an explicit rate; unknown rates and
    # full rate groups are loud.
    with pytest.raises(ValueError, match="explicit sample_rate_hz"):
        enc_pool.add_stream("x")
    with pytest.raises(ValueError, match="no 32000 Hz wave"):
        enc_pool.add_stream("x", sample_rate_hz=32000)

    for pool in (enc_pool, dec_pool):
        rows = pool.add_streams(["a", "b"], sample_rate_hz=16000)
        rows.update({"c": pool.add_stream("c", sample_rate_hz=48000)})
        assert rows == {"a": 0, "b": 1, "c": 2}
    assert enc_pool.sample_rate_of("c") == 48000
    assert enc_pool.hop_samples_of("a") == 320
    with pytest.raises(RuntimeError, match="at capacity for 16000"):
        enc_pool.add_stream("y", sample_rate_hz=16000)

    # Standalone twins, admitted identically.
    enc16 = EncoderServer(wc, model_path=model_path, bitrate=3200)
    enc48 = EncoderServer(wc, model_path=model_path, bitrate=3200,
                          sample_rate_hz=48000)
    dec16 = DecoderServer(wc, model_path=model_path)
    dec48 = DecoderServer(wc, model_path=model_path, sample_rate_hz=48000)
    enc16.add_streams(["a", "b"])
    dec16.add_streams(["a", "b"])
    enc48.add_stream("c")
    dec48.add_stream("c")

    rng = np.random.RandomState(7)
    for t in range(3):
        pcm = np.zeros((2 * wc, 960), np.int16)
        pcm[:wc, :320] = rng.randint(-8000, 8000, (wc, 320))
        pcm[wc, :] = rng.randint(-8000, 8000, 960)
        wire, sizes = enc_pool.tick_packed(pcm)
        w16, s16 = enc16.tick_packed(pcm[:wc, :320])
        w48, s48 = enc48.tick_packed(pcm[wc:, :])
        np.testing.assert_array_equal(wire, np.concatenate([w16, w48]))
        np.testing.assert_array_equal(sizes, np.concatenate([s16, s48]))

        audio = dec_pool.tick_packed(wire, sizes > 0, sizes)
        a16 = dec16.tick_packed(w16, s16 > 0, s16)
        a48 = dec48.tick_packed(w48, s48 > 0, s48)
        assert audio.shape == (2 * wc, 960)
        np.testing.assert_array_equal(audio[:wc, :320], a16)
        np.testing.assert_array_equal(audio[:wc, 320:], 0)  # row padding
        np.testing.assert_array_equal(audio[wc:], a48)

        # PCM width is a loud contract in a mixed pool.
        with pytest.raises(ValueError, match="pool PCM"):
            enc_pool.tick_packed(pcm[:, :320])

    # The device-wire path rides the same per-wave column contract.
    pcm = np.zeros((2 * wc, 960), np.int16)
    pcm[:wc, :320] = rng.randint(-8000, 8000, (wc, 320))
    pcm[wc, :] = rng.randint(-8000, 8000, 960)
    wire, sizes = enc_pool.tick_wire(pcm)
    w16, s16 = enc16.tick_wire(pcm[:wc, :320])
    w48, s48 = enc48.tick_wire(pcm[wc:, :])
    np.testing.assert_array_equal(wire, np.concatenate([w16, w48]))
    audio = dec_pool.tick_wire(wire, sizes > 0, sizes)
    np.testing.assert_array_equal(
        audio[:wc, :320], dec16.tick_wire(w16, s16 > 0, s16))
    np.testing.assert_array_equal(
        audio[wc:], dec48.tick_wire(w48, s48 > 0, s48))


def test_mixed_rate_pool_admission_randomized_mirror(model_path):
    """200 random admission/removal ops against a mirror model: routing
    respects rates, capacity errors are exact, bulk admission stays
    all-or-nothing, and no two live streams ever share a global row."""
    from lyra_tpu.tools.stream_server import ServerPool

    pool = ServerPool([
        EncoderServer(3, model_path=model_path),
        EncoderServer(3, model_path=model_path, sample_rate_hz=48000),
        EncoderServer(3, model_path=model_path)])
    free = {16000: 6, 48000: 3}
    mirror = {}  # sid -> rate
    rows = {}    # sid -> global row
    rng = np.random.RandomState(11)
    next_id = 0

    for _ in range(200):
        op = rng.randint(3)
        if op == 0:  # single admission
            rate = int(rng.choice([16000, 48000]))
            sid = f"s{next_id}"
            next_id += 1
            if free[rate] == 0:
                with pytest.raises(RuntimeError, match="at capacity"):
                    pool.add_stream(sid, sample_rate_hz=rate)
            else:
                rows[sid] = pool.add_stream(sid, sample_rate_hz=rate)
                mirror[sid] = rate
                free[rate] -= 1
        elif op == 1:  # bulk admission (all-or-nothing)
            rate = int(rng.choice([16000, 48000]))
            k = int(rng.randint(1, 5))
            ids = [f"s{next_id + i}" for i in range(k)]
            next_id += k
            if k > free[rate]:
                with pytest.raises(RuntimeError, match="at capacity"):
                    pool.add_streams(ids, sample_rate_hz=rate)
                for sid in ids:  # all-or-nothing: none of them joined
                    with pytest.raises(KeyError):
                        pool.sample_rate_of(sid)
            else:
                got = pool.add_streams(ids, sample_rate_hz=rate)
                rows.update(got)
                for sid in ids:
                    mirror[sid] = rate
                free[rate] -= k
        else:  # removal
            if mirror and rng.rand() < 0.8:
                sid = sorted(mirror)[rng.randint(len(mirror))]
                pool.remove_stream(sid)
                free[mirror.pop(sid)] += 1
                rows.pop(sid)
            else:
                with pytest.raises(KeyError):
                    pool.remove_stream("never-admitted")

        # Invariants after every op.
        assert pool.num_active == len(mirror)
        live_rows = [rows[sid] for sid in mirror]
        assert len(set(live_rows)) == len(live_rows)  # rows never collide
        for sid, rate in mirror.items():
            assert pool.sample_rate_of(sid) == rate

    # No-rate admission on a mixed pool stays loud at every fill level.
    with pytest.raises(ValueError, match="explicit sample_rate_hz"):
        pool.add_stream("anon")


def test_directed_slot_admission(model_path):
    """Caller-directed placement (`slot=`/`slots=`): placement policies
    (e.g. shard-affine room packing, conference.py) pick the row; refusals
    are loud and all-or-nothing."""
    dec = DecoderServer(4, model_path=model_path)
    assert dec.add_stream("a", slot=2) == 2
    assert dec.add_streams(["b", "c"], slots={"b": 0, "c": 3}) == \
        {"b": 0, "c": 3}
    # Occupied / out-of-range / duplicate slots are refused pre-mutation.
    with pytest.raises(ValueError, match="occupied"):
        dec.add_stream("d", slot=2)
    with pytest.raises(ValueError, match="out of range"):
        dec.add_stream("d", slot=4)
    with pytest.raises(ValueError, match="duplicate slots"):
        DecoderServer(4, model_path=model_path).add_streams(
            ["x", "y"], slots={"x": 1, "y": 1})
    with pytest.raises(ValueError, match="occupied"):
        dec.add_streams(["d", "e"], slots={"d": 1, "e": 3})
    assert "d" not in dec._by_id and "e" not in dec._by_id  # all-or-nothing
    # A directed map must cover every admitted id.
    with pytest.raises(KeyError):
        dec.add_streams(["d"], slots={})
    assert dec.add_stream("d", slot=1) == 1

    # Encoder mirror, and the directed fleet actually serves.
    enc = EncoderServer(4, model_path=model_path, bitrate=3200)
    enc.add_stream("a", slot=2)
    enc.add_streams(["b", "c"], slots={"b": 0, "c": 3}, bitrate=6000)
    hop = np.zeros((320,), np.int16)
    pkts = enc.tick({"a": hop, "b": hop, "c": hop})
    assert len(pkts["a"]) == config.packet_size(64)
    assert len(pkts["b"]) == config.packet_size(120)
    out = dec.tick({sid: pkts[sid] for sid in "abc"})
    assert set(out) == {"a", "b", "c", "d"}


def test_encoder_server_dtx_rows_emit_size_zero(model_path):
    """DTX at the serving wire boundary (serve_main --enable_dtx): a hop
    the estimator classifies as noise crosses tick_wire with size 0, so
    the egress builds NO datagram for it — the transport expression of
    the reference's empty DTX packet (lyra/lyra_encoder.cc:131-141).
    The classifier decision itself is pinned by the estimator tests; here
    the bound is forced, as the reference's own DTX tests do."""
    from lyra_tpu.codec.engine import EncoderEngine

    enc = EncoderServer(
        3, engine=EncoderEngine(16000, enable_dtx=True, max_bitrate=3200),
        bitrate=3200)
    enc.add_streams(range(3))
    rng = np.random.RandomState(0)
    audio = (rng.uniform(-1, 1, (3, INTERNAL_HOP)) * 8000).astype(np.int16)

    wire, sizes = enc.tick_wire(audio)
    assert (sizes > 0).all()  # speech at first

    enc._state = enc.engine._state_with_bound(enc._state, 1e6)
    wire, sizes = enc.tick_wire(audio)
    assert (sizes == 0).all(), sizes  # every row is a DTX noise hop
    assert not np.asarray(wire).any()  # and ships no bytes

    enc._state = enc.engine._state_with_bound(enc._state, 1e-6)
    _, sizes = enc.tick_wire(audio)
    assert (sizes > 0).all()  # speech resumes
